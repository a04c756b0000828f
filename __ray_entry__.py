"""Driver contract for the Ray-Data-native link-graph engine.

``entry()`` runs the flagship corpus pipeline (sha256 invariant + edge
derivation + PageRank) on sf0.001-scale synthetic corpus.

``queries()`` exposes each implemented operator from SURVEY.md §2 over
the driver's parquet tables; graph apps run on the canonical
"partgraph" (parts co-occurring in an order — the same co-occurrence
rule as the corpus edge derivation, but SQL-replayable).

``oracle_sql()`` gives DuckDB equivalents: plain SQL for relational
shapes, recursive CTEs for WCC/BFS, and programmatically *unrolled*
iteration SQL for PageRank/CDLP. Iterative/stateful ops that SQL can't
express (tol-mode PageRank, SSSP/HITS/centralities/k-core, MinHash,
SimHash, fingerprints, language id, LSH ANN) are rows-only checked
here and verified against the independent numpy oracle in tests/.

Ray is initialised by the caller; nothing here calls ray.init().
Column names match between Ray results and SQL exactly (the driver
hash-compares values after sorting columns by name); float columns are
rounded to 6 dp on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

import ray.data

DELTA = 0.85
PR_ROUNDS = 10
CDLP_ROUNDS = 5
BFS_CAP = 64

# ----------------------------------------------------------------------
# shared SQL prelude: the partgraph CTEs (tables are pre-registered
# DuckDB views: lineitem, documents, embeddings, events, ...)
# ----------------------------------------------------------------------

_PRELUDE = """
occ AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*)::BIGINT AS w
       FROM occ a JOIN occ b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
e AS (SELECT src AS s, dst AS t, w FROM e0
      UNION ALL SELECT dst, src, w FROM e0),
v AS (SELECT DISTINCT s AS v FROM e),
deg AS (SELECT s AS v, count(*)::BIGINT AS d FROM e GROUP BY s),
n AS (SELECT count(*) AS c FROM v)
"""


def _pagerank_sql(rounds: int, delta: float) -> str:
    parts = [f"WITH {_PRELUDE},"]
    parts.append("r0 AS (SELECT v.v, 1.0 / (SELECT c FROM n) AS r FROM v)")
    for k in range(1, rounds + 1):
        parts.append(
            f"""r{k} AS (
  SELECT v.v,
         {1 - delta} / (SELECT c FROM n)
           + {delta} * COALESCE(m.s, 0) AS r
  FROM v LEFT JOIN (
    SELECT e.t AS v, sum(r{k-1}.r / deg.d) AS s
    FROM e JOIN r{k-1} ON r{k-1}.v = e.s JOIN deg ON deg.v = e.s
    GROUP BY e.t) m ON m.v = v.v)"""
        )
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(r, 6) AS rank FROM r{rounds} ORDER BY vid")


def _cdlp_sql(rounds: int) -> str:
    parts = [f"WITH {_PRELUDE},"]
    parts.append("l0 AS (SELECT v AS v, v AS lab FROM v)")
    for k in range(1, rounds + 1):
        parts.append(
            f"""l{k} AS (
  SELECT v, lab FROM (
    SELECT e.t AS v, l{k-1}.lab AS lab, count(*) AS c,
           row_number() OVER (PARTITION BY e.t
                              ORDER BY count(*) DESC, l{k-1}.lab ASC) AS rn
    FROM e JOIN l{k-1} ON l{k-1}.v = e.s
    GROUP BY e.t, l{k-1}.lab) WHERE rn = 1)"""
        )
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, lab AS label FROM l{rounds} ORDER BY vid")


_WCC_SQL = f"""
WITH RECURSIVE {_PRELUDE},
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
)
SELECT v AS vid, min(l) AS comp FROM r GROUP BY v ORDER BY vid
"""

_BFS_SQL = f"""
WITH RECURSIVE {_PRELUDE},
bf AS (
  SELECT (SELECT min(v) FROM v) AS v, 0 AS d
  UNION
  SELECT e.t, bf.d + 1 FROM bf JOIN e ON e.s = bf.v WHERE bf.d < {BFS_CAP}
)
SELECT v AS vid, min(d)::BIGINT AS depth FROM bf GROUP BY v ORDER BY vid
"""

_TRI_CTE = """
tri AS (
  SELECT a.src AS u, a.dst AS x, b.dst AS y
  FROM e0 a JOIN e0 b ON b.src = a.dst
            JOIN e0 c ON c.src = a.src AND c.dst = b.dst
)
"""

# ----------------------------------------------------------------------
# graph cache: partgraph built once per sf_dir, engine stays resident
# (the reference reuses loaded fragments across app runs the same way)
# ----------------------------------------------------------------------

_CACHE: dict[str, Any] = {}


def _partgraph(sf_dir: str):
    if sf_dir in _CACHE:
        return _CACHE[sf_dir]
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    edges = partgraph_edges(sf_dir).materialize()
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-partgraph-{abs(hash(sf_dir)) % 10**8}",
        weight_col="weight",
        symmetrize=True,
    )
    _CACHE[sf_dir] = (g, edges)
    return g, edges


def _round_col(ds, col, nd=6):
    def f(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(col)
        return t.set_column(i, col, pa.array(np.round(t[col].to_numpy(), nd)))

    return ds.map_batches(f, batch_format="pyarrow")


def _rename_ds(ds, mapping):
    from graphscope_ray.util import rename
    return rename(ds, mapping)


# ----------------------------------------------------------------------
# query implementations
# ----------------------------------------------------------------------


def _q_pg_edges(sf_dir):
    _, edges = _partgraph(sf_dir)
    return edges


def _q_pg_degree(sf_dir):
    from graphscope_ray.graph import api
    _, edges = _partgraph(sf_dir)
    return api.degrees(api.to_undirected(edges), mode="out")


def _q_pg_degree_centrality(sf_dir):
    from graphscope_ray.graph import api
    g, edges = _partgraph(sf_dir)
    und = api.to_undirected(edges)
    out = api.degree_centrality(und, g.store.num_vertices, mode="out")
    return _round_col(out, "centrality")


def _q_pg_pagerank(sf_dir):
    g, _ = _partgraph(sf_dir)
    pr = g.pagerank(delta=DELTA, max_round=PR_ROUNDS)
    return _round_col(g.to_oid(pr), "rank")


def _q_pg_wcc(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.wcc(), vid_cols=("vid", "comp"))


def _q_pg_cdlp(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.cdlp(max_round=CDLP_ROUNDS), vid_cols=("vid", "label"))


def _q_pg_bfs(sf_dir):
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]  # min oid (oid_array is sorted)
    ds = g.to_oid(g.bfs(src))

    def reachable(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["depth"], 0))

    return ds.map_batches(reachable, batch_format="pyarrow")


def _triangles_cached(sf_dir):
    key = sf_dir + "#tri"
    if key not in _CACHE:
        from graphscope_ray.graph import api
        _, edges = _partgraph(sf_dir)
        _CACHE[key] = api.triangles(
            edges.select_columns(["src", "dst"])).materialize()
    return _CACHE[key]


def _q_pg_triangles(sf_dir):
    return _triangles_cached(sf_dir)


def _q_pg_tc_total(sf_dir):
    import pandas as pd
    t = int(_triangles_cached(sf_dir).sum("tri_cnt")) // 3
    return pd.DataFrame({"total": np.array([t], dtype=np.int64)})


def _q_pg_clustering(sf_dir):
    from graphscope_ray.graph import api
    _, edges = _partgraph(sf_dir)
    tv = _triangles_cached(sf_dir)
    deg = api.degrees(edges.select_columns(["src", "dst"]), mode="both")
    from graphscope_ray.graph.joins import attach_values
    out = attach_values(tv, deg, on="vid", table_key="vid",
                        value_names=["degree"], defaults={"degree": 0})

    def lcc(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy().astype(np.float64)
        tr = t["tri_cnt"].to_numpy().astype(np.float64)
        denom = d * (d - 1.0)
        c = np.where(denom > 0, 2.0 * tr / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table({"vid": t["vid"], "clustering": pa.array(np.round(c, 6))})

    return out.map_batches(lcc, batch_format="pyarrow")


def _q_pg_transitivity(sf_dir):
    from graphscope_ray.graph import api
    import pandas as pd
    _, edges = _partgraph(sf_dir)
    tri3 = int(_triangles_cached(sf_dir).sum("tri_cnt"))
    deg = api.degrees(edges.select_columns(["src", "dst"]), mode="both")

    def wedge(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy().astype(np.float64)
        return pa.table({"w": pa.array(d * (d - 1.0) / 2.0)})

    wedges = deg.map_batches(wedge, batch_format="pyarrow").sum("w")
    t = float(tri3 / wedges) if wedges else 0.0
    return pd.DataFrame({"transitivity": [round(t, 6)]})


def _q_pg_avg_clustering(sf_dir):
    import pandas as pd
    cl = _q_pg_clustering(sf_dir).to_pandas()
    return pd.DataFrame({"avg_clustering": [round(float(cl["clustering"].mean()), 6)]})


def _q_pg_bfs_tree(sf_dir):
    """BFS tree predecessors (bfs_generic 'predecessors' format):
    deterministic min-predecessor tie-break makes this SQL-checkable."""
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]
    ds = g.engine.bfs_generic(g.vid_of_oid(src),
                              output_format="predecessors")
    return g.to_oid(ds, vid_cols=("node", "predecessor"))


def _q_pg_report(sf_dir):
    from graphscope_ray.graph import api
    import pandas as pd
    _, edges = _partgraph(sf_dir)
    rep = api.report_graph(edges.select_columns(["src", "dst"]))
    return pd.DataFrame({k: np.array([rep[k]], dtype=np.int64)
                         for k in ("node_num", "edge_num", "selfloops_num")})


def _q_pg_sssp(sf_dir):
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]
    ds = g.to_oid(g.sssp(src))

    def fin(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy()
        keep = np.isfinite(d)
        return pa.table({"vid": t["vid"].to_numpy()[keep],
                         "dist": np.round(d[keep], 6)})

    return ds.map_batches(fin, batch_format="pyarrow")


def _q_pg_kcore(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.kcore(3))


def _q_pg_kshell(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.kshell(3))


def _q_pg_eigenvector(sf_dir):
    g, _ = _partgraph(sf_dir)
    out = g.engine.eigenvector_centrality(tol=1e-6, max_round=100)
    return _round_col(g.to_oid(out), "centrality")


def _q_pg_katz(sf_dir):
    g, _ = _partgraph(sf_dir)
    out = g.engine.katz_centrality(alpha=0.01, beta=1.0, tol=1e-6)
    return _round_col(g.to_oid(out), "centrality")


def _q_pg_hits(sf_dir):
    from graphscope_ray.graph.api import Graph, to_undirected
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    key = sf_dir + "#hits"
    if key not in _CACHE:
        # undirected semantics: the digraph contains BOTH orientations of
        # every co-occurrence edge, and the dual store additionally tags
        # reversals so HITS's two phases each see the full neighborhood
        _, edges = _partgraph(sf_dir)  # materialized, shared
        _CACHE[key] = Graph.from_edges(
            to_undirected(edges.select_columns(["src", "dst"])),
            workdir=f"/tmp/gsr-hits-{abs(hash(sf_dir)) % 10**8}",
            directions="both",
        )
    g = _CACHE[key]
    out = g.engine.hits(tolerance=1e-10, max_round=60)
    ds = g.to_oid(out)
    ds = _round_col(ds, "auth")
    return _round_col(ds, "hub")


def _q_pg_louvain(sf_dir):
    import pandas as pd
    from graphscope_ray.graph.louvain import louvain
    _, edges = _partgraph(sf_dir)
    vids, labels, q = louvain(edges, weight_col="weight")
    return pd.DataFrame({"vid": vids, "community": labels})


def _q_doc_sha256(sf_dir):
    from graphscope_ray.ingest import with_sha256
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return with_sha256(docs, "text").select_columns(["doc_id", "content_sha256"])


def _q_doc_exact_dedup(sf_dir):
    from graphscope_ray.data import exact_dedup
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return exact_dedup(docs)


def _q_doc_token_count(sf_dir):
    from graphscope_ray.data import token_count
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return token_count(docs)


def _q_doc_quality(sf_dir):
    from graphscope_ray.data import quality_score
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return quality_score(docs)


def _q_doc_langid(sf_dir):
    from graphscope_ray.data import lang_id
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return lang_id(docs)


def _q_doc_fingerprint(sf_dir):
    from graphscope_ray.data import fingerprint
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return fingerprint(docs)


def _q_doc_minhash_dedup(sf_dir):
    from graphscope_ray.data import minhash_lsh_dedup
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs, threshold=0.9)


def _q_doc_simhash_pairs(sf_dir):
    from graphscope_ray.data.dedup import simhash_dedup
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return simhash_dedup(docs, max_hamming=0)


def _q_emb_ann_topk(sf_dir):
    from graphscope_ray.data import ann_topk
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = sorted(
        (r for r in emb.take_all() if r["vec_id"] < 3),
        key=lambda r: r["vec_id"],
    )
    queries = np.stack([np.asarray(r["embedding"]) for r in qrows])
    out = ann_topk(emb, queries, k=5)
    out["cosine"] = np.round(out["cosine"], 6)
    return out


def _q_emb_cosine_dups(sf_dir):
    from graphscope_ray.data.dedup import embedding_cosine_dedup
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_cosine_dedup(emb, threshold=0.9)


def _q_events_window(sf_dir):
    """Tumbling 1-hour window per user: count + sum(value) — the
    streaming-shaped operator expressed as bucket groupby."""
    from ray.data.aggregate import Count, Sum
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy()
        epoch_us = ts.astype("datetime64[us]").astype(np.int64)
        b = epoch_us // (3600 * 1_000_000)
        return pa.table({"user_id": t["user_id"],
                         "bucket": pa.array(b),
                         "value": t["value"]})

    out = (ev.map_batches(bucket, batch_format="pyarrow")
             .groupby(["user_id", "bucket"])
             .aggregate(Count(alias_name="n_events"),
                        Sum("value", alias_name="sum_value")))

    def rnd(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        return t.set_column(i, "sum_value",
                            pa.array(np.round(t["sum_value"].to_numpy(), 6)))

    return out.map_batches(rnd, batch_format="pyarrow")


# ----------------------------------------------------------------------
# contract
# ----------------------------------------------------------------------


def entry() -> Any:
    """Flagship corpus pipeline at sf0.001 scale (BASELINE.json north
    star): corpus → sha256 invariant → co-occurrence edges → PageRank
    to 1e-6 → (oid, rank)."""
    from graphscope_ray.pipelines.flagship import flagship_pagerank

    g, out = flagship_pagerank(n_files=1000, num_parts=4)
    df = out.to_pandas()
    g.close()
    return df


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pg_edges": _q_pg_edges,
        "pg_degree": _q_pg_degree,
        "pg_degree_centrality": _q_pg_degree_centrality,
        "pg_pagerank": _q_pg_pagerank,
        "pg_wcc": _q_pg_wcc,
        "pg_cdlp": _q_pg_cdlp,
        "pg_bfs": _q_pg_bfs,
        "pg_triangles": _q_pg_triangles,
        "pg_tc_total": _q_pg_tc_total,
        "pg_clustering": _q_pg_clustering,
        "pg_avg_clustering": _q_pg_avg_clustering,
        "pg_bfs_tree": _q_pg_bfs_tree,
        "pg_transitivity": _q_pg_transitivity,
        "pg_report": _q_pg_report,
        "pg_sssp": _q_pg_sssp,
        "pg_kcore": _q_pg_kcore,
        "pg_kshell": _q_pg_kshell,
        "pg_eigenvector": _q_pg_eigenvector,
        "pg_katz": _q_pg_katz,
        "pg_hits": _q_pg_hits,
        "pg_louvain": _q_pg_louvain,
        "doc_sha256": _q_doc_sha256,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_token_count": _q_doc_token_count,
        "doc_quality": _q_doc_quality,
        "doc_langid": _q_doc_langid,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_minhash_dedup": _q_doc_minhash_dedup,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "emb_ann_topk": _q_emb_ann_topk,
        "emb_cosine_dups": _q_emb_cosine_dups,
        "events_window": _q_events_window,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pg_edges": f"""
WITH {_PRELUDE}
SELECT src, dst, w AS weight FROM e0 ORDER BY src, dst""",
        "pg_degree": f"""
WITH {_PRELUDE}
SELECT v AS vid, d AS degree FROM deg ORDER BY vid""",
        "pg_degree_centrality": f"""
WITH {_PRELUDE}
SELECT v AS vid,
       round(d::DOUBLE / ((SELECT c FROM n) - 1), 6) AS centrality
FROM deg ORDER BY vid""",
        "pg_pagerank": _pagerank_sql(PR_ROUNDS, DELTA),
        "pg_wcc": _WCC_SQL,
        "pg_cdlp": _cdlp_sql(CDLP_ROUNDS),
        "pg_bfs": _BFS_SQL,
        "pg_triangles": f"""
WITH {_PRELUDE},
{_TRI_CTE}
SELECT v.v AS vid, COALESCE(t.c, 0)::BIGINT AS tri_cnt
FROM v LEFT JOIN (
  SELECT vv, count(*) AS c FROM (
    SELECT u AS vv FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri) GROUP BY vv) t ON t.vv = v.v
ORDER BY vid""",
        "pg_tc_total": f"""
WITH {_PRELUDE},
{_TRI_CTE}
SELECT count(*)::BIGINT AS total FROM tri""",
        "pg_clustering": f"""
WITH {_PRELUDE},
{_TRI_CTE},
tc AS (
  SELECT vv, count(*) AS c FROM (
    SELECT u AS vv FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri) GROUP BY vv)
SELECT deg.v AS vid,
       round(CASE WHEN deg.d > 1
             THEN 2.0 * COALESCE(tc.c, 0) / (deg.d * (deg.d - 1))
             ELSE 0 END, 6) AS clustering
FROM deg LEFT JOIN tc ON tc.vv = deg.v ORDER BY vid""",
        "pg_avg_clustering": f"""
WITH {_PRELUDE},
{_TRI_CTE},
tc AS (
  SELECT vv, count(*) AS c FROM (
    SELECT u AS vv FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri) GROUP BY vv)
SELECT round(avg(CASE WHEN deg.d > 1
           THEN 2.0 * COALESCE(tc.c, 0) / (deg.d * (deg.d - 1))
           ELSE 0 END), 6) AS avg_clustering
FROM deg LEFT JOIN tc ON tc.vv = deg.v""",
        "pg_bfs_tree": f"""
WITH RECURSIVE {_PRELUDE},
bf AS (
  SELECT (SELECT min(v) FROM v) AS v, 0 AS d
  UNION
  SELECT e.t, bf.d + 1 FROM bf JOIN e ON e.s = bf.v WHERE bf.d < {BFS_CAP}
),
depth AS (SELECT v, min(d) AS d FROM bf GROUP BY v)
SELECT b.v AS node, min(e.s) AS predecessor
FROM depth b JOIN e ON e.t = b.v
             JOIN depth a ON a.v = e.s AND a.d = b.d - 1
WHERE b.d > 0
GROUP BY b.v ORDER BY node""",
        "pg_transitivity": f"""
WITH {_PRELUDE},
{_TRI_CTE}
SELECT round(3.0 * (SELECT count(*) FROM tri)
             / (SELECT sum(d * (d - 1) / 2.0) FROM deg), 6) AS transitivity""",
        "pg_report": f"""
WITH {_PRELUDE}
SELECT (SELECT count(*) FROM v)::BIGINT AS node_num,
       (SELECT count(*) FROM e0)::BIGINT AS edge_num,
       0::BIGINT AS selfloops_num""",
        "doc_sha256": """
SELECT doc_id, sha256(text) AS content_sha256 FROM documents ORDER BY doc_id""",
        "doc_exact_dedup": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count
FROM documents GROUP BY text ORDER BY doc_id""",
        "doc_token_count": r"""
SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''))::BIGINT AS n_tokens
FROM documents ORDER BY doc_id""",
        "doc_quality": r"""
SELECT doc_id, round(
  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        / greatest(length(text), 1), 6)
  * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''))::DOUBLE / 100.0), 6) AS quality
FROM documents ORDER BY doc_id""",
        "emb_ann_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.emb, q.qv), 6) AS cosine
      FROM e CROSS JOIN q),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank""",
        "emb_cosine_dups": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9
ORDER BY a, b""",
        "events_window": """
SELECT user_id, floor(epoch(ts) / 3600)::BIGINT AS bucket,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    }
