"""Driver contract for the Ray-Data-native link-graph engine.

``entry()`` runs the flagship corpus pipeline (sha256 invariant + edge
derivation + PageRank) on sf0.001-scale synthetic corpus.

``queries()`` exposes each implemented operator from SURVEY.md §2 over
the driver's parquet tables; graph apps run on the canonical
"partgraph" (parts co-occurring in an order — the same co-occurrence
rule as the corpus edge derivation, but SQL-replayable).

``oracle_sql()`` gives DuckDB equivalents: plain SQL for relational
shapes, recursive CTEs for WCC/BFS/dup-clustering, and
programmatically *unrolled* iteration SQL for PageRank/CDLP/SSSP/
k-core/k-shell/eigenvector/Katz/HITS (query variants run the engine in
fixed-round mode; bench keeps tolerance mode). The text/dedup oracles
(lang-id, fingerprint, MinHash-LSH, SimHash) replay the exact
polynomial/fmix hash family of graphscope_ray.data.hashing in SQL
(graphscope_ray.oracle_sql). pg_louvain's full multi-level run is
unrolled too (_louvain_full_sql — integer weights make every sum
exact). The two binary-media rows (media_pipeline, media_frames)
compare against expectation parquets REGENERATED at oracle_sql() call
time by the independent struct-based oracle in graphscope_ray/
oracle.py — no committed artifacts, so all 138 rows hash-compare.

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
PR_PREGEL_ROUNDS = 5
CDLP_ROUNDS = 5
# BFS depth cap applied symmetrically: the SQL oracle's recursive CTE
# stops at this depth AND the Ray query passes max_iter=BFS_CAP, so both
# sides agree at any graph diameter (r01 ADVICE: one-sided cap risk).
BFS_CAP = 96

# ----------------------------------------------------------------------
# shared SQL prelude: the partgraph CTEs (tables are pre-registered
# DuckDB views: lineitem, documents, embeddings, events, ...)
# ----------------------------------------------------------------------

_PRELUDE = """
occ AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst,
       count(*)::BIGINT AS w
       FROM occ a JOIN occ b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
e AS MATERIALIZED (SELECT src AS s, dst AS t, w FROM e0
      UNION ALL SELECT dst, src, w FROM e0),
v AS MATERIALIZED (SELECT DISTINCT s AS v FROM e),
deg AS MATERIALIZED (SELECT s AS v, count(*)::BIGINT AS d FROM e GROUP BY s),
n AS MATERIALIZED (SELECT count(*) AS c FROM v)
"""


def _pagerank_sql(rounds: int, delta: float) -> str:
    parts = [f"WITH {_PRELUDE},"]
    parts.append("r0 AS MATERIALIZED (SELECT v.v, 1.0 / (SELECT c FROM n) AS r FROM v)")
    for k in range(1, rounds + 1):
        parts.append(
            f"""r{k} AS MATERIALIZED (
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


def _ppr_sql(rounds: int, delta: float, n_seeds: int = 3) -> str:
    """Unrolled personalized-PageRank twin: restart mass (1−δ)/n_seeds
    on the n_seeds smallest vertices, dangling out-mass dropped (the
    engine.ppr convention; the partgraph has no dangling vertices)."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append(f"sd AS MATERIALIZED (SELECT v FROM v ORDER BY v "
                 f"LIMIT {n_seeds})")
    parts.append(f"""r0 AS MATERIALIZED (
  SELECT v.v, CASE WHEN sd.v IS NOT NULL THEN 1.0 / {n_seeds}
              ELSE 0.0 END AS r
  FROM v LEFT JOIN sd ON sd.v = v.v)""")
    for k in range(1, rounds + 1):
        parts.append(f"""r{k} AS MATERIALIZED (
  SELECT v.v,
         CASE WHEN sd.v IS NOT NULL THEN {1 - delta} / {n_seeds}
              ELSE 0.0 END
           + {delta} * COALESCE(m.s, 0) AS r
  FROM v LEFT JOIN sd ON sd.v = v.v LEFT JOIN (
    SELECT e.t AS v, sum(r{k-1}.r / deg.d) AS s
    FROM e JOIN r{k-1} ON r{k-1}.v = e.s JOIN deg ON deg.v = e.s
    GROUP BY e.t) m ON m.v = v.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(r, 6) AS rank FROM r{rounds} "
            f"ORDER BY vid")


def _cdlp_sql(rounds: int) -> str:
    parts = [f"WITH {_PRELUDE},"]
    parts.append("l0 AS MATERIALIZED (SELECT v AS v, v AS lab FROM v)")
    for k in range(1, rounds + 1):
        parts.append(
            f"""l{k} AS MATERIALIZED (
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
tri AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS x, b.dst AS y
  FROM e0 a JOIN e0 b ON b.src = a.dst
            JOIN e0 c ON c.src = a.src AND c.dst = b.dst
)
"""

# fixed-round unrolled oracles (VERDICT r01 #1): the query variants of
# sssp/kcore/kshell/eigenvector/katz/hits run the engine in
# fixed-round / run-to-fixpoint mode and the SQL below unrolls the same
# number of rounds — enough to reach the fixpoint at the driver's
# sf0.01 gate (fixpoint margin asserted in tests/test_entry_contract).
SSSP_ROUNDS = 25
PEEL_ROUNDS = 20
KCORE_K = 3
EIG_ROUNDS = 20
KATZ_ROUNDS = 20
KATZ_ALPHA, KATZ_BETA = 0.01, 1.0
HITS_ROUNDS = 20
LPA_ROUNDS = 10  # reference default (app/lpa.py:27)

# bipartite customer→part graph for LPA-U2I: users = customers with a
# 2-prop label vector (p0 seeds: 1.0 BUILDING / 0.0 AUTOMOBILE —
# clamped by the reference's 0/1 rule — else 0.5; p1 = acctbal/20000),
# items = parts; edge weight = lineitem multiplicity
_LPA_EDGES_SQL = """
be AS MATERIALIZED (
  SELECT o.o_custkey AS u, l.l_partkey AS i, count(*)::DOUBLE AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
ulab0 AS MATERIALIZED (
  SELECT c_custkey AS vid,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0
              WHEN c_mktsegment = 'AUTOMOBILE' THEN 0.0
              ELSE 0.5 END AS p0,
         c_acctbal / 20000.0 AS p1
  FROM customer WHERE c_custkey IN (SELECT u FROM be)),
od AS MATERIALIZED (SELECT u AS vid, count(*)::DOUBLE AS d FROM be GROUP BY u),
ind AS MATERIALIZED (SELECT i AS vid, count(*)::DOUBLE AS d FROM be GROUP BY i),
ns AS MATERIALIZED (
  SELECT be.u AS vid, sum(ind.d) AS s FROM be JOIN ind ON ind.vid = be.i
  GROUP BY be.u)
"""


def _lpa_sql(rounds: int) -> str:
    """Unrolled LPA-U2I (apps/lpa/lpa_u2i.h:29-245): steps 2..rounds
    alternate u2i weighted sums and i2u clamp-or-normalized updates."""
    parts = [f"WITH {_LPA_EDGES_SQL},",
             "u1 AS MATERIALIZED (SELECT vid, p0, p1 FROM ulab0)"]
    last_u = "u1"
    for step in range(2, rounds + 1):
        if step % 2 == 0:
            parts.append(f"""i{step} AS MATERIALIZED (
  SELECT be.i AS vid, sum(u.p0 * be.w) AS p0, sum(u.p1 * be.w) AS p1
  FROM be JOIN {last_u} u ON u.vid = be.u GROUP BY be.i)""")
            last_i = f"i{step}"
        else:
            prop_updates = []
            for p in ("p0", "p1"):
                prop_updates.append(f"""
    CASE WHEN u.{p} = 0.0 OR u.{p} = 1.0 THEN u.{p}
         WHEN COALESCE(ns.s, 0) <> COALESCE(od.d, 0)
         THEN (COALESCE(t.{p}, 0) - COALESCE(od.d, 0) * u.{p})
              / (COALESCE(ns.s, 0) - COALESCE(od.d, 0))
         ELSE u.{p} END AS {p}""")
            parts.append(f"""u{step} AS MATERIALIZED (
  SELECT u.vid,{','.join(prop_updates)}
  FROM {last_u} u
  LEFT JOIN (SELECT be.u AS vid, sum(i.p0 * be.w) AS p0,
                    sum(i.p1 * be.w) AS p1
             FROM be JOIN {last_i} i ON i.vid = be.i
             GROUP BY be.u) t ON t.vid = u.vid
  LEFT JOIN od ON od.vid = u.vid
  LEFT JOIN ns ON ns.vid = u.vid)""")
            last_u = f"u{step}"
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT vid, round(p0, 6) AS p0, round(p1, 6) AS p1 "
            f"FROM {last_u} ORDER BY vid")


def _sssp_chain(rounds: int, prelude: str = None, vtab: str = "v") -> list[str]:
    """CTE chain s0..sR: unrolled Bellman-Ford over the weighted
    symmetric edge set, d_k(v) = min(d_{k-1}(v), min over in-edges
    d_{k-1}(s) + w). ``prelude`` must define ``e`` (s, t, w) and the
    vertex table ``vtab``; the source is min(``vtab``)."""
    parts = [f"WITH {prelude or _PRELUDE},"]
    parts.append(f"s0 AS MATERIALIZED (SELECT {vtab}.v, "
                 f"CASE WHEN {vtab}.v = (SELECT min(v) FROM {vtab})"
                 f" THEN 0.0 END AS d FROM {vtab})")
    for k in range(1, rounds + 1):
        parts.append(f"""s{k} AS MATERIALIZED (
  SELECT a.v,
         CASE WHEN m.md IS NULL THEN a.d
              WHEN a.d IS NULL OR m.md < a.d THEN m.md
              ELSE a.d END AS d
  FROM s{k-1} a LEFT JOIN (
    SELECT e.t AS v, min(p.d + e.w) AS md
    FROM e JOIN s{k-1} p ON p.v = e.s WHERE p.d IS NOT NULL
    GROUP BY e.t) m ON m.v = a.v)""")
    return parts


def _sssp_sql(rounds: int) -> str:
    parts = _sssp_chain(rounds)
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(d, 6) AS dist FROM s{rounds} "
            f"WHERE d IS NOT NULL ORDER BY vid")


def _sssp_path_sql(rounds: int) -> str:
    """SSSP predecessors (apps/sssp/sssp_path.h twin): at the fixpoint,
    pred(v) = min{ s : d(s) + w(s,v) = d(v) } over the symmetric edge
    set — exactly the engine's min-parent tie-break (partition.py
    spath_apply). The float equality is exact on both sides: every dist
    is a left-to-right path sum of identical doubles, and min commutes
    with the monotone +w, so numpy and DuckDB realize identical bits."""
    parts = _sssp_chain(rounds)
    parts.append(f"d AS MATERIALIZED "
                 f"(SELECT v, d FROM s{rounds} WHERE d IS NOT NULL)")
    parts.append("""pr AS (
  SELECT e.t AS v, min(e.s) AS p
  FROM e JOIN d a ON a.v = e.s JOIN d b ON b.v = e.t
  WHERE a.d + e.w = b.d GROUP BY e.t)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT d.v AS vid, round(d.d, 6) AS dist,\n"
            f"       CASE WHEN d.v = (SELECT min(v) FROM v) THEN d.v\n"
            f"            ELSE pr.p END AS pred\n"
            f"FROM d LEFT JOIN pr ON pr.v = d.v ORDER BY vid")


_HAS_PATH_SQL = f"""
WITH RECURSIVE {_PRELUDE},
r AS (
  SELECT (SELECT min(v) FROM v) AS v
  UNION
  SELECT e.t FROM r JOIN e ON e.s = r.v
)
SELECT (count(*) > 0) AS has_path FROM r WHERE v = (SELECT max(v) FROM v)"""


def _sssp_avg_sql(rounds: int, k: int) -> str:
    """Multi-source unrolled Bellman-Ford (the first ``k`` vids = the
    ``k`` smallest oids, matching the engine's deterministic
    ``max_sources`` subsample) → mean finite distance excluding the k
    self-zero pairs (apps/sssp/sssp_average_length.h semantics)."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append(f"src AS MATERIALIZED (SELECT v FROM v ORDER BY v LIMIT {k})")
    parts.append("m0 AS MATERIALIZED (SELECT s.v AS s0, v.v, "
                 "CASE WHEN v.v = s.v THEN 0.0 END AS d "
                 "FROM src s CROSS JOIN v)")
    for r in range(1, rounds + 1):
        parts.append(f"""m{r} AS MATERIALIZED (
  SELECT a.s0, a.v,
         CASE WHEN m.md IS NULL THEN a.d
              WHEN a.d IS NULL OR m.md < a.d THEN m.md
              ELSE a.d END AS d
  FROM m{r-1} a LEFT JOIN (
    SELECT p.s0, e.t AS v, min(p.d + e.w) AS md
    FROM e JOIN m{r-1} p ON p.v = e.s WHERE p.d IS NOT NULL
    GROUP BY p.s0, e.t) m ON m.s0 = a.s0 AND m.v = a.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT round(sum(d) / (count(d) - {k}), 6) AS avg_length "
            f"FROM m{rounds} WHERE d IS NOT NULL")


# ----------------------------------------------------------------------
# dynamic-mutation twins (MODIFY_EDGES / MODIFY_VERTICES,
# grape_instance.cc:247-296 over dynamic_fragment.h): the Ray side
# mutates the resident pool IN PLACE (Graph.remove_edges /
# remove_vertices / update_edge_weights) and the SQL twin recomputes
# over the equivalently mutated edge table. Both share the literal
# predicates below (canonical src < dst pairs).
# ----------------------------------------------------------------------

MUT_EDGE_PRED = "(src * 131071 + dst) % 5 = 0"   # deleted edge pairs
MUT_VERT_MOD = 13                                 # deleted vertices
MUT_W_PRED = "(src + dst) % 3 = 0"                # halved-weight pairs

# vertex set from the ORIGINAL graph (edge deletion keeps vertices);
# edge set = e0 minus the deleted canonical pairs, both directions
_MUT_EDGE_PRELUDE = f"""
occ AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst,
       count(*)::BIGINT AS w
       FROM occ a JOIN occ b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
v AS MATERIALIZED (SELECT DISTINCT src AS v FROM
      (SELECT src FROM e0 UNION ALL SELECT dst AS src FROM e0)),
e0m AS MATERIALIZED (SELECT src, dst, w FROM e0
      WHERE NOT ({MUT_EDGE_PRED})),
e AS MATERIALIZED (SELECT src AS s, dst AS t, w FROM e0m
      UNION ALL SELECT dst, src, w FROM e0m)
"""

_MUT_WCC_SQL = f"""
WITH RECURSIVE {_MUT_EDGE_PRELUDE},
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
)
SELECT v AS vid, min(l) AS comp FROM r GROUP BY v ORDER BY vid
"""

# vertex deletion (oid % MOD = 0) + halved weights on the surviving
# (src+dst) % 3 = 0 pairs; surviving vertex table = vm
_MUT_SSSP_PRELUDE = f"""
occ AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst,
       count(*)::BIGINT AS w
       FROM occ a JOIN occ b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
vm AS MATERIALIZED (SELECT DISTINCT src AS v FROM
      (SELECT src FROM e0 UNION ALL SELECT dst AS src FROM e0)
      WHERE src % {MUT_VERT_MOD} <> 0),
e0m AS MATERIALIZED (SELECT src, dst,
       CASE WHEN {MUT_W_PRED} THEN w * 0.5 ELSE w * 1.0 END AS w
       FROM e0
       WHERE src % {MUT_VERT_MOD} <> 0 AND dst % {MUT_VERT_MOD} <> 0),
e AS MATERIALIZED (SELECT src AS s, dst AS t, w FROM e0m
      UNION ALL SELECT dst, src, w FROM e0m)
"""


def _mut_sssp_sql(rounds: int) -> str:
    parts = _sssp_chain(rounds, prelude=_MUT_SSSP_PRELUDE, vtab="vm")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(d, 6) AS dist FROM s{rounds} "
            f"WHERE d IS NOT NULL ORDER BY vid")


def _peel_chain(k: int, rounds: int, prefix: str) -> str:
    """CTE chain {prefix}0..{prefix}R: synchronous k-core peel —
    alive_i = vertices whose degree within alive_{i-1} is >= k."""
    ctes = [f"{prefix}0 AS MATERIALIZED (SELECT v FROM v)"]
    for i in range(1, rounds + 1):
        ctes.append(f"""{prefix}{i} AS MATERIALIZED (
  SELECT s AS v FROM (
    SELECT e.s, count(*) AS c FROM e
    JOIN {prefix}{i-1} x ON x.v = e.s
    JOIN {prefix}{i-1} y ON y.v = e.t
    GROUP BY e.s) WHERE c >= {k})""")
    return ",\n".join(ctes)


def _kcore_sql(k: int, rounds: int) -> str:
    return f"""
WITH {_PRELUDE},
{_peel_chain(k, rounds, 'a')}
SELECT v.v AS vid, (a.v IS NOT NULL) AS in_core
FROM v LEFT JOIN a{rounds} a ON a.v = v.v ORDER BY vid"""


def _kshell_sql(k: int, rounds: int) -> str:
    return f"""
WITH {_PRELUDE},
{_peel_chain(k, rounds, 'a')},
{_peel_chain(k + 1, rounds, 'b')}
SELECT v.v AS vid,
       (a.v IS NOT NULL AND b.v IS NULL) AS in_shell
FROM v LEFT JOIN a{rounds} a ON a.v = v.v
       LEFT JOIN b{rounds} b ON b.v = v.v ORDER BY vid"""


def _eig_sql(rounds: int) -> str:
    """x_k = (x_{k-1} + A^T x_{k-1}) / ||...||_2, x_0 = 1/N — the
    engine's eigenvector_centrality run with tol=0 (fixed rounds)."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append("x0 AS MATERIALIZED (SELECT v.v, 1.0 / (SELECT c FROM n) AS x FROM v)")
    for k in range(1, rounds + 1):
        parts.append(f"""y{k} AS MATERIALIZED (
  SELECT a.v, a.x + COALESCE(m.s, 0) AS x
  FROM x{k-1} a LEFT JOIN (
    SELECT e.t AS v, sum(p.x) AS s FROM e JOIN x{k-1} p ON p.v = e.s
    GROUP BY e.t) m ON m.v = a.v),
x{k} AS MATERIALIZED (SELECT v, x / (SELECT sqrt(sum(x*x)) FROM y{k}) AS x FROM y{k})""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(x, 6) AS centrality FROM x{rounds} "
            f"ORDER BY vid")


def _katz_sql(rounds: int, alpha: float, beta: float) -> str:
    """x_k = alpha*A^T x_{k-1} + beta from x_0 = 0; final L2 norm."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append("x0 AS MATERIALIZED (SELECT v.v, 0.0 AS x FROM v)")
    for k in range(1, rounds + 1):
        parts.append(f"""x{k} AS MATERIALIZED (
  SELECT a.v, {alpha}::DOUBLE * COALESCE(m.s, 0) + {beta}::DOUBLE AS x
  FROM x{k-1} a LEFT JOIN (
    SELECT e.t AS v, sum(p.x) AS s FROM e JOIN x{k-1} p ON p.v = e.s
    GROUP BY e.t) m ON m.v = a.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(x / (SELECT sqrt(sum(x*x)) "
            f"FROM x{rounds}), 6) AS centrality FROM x{rounds} ORDER BY vid")


def _hits_sql(rounds: int) -> str:
    """Per step: auth = Σ_nbr hub_last, hub = Σ_nbr auth (both over the
    symmetric edge set), each max-normalized; final sum-normalize —
    apps/hits/hits.h:35-204 on the undirected dual store."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append("h0 AS MATERIALIZED (SELECT v.v, 1.0 / (SELECT c FROM n) AS x FROM v)")
    for k in range(1, rounds + 1):
        parts.append(f"""ar{k} AS MATERIALIZED (
  SELECT v.v, COALESCE(m.s, 0) AS x FROM v LEFT JOIN (
    SELECT e.t AS v, sum(p.x) AS s FROM e JOIN h{k-1} p ON p.v = e.s
    GROUP BY e.t) m ON m.v = v.v),
hr{k} AS MATERIALIZED (
  SELECT v.v, COALESCE(m.s, 0) AS x FROM v LEFT JOIN (
    SELECT e.t AS v, sum(p.x) AS s FROM e JOIN ar{k} p ON p.v = e.s
    GROUP BY e.t) m ON m.v = v.v),
a{k} AS MATERIALIZED (SELECT v, x / (CASE WHEN (SELECT max(x) FROM ar{k}) > 0
  THEN (SELECT max(x) FROM ar{k}) ELSE 1.0 END) AS x FROM ar{k}),
h{k} AS MATERIALIZED (SELECT v, x / (CASE WHEN (SELECT max(x) FROM hr{k}) > 0
  THEN (SELECT max(x) FROM hr{k}) ELSE 1.0 END) AS x FROM hr{k})""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT a.v AS vid,\n"
            f"  round(a.x / (SELECT sum(x) FROM a{rounds}), 6) AS auth,\n"
            f"  round(h.x / (SELECT sum(x) FROM h{rounds}), 6) AS hub\n"
            f"FROM a{rounds} a JOIN h{rounds} h ON h.v = a.v ORDER BY vid")

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


def _partgraph_str(sf_dir: str):
    """String-oid partgraph (reference oid_type=string,
    framework/graph.py:108-111): the same co-occurrence edges keyed by
    'p' || partkey strings — exercises ids.py's object-array dense-rank
    path end-to-end under the DuckDB oracle. NOT cached (see
    _mutgraph's pool-budget note): the one consumer closes the pool
    after materializing."""
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    def to_str(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "src": pc.binary_join_element_wise(
                "p", pc.cast(t["src"], pa.string()), ""),
            "dst": pc.binary_join_element_wise(
                "p", pc.cast(t["dst"], pa.string()), ""),
            "weight": t["weight"],
        })

    edges = (partgraph_edges(sf_dir)
             .map_batches(to_str, batch_format="pyarrow").materialize())
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-strgraph-{abs(hash(sf_dir)) % 10**8}",
        weight_col="weight",
        symmetrize=True,
    )
    return g


def _mutgraph(sf_dir: str):
    """Partgraph with the MUT_EDGE_PRED canonical pairs deleted IN
    PLACE on the resident pool (Graph.remove_edges → both stored
    directions) — MODIFY_EDGES delete, dynamic_fragment.h:220-233.

    NOT cached: mutation graphs are consumed by exactly one query
    each, and every cached graph pins a resident actor pool whose CPU
    reservation counts against the cluster — four cached pools would
    cover a whole 32-CPU driver cluster and deadlock any later
    Dataset task (the r02 full-suite-hang failure mode). Callers must
    g.close() after materializing their result."""
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    edges = partgraph_edges(sf_dir).materialize()
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-mutgraph-{abs(hash(sf_dir)) % 10**8}",
        weight_col="weight",
        symmetrize=True,
    )

    def kill(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        return t.filter(pa.array((src * 131071 + dst) % 5 == 0))

    g.remove_edges(edges.map_batches(kill, batch_format="pyarrow"))
    return g


def _q_pg_mutation_wcc(sf_dir):
    g = _mutgraph(sf_dir)
    try:
        return g.to_oid(g.wcc(), vid_cols=("vid", "comp")).materialize()
    finally:
        g.close()


def _mutvgraph(sf_dir: str):
    """Partgraph with vertices oid % MUT_VERT_MOD deleted (incident
    edges go with them) and the surviving MUT_W_PRED canonical pairs'
    weights halved in place — MODIFY_VERTICES delete + MODIFY_EDGES
    update on the resident pool. Not cached (see _mutgraph)."""
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    edges = partgraph_edges(sf_dir).materialize()
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-mutvgraph-{abs(hash(sf_dir)) % 10**8}",
        weight_col="weight",
        symmetrize=True,
    )
    oids = g.oid_array
    g.remove_vertices(oids[oids % MUT_VERT_MOD == 0])

    def halve(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        t = t.filter(pa.array((src + dst) % 3 == 0))
        w = t["weight"].to_numpy().astype(np.float64) * 0.5
        return t.set_column(t.schema.get_field_index("weight"),
                            "weight", pa.array(w))

    g.update_edge_weights(edges.map_batches(halve, batch_format="pyarrow"))
    return g


def _q_pg_mutation_sssp(sf_dir):
    """SSSP from the smallest SURVIVING oid over the vertex-deleted,
    weight-updated graph; unreachable (incl. newly isolated) rows are
    dropped on both sides."""
    g = _mutvgraph(sf_dir)
    try:
        oids = g.oid_array
        src = oids[oids % MUT_VERT_MOD != 0][0]
        ds = g.to_oid(g.sssp(src))

        def fin(t: pa.Table) -> pa.Table:
            from graphscope_ray.util import round_half_away
            d = t["dist"].to_numpy()
            keep = np.isfinite(d)
            return pa.table({"vid": t["vid"].to_numpy()[keep],
                             "dist": round_half_away(d[keep], 6)})

        return ds.map_batches(fin, batch_format="pyarrow").materialize()
    finally:
        g.close()


def _q_pg_string_oids(sf_dir):
    """WCC + PageRank over the string-oid graph; comp is the
    lexicographically smallest member oid (min dense vid = min string
    under rank ids)."""
    from graphscope_ray.graph.joins import attach_values
    g = _partgraph_str(sf_dir)
    try:
        wcc = g.to_oid(g.wcc(), vid_cols=("vid", "comp"))
        pr = _round_col(
            g.to_oid(g.pagerank(delta=DELTA, max_round=PR_ROUNDS)), "rank")
        return attach_values(wcc, pr, on="vid", table_key="vid",
                             value_names=["rank"]).materialize()
    finally:
        g.close()


def _string_oids_sql(rounds: int, delta: float) -> str:
    parts = ["""WITH RECURSIVE
occ AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT 'p' || a.l_partkey::VARCHAR AS src,
         'p' || b.l_partkey::VARCHAR AS dst, count(*)::BIGINT AS w
  FROM occ a JOIN occ b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (SELECT src AS s, dst AS t, w FROM e0
      UNION ALL SELECT dst, src, w FROM e0),
v AS MATERIALIZED (SELECT DISTINCT s AS v FROM e),
deg AS MATERIALIZED (SELECT s AS v, count(*)::BIGINT AS d FROM e GROUP BY s),
n AS MATERIALIZED (SELECT count(*) AS c FROM v),
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
),
wcc AS MATERIALIZED (SELECT v, min(l) AS comp FROM r GROUP BY v),
r0 AS MATERIALIZED (SELECT v.v, 1.0 / (SELECT c FROM n) AS r FROM v)"""]
    for k in range(1, rounds + 1):
        parts.append(f"""r{k} AS MATERIALIZED (
  SELECT v.v,
         {1 - delta} / (SELECT c FROM n)
           + {delta} * COALESCE(m.s, 0) AS r
  FROM v LEFT JOIN (
    SELECT e.t AS v, sum(r{k-1}.r / deg.d) AS s
    FROM e JOIN r{k-1} ON r{k-1}.v = e.s JOIN deg ON deg.v = e.s
    GROUP BY e.t) m ON m.v = v.v)""")
    return (",\n".join(parts) + f"""
SELECT wcc.v AS vid, wcc.comp, round(r{rounds}.r, 6) AS rank
FROM wcc JOIN r{rounds} ON r{rounds}.v = wcc.v ORDER BY vid""")


def _q_pg_pattern_paths(sf_dir):
    """Label-pattern path sampling over the natural TPC-H property
    graph — customer -[places]-> order -[contains]-> part — the
    reference's true sampling_path surface (apps/sampling_path/
    sampling_path.h:27-142). Vertex ids are namespaced key*4+typecode
    so the three key spaces cannot collide; output columns decode back
    to raw keys for the SQL twin."""
    from graphscope_ray.graph.api import sampling_path_pattern
    import pyarrow.compute as pc

    def enc(col, code):
        return pc.add(pc.multiply(col, 4), code)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey"])

    def vt(code, lab):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "vid": enc(t.column(0), code),
                "label": pa.array([lab] * len(t), pa.string())})
        return f

    verts = (cust.map_batches(vt(0, "customer"), batch_format="pyarrow")
             .union(orders.select_columns(["o_orderkey"])
                    .map_batches(vt(1, "order"), batch_format="pyarrow"))
             .union(part.map_batches(vt(2, "part"),
                                     batch_format="pyarrow")))

    def places(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": enc(t["o_custkey"], 0), "dst": enc(t["o_orderkey"], 1),
            "label": pa.array(["places"] * len(t), pa.string())})

    def contains(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": enc(t["l_orderkey"], 1), "dst": enc(t["l_partkey"], 2),
            "label": pa.array(["contains"] * len(t), pa.string())})

    edges = (orders.map_batches(places, batch_format="pyarrow")
             .union(li.map_batches(contains, batch_format="pyarrow")))
    out = sampling_path_pattern(
        verts, edges,
        ["customer", "places", "order", "contains", "part"])

    def dec(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pcc
        return pa.table({f"v{i}": pcc.divide(t[f"v{i}"], 4)
                         for i in range(3)})

    return out.map_batches(dec, batch_format="pyarrow")


_PATTERN_PATHS_SQL = """
SELECT o.o_custkey AS v0, l.l_orderkey AS v1, l.l_partkey AS v2
FROM orders o
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
  ON l.l_orderkey = o.o_orderkey
ORDER BY v0, v1, v2"""


# ----------------------------------------------------------------------
# GIE-lite traversal rows (graphscope_ray/gie/): Gremlin-style steps
# over the natural TPC-H labeled property graph. Reference surface:
# interactive_engine query_flow.proto:65-116 operator enum.
# ----------------------------------------------------------------------


def _gie_graph(sf_dir: str):
    """customer -[places]-> order -[contains {qty}]-> part, labeled
    property graph for the GIE traversal rows. Vertex ids namespaced
    key*4+typecode (0=customer, 1=order, 2=part) so the three key
    spaces cannot collide — SQL twins decode with integer divide."""
    key = ("gie", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    from graphscope_ray.gie import PropertyGraph
    import pyarrow.compute as pc

    def enc(col, code):
        return pc.add(pc.multiply(col, 4), code)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_acctbal"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_totalprice"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey",
                                        "l_quantity"])
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_retailprice"])

    def v_cust(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": enc(t["c_custkey"], 0),
            "label": pa.array(["customer"] * len(t), pa.string()),
            "acctbal": t["c_acctbal"],
            "totalprice": pa.nulls(len(t), pa.float64()),
            "retailprice": pa.nulls(len(t), pa.float64())})

    def v_ord(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": enc(t["o_orderkey"], 1),
            "label": pa.array(["order"] * len(t), pa.string()),
            "acctbal": pa.nulls(len(t), pa.float64()),
            "totalprice": t["o_totalprice"],
            "retailprice": pa.nulls(len(t), pa.float64())})

    def v_part(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": enc(t["p_partkey"], 2),
            "label": pa.array(["part"] * len(t), pa.string()),
            "acctbal": pa.nulls(len(t), pa.float64()),
            "totalprice": pa.nulls(len(t), pa.float64()),
            "retailprice": t["p_retailprice"]})

    verts = (cust.map_batches(v_cust, batch_format="pyarrow")
             .union(orders.select_columns(["o_orderkey", "o_totalprice"])
                    .map_batches(v_ord, batch_format="pyarrow"))
             .union(part.map_batches(v_part, batch_format="pyarrow")))

    def e_places(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": enc(t["o_custkey"], 0),
            "dst": enc(t["o_orderkey"], 1),
            "label": pa.array(["places"] * len(t), pa.string()),
            "qty": pa.nulls(len(t), pa.float64())})

    def e_contains(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": enc(t["l_orderkey"], 1),
            "dst": enc(t["l_partkey"], 2),
            "label": pa.array(["contains"] * len(t), pa.string()),
            "qty": t["l_quantity"]})

    edges = (orders.select_columns(["o_orderkey", "o_custkey"])
             .map_batches(e_places, batch_format="pyarrow")
             .union(li.map_batches(e_contains, batch_format="pyarrow")))
    g = PropertyGraph(verts.materialize(), edges.materialize())
    _CACHE[key] = g
    return g


def _gie_decode(ds, mapping):
    """Decode namespaced vids back to raw TPC-H keys (// 4) and rename
    for the SQL twin; non-vid columns pass through under new names."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        cols = {}
        for src_col, (out_col, is_vid) in mapping.items():
            c = t[src_col]
            cols[out_col] = pc.divide(c, 4) if is_vid else c
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def _q_gie_part_reach(sf_dir):
    """V('customer').has(acctbal>0).out('places').out('contains')
    .group_count() — parts reached from in-credit customers, bag
    semantics (one count per lineitem row). Ops: V/HAS/OUT/
    GROUP_COUNT (query_flow.proto ops 0/20/2/19)."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    gc = (g.V("customer").has("acctbal", P.gt(0.0))
          .out("places").out("contains").group_count())
    return _gie_decode(gc, {"t": ("partkey", True),
                            "count": ("n_reach", False)})


_GIE_PART_REACH_SQL = """
SELECT l.l_partkey AS partkey, count(*)::BIGINT AS n_reach
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_acctbal > 0
GROUP BY 1 ORDER BY partkey"""


def _q_gie_heavy_parts(sf_dir):
    """V('order').outE('contains').has(qty>=48).inV().dedup() — the
    distinct parts that ever ship in near-full quantity. Ops:
    OUT_E/HAS(edge prop)/IN_V/DEDUP (ops 5/20/9/18)."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    t = (g.V("order").outE("contains").has("qty", P.gte(48.0))
         .inV().dedup())
    return _gie_decode(t.dataset(), {"t": ("partkey", True)})


_GIE_HEAVY_PARTS_SQL = """
SELECT DISTINCT l_partkey AS partkey FROM lineitem
WHERE l_quantity >= 48 ORDER BY partkey"""


def _q_gie_cust_big_orders(sf_dir):
    """V('customer').as_('c').out('places').has(totalprice>100000)
    .select('c').group_count() — big-ticket order counts per customer
    via tag + jump-back. Ops: AS/SELECT_ONE/HAS/GROUP_COUNT
    (ops 11/20/19 + tag store)."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    gc = (g.V("customer").as_("c").out("places")
          .has("totalprice", P.gt(100_000.0))
          .select("c").group_count())
    return _gie_decode(gc, {"t": ("custkey", True),
                            "count": ("n_big", False)})


_GIE_CUST_BIG_ORDERS_SQL = """
SELECT o_custkey AS custkey, count(*)::BIGINT AS n_big
FROM orders WHERE o_totalprice > 100000
GROUP BY 1 ORDER BY custkey"""


def _q_gie_order_topk(sf_dir):
    """V('order').order_by('totalprice', desc).limit(10) — ORDER +
    RANGE (ops 14/15) with the per-block top-n combiner; ties broken
    by vid (monotone in o_orderkey under the *4+1 encoding, so the
    SQL twin's o_orderkey tiebreak agrees)."""
    g = _gie_graph(sf_dir)
    t = g.V("order").order_by("totalprice", ascending=False, limit=10)
    return _round_col(
        _gie_decode(t.dataset(), {"t": ("orderkey", True),
                                  "totalprice": ("totalprice", False)}),
        "totalprice")


_GIE_ORDER_TOPK_SQL = """
SELECT o_orderkey AS orderkey, round(o_totalprice, 6) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""


def _q_gie_loyal_custs(sf_dir):
    """V('customer').degree_local('out','places').filter_col(>=8) —
    per-traverser neighbor counts (OUT_COUNT op 66) + FILTER (op 30):
    customers holding at least 8 orders, with the count."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    t = (g.V("customer").degree_local("out", "places", name="n_orders")
         .filter_col("n_orders", P.gte(8)))
    return _gie_decode(t.dataset().select_columns(["t", "n_orders"]),
                       {"t": ("custkey", True),
                        "n_orders": ("n_orders", False)})


_GIE_LOYAL_CUSTS_SQL = """
SELECT o_custkey AS custkey, count(*)::BIGINT AS n_orders
FROM orders GROUP BY 1 HAVING count(*) >= 8 ORDER BY custkey"""


def _q_gie_part_qty(sf_dir):
    """E('contains').group_agg(e_dst, e_qty, sum) — SUM_BY_KEY
    (op 53) over the edge bag: total shipped quantity per part,
    one coarse-bucket exchange."""
    g = _gie_graph(sf_dir)
    agg = g.E("contains").group_agg("e_dst", "e_qty", "sum",
                                    name="total_qty")
    return _round_col(
        _gie_decode(agg, {"e_dst": ("partkey", True),
                          "total_qty": ("total_qty", False)}),
        "total_qty")


_GIE_PART_QTY_SQL = """
SELECT l_partkey AS partkey, round(sum(l_quantity), 6) AS total_qty
FROM lineitem GROUP BY 1 ORDER BY partkey"""


def _q_gie_modest_custs(sf_dir):
    """V('customer').where_not_exists(out('places').has(totalprice >
    300k)) — the anti-semi-join form (NOT=47 /
    JOIN_DIRECT_FILTER_NEGATE=70): customers with no big-ticket
    order. Survivor keys dedup on the coarse-bucket kernel; the
    flag attach is broadcast-or-join."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    t = g.V("customer").where_not_exists(
        lambda s: s.out("places").has("totalprice", P.gt(300_000.0)))
    return _gie_decode(t.dataset(), {"t": ("custkey", True)})


_GIE_MODEST_CUSTS_SQL = """
SELECT c_custkey AS custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
ORDER BY custkey"""


def _q_gie_repeat_reach(sf_dir):
    """V('customer').has(acctbal>5000).repeat(out()).until(
    has_label('part')).group_count() — the dynamic-termination REPEAT/
    UNTIL loop (post-check, one driver round per iteration): rich
    customers walk outward until they stand on a part. On the
    customer→order→part DAG every traverser exits at round 2, but the
    until-check runs each round for real."""
    from graphscope_ray.gie import P
    g = _gie_graph(sf_dir)
    t = (g.V("customer").has("acctbal", P.gt(5000.0))
         .repeat_until(lambda s: s.out(),
                       lambda s: s.has_label("part"), max_times=4))
    return _gie_decode(t.group_count(),
                       {"t": ("partkey", True), "count": ("n_reach", False)})


_GIE_REPEAT_REACH_SQL = """
SELECT l.l_partkey AS partkey, count(*)::BIGINT AS n_reach
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_acctbal > 5000
GROUP BY 1 ORDER BY partkey"""


def _q_gie_price_page(sf_dir):
    """V('part').order_by(retailprice desc).range_(10, 30) — ORDER +
    the non-zero-low RANGE paging slice (rows 11-30). Block-local
    top-30 trims feed the global sort; the ≤30 survivors coalesce to
    drop the first 10."""
    g = _gie_graph(sf_dir)
    t = (g.V("part").order_by("retailprice", ascending=False)
         .range_(10, 30))
    return _gie_decode(t.dataset().select_columns(["t", "retailprice"]),
                       {"t": ("partkey", True),
                        "retailprice": ("retailprice", False)})


_GIE_PRICE_PAGE_SQL = """
SELECT p_partkey AS partkey, p_retailprice AS retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey
LIMIT 20 OFFSET 10"""


def _q_gie_path_project(sf_dir):
    """V('customer').as_('c').out('places').as_('o').out('contains')
    .select_map('c','o',current='p') — the n-ary SELECT projection:
    one (customer, order, part) row per traverser (bag semantics, one
    per lineitem edge)."""
    g = _gie_graph(sf_dir)
    t = (g.V("customer").as_("c").out("places").as_("o")
         .out("contains"))
    return _gie_decode(t.select_map("c", "o", current="p"),
                       {"c": ("custkey", True), "o": ("orderkey", True),
                        "p": ("partkey", True)})


_GIE_PATH_PROJECT_SQL = """
SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       l.l_partkey AS partkey
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
ORDER BY custkey, orderkey, partkey"""


def _q_gie_gremlin(sf_dir):
    """Gremlin-STRING frontend row (reference: the Java frontend
    `interactive_engine/src/frontend` compiles Gremlin text into
    query_flow.proto ops; gie/gremlin.py is the text parser over
    GIE-lite): the full string below — source, edge-property filter,
    vertex move, dedup — is parsed and compiled to the same Ray-Data
    kernels as the builder DSL, proving the text surface end-to-end
    under the DuckDB oracle."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    t = gremlin(g, "g.V('order').outE('contains')"
                   ".has('qty', gte(50.0)).inV().dedup()")
    return _gie_decode(t.dataset(), {"t": ("partkey", True)})


_GIE_GREMLIN_SQL = """
SELECT DISTINCT l_partkey AS partkey FROM lineitem
WHERE l_quantity >= 50 ORDER BY partkey"""


def _q_gie_fold_unfold(sf_dir):
    """V('customer').as_('c').out('places').fold_by_key(tag_c, t,
    limit=3) → unfold — FOLD_BY_KEY (op 52) collecting each
    customer's order ids as a sorted list, RANGE_LOCAL (op 38)
    keeping the first 3, UNFOLD (op 28) flattening back to rows.
    Vid order ≡ orderkey order (vid = key*4+1 is monotone), so the
    SQL twin is a row_number()<=3 window."""
    from graphscope_ray.gie import unfold
    g = _gie_graph(sf_dir)
    t = g.V("customer").as_("c").out("places")
    folded = t.fold_by_key("tag_c", "t", limit=3, name="o")
    return _gie_decode(unfold(folded, "o"),
                       {"tag_c": ("custkey", True),
                        "o": ("orderkey", True)})


_GIE_FOLD_UNFOLD_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3 ORDER BY custkey, orderkey"""


def _q_gie_program_wcc(sf_dir):
    """PropertyGraph.program('wcc') — the PROGRAM_GRAPH_CC bridge
    (query_flow.proto ops 10000-10001; the reference compiles Gremlin
    ``program()`` steps to GAE vertex programs): connected components
    of the customer-order-part graph on the analytical engine's actor
    pool, vertices absent from the edge table (never-ordered parts,
    order-less customers) as singletons. Ids stay namespaced
    (key*4+code) — the SQL twin builds the same id space."""
    g = _gie_graph(sf_dir)
    return g.program("wcc")


_GIE_PROGRAM_WCC_SQL = """
WITH RECURSIVE
v AS MATERIALIZED (
  SELECT c_custkey*4 AS id FROM customer
  UNION ALL SELECT o_orderkey*4+1 FROM orders
  UNION ALL SELECT p_partkey*4+2 FROM part),
e0 AS MATERIALIZED (
  SELECT o_custkey*4 AS s, o_orderkey*4+1 AS t FROM orders
  UNION ALL
  SELECT DISTINCT l_orderkey*4+1, l_partkey*4+2 FROM lineitem),
e AS MATERIALIZED (SELECT s, t FROM e0 UNION SELECT t, s FROM e0),
-- flood only LOCAL-MIN labels: every component's global min is a
-- local min, so each vertex still receives its component min (other
-- received labels are larger and fall to the final min()); vertices
-- no label reaches (incl. edge-less singletons) keep their own id
r AS (
  SELECT id AS v, id AS l FROM v
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.s = v.id AND e.t < v.id)
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
)
SELECT v.id AS id, coalesce(min(r.l), v.id) AS comp
FROM v LEFT JOIN r ON r.v = v.id GROUP BY v.id ORDER BY id"""


def _q_pg_property_pagerank(sf_dir):
    """Per-label-context app run (reference
    ``apps/property/property_pagerank.h`` +
    ``LabeledVertexPropertyContext``): PageRank runs ONCE over the
    shared partgraph; the labeled context then yields BOTH labels'
    rank columns from that single run (Context.select_by_label —
    'r:even' and 'r:odd' selections stacked with a label column).
    Labels = oid parity, as pg_labeled_select/pg_labeled_app."""
    from graphscope_ray.graph.context import Context
    import pyarrow.compute as pc

    g, _ = _partgraph(sf_dir)
    pr = g.pagerank(delta=DELTA, max_round=PR_ROUNDS).materialize()

    def lab(t: pa.Table) -> pa.Table:
        even = pc.equal(pc.bit_wise_and(t["oid"], 1), 0)
        return pa.table({"vid": t["vid"],
                         "label": pc.if_else(even, "even", "odd")})

    ctx = Context(g, pr,
                  vertices=g.idmap.map_batches(lab,
                                               batch_format="pyarrow"))
    out = ctx.select_by_label(
        ["even", "odd"], {"id": "v:{label}.id", "rank": "r:{label}"})
    return _round_col(out, "rank").sort("id")


def _q_pg_pregel_udf(sf_dir):
    """@pregel decorator shim (reference udf/decorators.py:116): the
    reference's SSSP-Pregel UDF example (test_udf_app.py:100-128)
    VERBATIM — per-vertex scalar callbacks on the hash-partitioned BSP
    actors — over the namespaced customer→order→part DAG with unit
    integer weights. Same reachable-set semantics (and SQL twin
    family) as the vectorized gie_program_sssp row; values stay at
    the reference's 1e9 sentinel when unreachable and are dropped."""
    from graphscope_ray.graph.pregel_udf import AppAssets, pregel

    @pregel(vd_type="double", md_type="double")
    class SSSP_Pregel(AppAssets):  # test_udf_app.py:99-120, verbatim
        @staticmethod
        def Init(v, context):
            v.set_value(1000000000.0)

        @staticmethod
        def Compute(messages, v, context):
            src_id = context.get_config(b"src")
            cur_dist = v.value()
            new_dist = 1000000000.0
            if v.id() == src_id:
                new_dist = 0
            for message in messages:
                new_dist = min(message, new_dist)
            if new_dist < cur_dist:
                v.set_value(new_dist)
                for e_label_id in range(context.edge_label_num()):
                    edges = v.outgoing_edges(e_label_id)
                    for e in edges:
                        v.send(e.vertex(), new_dist + e.get_int(2))
            v.vote_to_halt()

    g = _gie_graph(sf_dir)
    src = 4 * int(ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"]).min("c_custkey"))

    def unit_w(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "dst": t["dst"],
                         "w": pa.array(np.ones(len(t), np.int64))})

    edges = g.edges.map_batches(unit_w, batch_format="pyarrow")
    df = SSSP_Pregel()(edges, src=src).to_dataframe()
    df = df[df["value"] < 1000000000.0].sort_values("id")
    return pa.table({
        "id": pa.array(df["id"].to_numpy(), pa.int64()),
        "dist": pa.array(df["value"].to_numpy().astype(np.int64))})


def _q_gie_program_sssp(sf_dir):
    """program('sssp') bridge (reference
    ShortestPathVertexProgramTreeNode.java — the GIE frontend
    compiles shortest-path program() steps to GAE vertex programs):
    hop distances from the smallest customer over the namespaced
    customer→order→part DAG, on the analytical engine's actor pool.
    Unreachable vertices (+inf) are dropped, matching the recursive
    twin's reachable set."""
    g = _gie_graph(sf_dir)
    src = 4 * int(ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"]).min("c_custkey"))
    ds = g.program("sssp", source=src, unit=True)

    def fin(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy()
        keep = np.isfinite(d)
        return pa.table({
            "id": t["id"].to_numpy()[keep],
            "dist": pa.array(d[keep].astype(np.int64))})

    return ds.map_batches(fin, batch_format="pyarrow")


_GIE_PROGRAM_SSSP_SQL = """
WITH RECURSIVE
e AS MATERIALIZED (
  SELECT o_custkey*4 AS s, o_orderkey*4+1 AS t FROM orders
  UNION ALL
  SELECT DISTINCT l_orderkey*4+1, l_partkey*4+2 FROM lineitem),
d AS (
  SELECT min(c_custkey)*4 AS v, 0 AS dist FROM customer
  UNION
  SELECT e.t, d.dist + 1 FROM d JOIN e ON e.s = d.v
  WHERE d.dist < 4)
SELECT v AS id, min(dist)::BIGINT AS dist FROM d GROUP BY v
ORDER BY id"""


def _q_gie_group_by(sf_dir):
    """General group().by(key).by(value-agg) — reference
    GroupTreeNode.java compiles non-count group values; GIE-lite's
    Traversal.group_by + the Gremlin-string form both route to the
    coarse-bucket SUM_BY_KEY kernel. Per-customer sum of order
    totals, run from the STRING frontend (tests assert the builder
    form is bit-identical)."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    out = gremlin(g, "g.V('customer').as('c').out('places')"
                     ".group().by('c')"
                     ".by(__.values('totalprice').sum())")
    return _round_col(
        _gie_decode(out, {"c": ("custkey", True),
                          "sum_totalprice": ("sum_total", False)}),
        "sum_total")


_GIE_GROUP_BY_SQL = """
SELECT o_custkey AS custkey, round(sum(o_totalprice), 6) AS sum_total
FROM orders GROUP BY 1 ORDER BY custkey"""


def _q_gie_and_or(sf_dir):
    """and()/or() sub-traversal composition (reference
    AndTreeNode.java / OrTreeNode.java): customers that are overdrawn
    OR (hold a >300k order AND have acctbal > 5000). Each branch is
    one hash-stamped flag attach; nesting and() inside or() proves
    the Chain recursion."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    t = gremlin(g, "g.V('customer').or("
                   "__.has('acctbal', lt(0.0)), "
                   "__.and(__.out('places').has('totalprice', "
                   "gt(300000.0)), __.has('acctbal', gt(5000.0))))")
    return _gie_decode(t.dataset(), {"t": ("custkey", True)})


_GIE_AND_OR_SQL = """
SELECT c_custkey AS custkey FROM customer c
WHERE c.c_acctbal < 0
   OR (EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 300000)
       AND c.c_acctbal > 5000)
ORDER BY custkey"""


def _q_gie_optional(sf_dir):
    """optional() (reference OptionalTreeNode.java): customers with a
    >400k order are REPLACED by those orders; the rest pass through
    unchanged. Ids stay namespaced (key*4+code) — the SQL twin builds
    the same id space for both union sides."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    t = gremlin(g, "g.V('customer').optional("
                   "__.out('places').has('totalprice', gt(400000.0)))")
    return _rename_ds(t.dataset(), {"t": "id"})


_GIE_OPTIONAL_SQL = """
SELECT o_orderkey*4+1 AS id FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT c_custkey*4 AS id FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
ORDER BY id"""


def _q_gie_pred_compose(sf_dir):
    """Predicate composition inside has() — and(gt,lt) / or(lt,gt)
    (reference AndTreeNode/OrTreeNode predicate forms): customers
    whose balance is outside [-500, 5000]."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    t = gremlin(g, "g.V('customer')"
                   ".has('acctbal', or(lt(-500.0), gt(5000.0)))")
    return _gie_decode(t.dataset(), {"t": ("custkey", True)})


_GIE_PRED_COMPOSE_SQL = """
SELECT c_custkey AS custkey FROM customer
WHERE c_acctbal < -500 OR c_acctbal > 5000 ORDER BY custkey"""


def _q_gie_project(sf_dir):
    """project().by().by() (reference ProjectTreeNode compile path):
    per-customer id, balance and order count in one pass — id copy,
    broadcast property attach, and the degree_local count kernel."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    out = gremlin(g, "g.V('customer')"
                     ".project('custkey', 'acctbal', 'n_orders')"
                     ".by(__.id()).by(__.values('acctbal'))"
                     ".by(__.out('places').count())")

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "custkey": pc.divide(t["custkey"], 4),
            "acctbal": t["acctbal"],
            "n_orders": t["n_orders"]})

    return out.map_batches(fin, batch_format="pyarrow")


_GIE_PROJECT_SQL = """
SELECT c_custkey AS custkey, c_acctbal AS acctbal,
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey)::BIGINT AS n_orders
FROM customer c ORDER BY custkey"""


def _q_gie_choose(sf_dir):
    """choose() (reference BranchTreeNode.java/CaseWhenTreeNode.java):
    in-credit customers are replaced by their orders; overdrawn ones
    pass through via the identity branch. Namespaced id space as
    gie_optional."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    t = gremlin(g, "g.V('customer').choose("
                   "__.has('acctbal', gt(0.0)), "
                   "__.out('places'), __.identity())")
    return _rename_ds(t.dataset(), {"t": "id"})


_GIE_CHOOSE_SQL = """
SELECT o.o_orderkey*4+1 AS id FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey WHERE c.c_acctbal > 0
UNION ALL
SELECT c_custkey*4 AS id FROM customer WHERE c_acctbal <= 0
ORDER BY id"""


def _q_gie_coalesce(sf_dir):
    """coalesce() (reference CoalesceStep compile path): every vertex
    takes its first non-empty branch — orders walk 'contains' (bag
    semantics: one traverser per lineitem row), customers fall back to
    'places', parts to identity. groupCount makes the multiset
    deterministic."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    gc = gremlin(g, "g.V().coalesce(__.out('contains'), "
                    "__.out('places'), __.identity()).groupCount()")
    return _rename_ds(gc, {"t": "id"})


_GIE_COALESCE_SQL = """
SELECT id, count(*)::BIGINT AS count FROM (
  SELECT l_partkey*4+2 AS id FROM lineitem
  UNION ALL SELECT o_orderkey*4+1 FROM orders
  UNION ALL SELECT p_partkey*4+2 FROM part
  -- identity fallbacks: vertices both walk branches miss
  UNION ALL SELECT c_custkey*4 FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
  UNION ALL SELECT o_orderkey*4+1 FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey)
) GROUP BY 1 ORDER BY id"""


def _q_gie_math(sf_dir):
    """math() (reference MathTreeNode.java — exp4j expression over the
    incoming value): order totals bucketed by floor(_/1000), counted.
    Identical IEEE double division + floor in numpy and DuckDB."""
    from graphscope_ray.gie import run_gremlin as gremlin
    g = _gie_graph(sf_dir)
    gc = gremlin(g, "g.V('order').values('totalprice')"
                    ".math('floor(_ / 1000)').groupCount()")
    return _rename_ds(gc, {"totalprice": "bucket"})


_GIE_MATH_SQL = """
SELECT floor(o_totalprice / 1000) AS bucket,
       count(*)::BIGINT AS count
FROM orders GROUP BY 1 ORDER BY bucket"""


def _q_pg_labeled_select(sf_dir):
    """LabeledVertexDataContext selector surface (reference
    context.py:305-329): label the partgraph vertices even/odd by oid
    parity, run PageRank, select {'id': 'v:even.id', 'rank':
    'r:even'} — the label filter is a pushed-down expression and the
    oid attach is the broadcast join."""
    from graphscope_ray.graph.context import Context
    import pyarrow.compute as pc
    g, _ = _partgraph(sf_dir)
    pr = _round_col(g.pagerank(delta=DELTA, max_round=PR_ROUNDS), "rank")

    def lab(t: pa.Table) -> pa.Table:
        even = pc.equal(pc.bit_wise_and(t["oid"], 1), 0)
        return pa.table({"vid": t["vid"],
                         "label": pc.if_else(even, "even", "odd")})

    verts = g.idmap.map_batches(lab, batch_format="pyarrow")
    ctx = Context(g, pr, vertices=verts)
    return ctx.select({"id": "v:even.id", "rank": "r:even"})


def _q_pg_labeled_app(sf_dir):
    """Labeled APP run (reference ``LabeledVertexPropertyContext``,
    `python/graphscope/framework/context.py:330-393`): project the
    partgraph to its 'even' label (oid parity — an edge survives iff
    BOTH endpoints are even), run WCC over the projection, and select
    per-label results {'id': 'v:even.id', 'comp': 'r:even'} through
    the labeled Context. The projection's vertex set is the filtered
    edge endpoints (induce-subgraph semantics); comp is translated to
    oid space before selection so the component label is the min OID
    of the component (dense vids are sorted-oid ranks, so min-vid ≡
    min-oid). Single-consumer graph → materialize + close (pool
    budget discipline)."""
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.graph.context import Context
    import pyarrow.compute as pc

    _, edges = _partgraph(sf_dir)

    def keep_even(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(pc.bit_wise_and(t["src"], 1), 0),
                     pc.equal(pc.bit_wise_and(t["dst"], 1), 0))
        return t.filter(ok)

    proj = edges.map_batches(keep_even, batch_format="pyarrow")
    g2 = Graph.from_edges(
        proj.materialize(),
        workdir=f"/tmp/gsr-labeledapp-{abs(hash(sf_dir)) % 10**8}",
        weight_col="weight",
        symmetrize=True,
    )
    try:
        comp = g2.to_oid(g2.wcc(), vid_cols=("comp",))

        def lab(t: pa.Table) -> pa.Table:
            even = pc.equal(pc.bit_wise_and(t["oid"], 1), 0)
            return pa.table({"vid": t["vid"],
                             "label": pc.if_else(even, "even", "odd")})

        verts = g2.idmap.map_batches(lab, batch_format="pyarrow")
        ctx = Context(g2, comp, vertices=verts)
        out = (ctx.select({"id": "v:even.id", "comp": "r:even"})
               .sort("id").materialize())
    finally:
        g2.close()
    return out


# pg_labeled_app twin: the pg_wcc unroll with e0 restricted to
# even-even endpoint pairs (the label projection)
_EVEN_PRELUDE = _PRELUDE.replace(
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey",
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey\n"
    "         AND a.l_partkey % 2 = 0 AND b.l_partkey % 2 = 0")
_LABELED_APP_SQL = f"""
WITH RECURSIVE {_EVEN_PRELUDE},
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
)
SELECT v AS id, min(l) AS comp FROM r GROUP BY v ORDER BY id
"""


def _labeled_select_sql(rounds: int, delta: float) -> str:
    base = _pagerank_sql(rounds, delta)
    # same unroll, restricted to the 'even' label (oid parity)
    return base.replace(
        "SELECT v AS vid, round(r, 6) AS rank FROM",
        "SELECT v AS id, round(r, 6) AS rank FROM").replace(
        f"ORDER BY vid",
        f"WHERE v % 2 = 0 ORDER BY id")


def _round_col(ds, col, nd=6):
    from graphscope_ray.util import round_half_away

    def f(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(col)
        return t.set_column(
            i, col, pa.array(round_half_away(t[col].to_numpy(), nd)))

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


def _q_pg_pagerank_pregel(sf_dir):
    """The reference's SECOND in-repo PageRank — the Pregel variant
    (apps/pregel/pagerank_pregel.h:43-94: textbook
    value = δ·Σmsgs + (1−δ)/N, NO dangling redistribution) — run
    through the vectorized VertexProgram surface over the DIRECTED
    co-occurrence graph (src < dst), where dangling sinks exist and
    the two semantics genuinely differ (SURVEY §2.2; the symmetrized
    pg_pagerank graph has no dangling vertices, so only this row
    separates them). Transient single-consumer pool."""
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.graph.program import PageRankProgram
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    edges = partgraph_edges(sf_dir).select_columns(["src", "dst"])
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-pregelpr-{abs(hash(sf_dir)) % 10**8}",
    )
    try:
        out = g.engine.run_program(PageRankProgram(DELTA),
                                   max_round=PR_PREGEL_ROUNDS)
        return _round_col(g.to_oid(out), "rank").materialize()
    finally:
        g.close()


def _q_pg_sssp_pregel(sf_dir):
    """The reference's SECOND SSSP — the Pregel variant
    (apps/pregel/sssp_pregel.h:46-85: min over messages, send
    dist + edge weight) — run through the vectorized VertexProgram
    surface with use_weight scatter on the shared weighted partgraph.
    Converged distances equal pg_sssp's relaxation kernel bit-for-bit
    (both are the Bellman-Ford fixpoint over identical doubles), so the
    oracle is the same unrolled CTE."""
    from graphscope_ray.graph.program import SSSPPregelProgram

    g, _ = _partgraph(sf_dir)
    src_vid = 0  # dense rank of the smallest oid (assign_dense_ids)
    out = g.engine.run_program(SSSPPregelProgram(src_vid),
                               max_round=SSSP_ROUNDS, stop_when_zero=True)

    def fin(t: pa.Table) -> pa.Table:
        from graphscope_ray.util import round_half_away
        d = t["dist"].to_numpy()
        keep = np.isfinite(d)
        return pa.table({"vid": t["vid"].to_numpy()[keep],
                         "dist": round_half_away(d[keep], 6)})

    return g.to_oid(out).map_batches(fin, batch_format="pyarrow")


def _pregel_pagerank_sql(rounds: int, delta: float) -> str:
    """Unrolled twin of _q_pg_pagerank_pregel: directed edges only,
    dangling out-mass simply lost (pagerank_pregel.h semantics)."""
    pre = """
occ AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ed AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
       FROM occ a JOIN occ b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
vd AS MATERIALIZED (SELECT DISTINCT v FROM
      (SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)),
odeg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS d
      FROM ed GROUP BY src),
nd AS MATERIALIZED (SELECT count(*) AS c FROM vd)"""
    parts = [f"WITH {pre},",
             "p0 AS MATERIALIZED (SELECT vd.v, "
             "1.0 / (SELECT c FROM nd) AS r FROM vd)"]
    for k in range(1, rounds + 1):
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT vd.v,
         {delta} * COALESCE(m.s, 0) + {1 - delta} / (SELECT c FROM nd) AS r
  FROM vd LEFT JOIN (
    SELECT ed.dst AS v, sum(p{k-1}.r / odeg.d) AS s
    FROM ed JOIN p{k-1} ON p{k-1}.v = ed.src
            JOIN odeg ON odeg.v = ed.src
    GROUP BY ed.dst) m ON m.v = vd.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(r, 6) AS rank FROM p{rounds} "
            f"ORDER BY vid")


def _q_pg_ppr(sf_dir):
    """Personalized PageRank (4 rounds) from the 3 smallest vertices —
    the seed-restart variant of the pr superstep loop."""
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    g, edges = _partgraph(sf_dir)
    seeds = [r["vid"] for r in
             partgraph_vertices(edges).sort("vid").limit(3).take_all()]
    pr = g.ppr(seeds, delta=DELTA, max_round=4)
    return _round_col(g.to_oid(pr), "rank")


def _q_pg_closeness(sf_dir):
    """Landmark closeness from the 3 smallest vertices — one
    multi-source BFS sweep + a per-partition vectorized reduce; the
    (V × k) distance matrix never leaves its owners."""
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    g, edges = _partgraph(sf_dir)
    lms = [r["vid"] for r in
           partgraph_vertices(edges).sort("vid").limit(3).take_all()]
    res = g.closeness_landmarks(lms, unit=True)
    return g.to_oid(res)


def _closeness_sql(rounds: int, n_landmarks: int = 3) -> str:
    """Unrolled twin of _q_pg_closeness: multi-source unit BFS from
    the n smallest vertices carried as (landmark, v, d) rows; the
    closeness division is the same integer pair on both sides, so 6dp
    rounding is exact."""
    parts = [f"WITH {_PRELUDE},",
             f"lm AS MATERIALIZED (SELECT v AS l FROM v "
             f"ORDER BY v LIMIT {n_landmarks})",
             "b0 AS MATERIALIZED (SELECT lm.l, v.v, "
             "CASE WHEN v.v = lm.l THEN 0.0 END AS d "
             "FROM lm CROSS JOIN v)"]
    for r in range(1, rounds + 1):
        parts.append(f"""b{r} AS MATERIALIZED (
  SELECT a.l, a.v,
         CASE WHEN m.md IS NULL THEN a.d
              WHEN a.d IS NULL OR m.md < a.d THEN m.md
              ELSE a.d END AS d
  FROM b{r-1} a LEFT JOIN (
    SELECT p.l, e.t AS v, min(p.d + 1.0) AS md
    FROM e JOIN b{r-1} p ON p.v = e.s WHERE p.d IS NOT NULL
    GROUP BY p.l, e.t) m ON m.l = a.l AND m.v = a.v)""")
    parts.append(f"""agg AS (
  SELECT v, count(d)::BIGINT AS reached,
         COALESCE(sum(d), 0.0) AS dist_sum
  FROM b{rounds} GROUP BY v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, reached, round(dist_sum, 6) AS dist_sum,\n"
            f"  round(CASE WHEN dist_sum > 0 THEN reached / dist_sum\n"
            f"        ELSE 0.0 END, 6) AS closeness\n"
            f"FROM agg ORDER BY vid")


def _q_pg_harmonic(sf_dir):
    """Landmark harmonic centrality from the 3 smallest vertices —
    the same multi-source BFS sweep as pg_closeness with the Σ 1/d
    reduce (Boldi & Vigna 2014; unreachable landmarks contribute 0)."""
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    g, edges = _partgraph(sf_dir)
    lms = [r["vid"] for r in
           partgraph_vertices(edges).sort("vid").limit(3).take_all()]
    res = g.harmonic_landmarks(lms, unit=True)
    return g.to_oid(res)


def _harmonic_sql(rounds: int, n_landmarks: int = 3) -> str:
    """Twin of _q_pg_harmonic: the _closeness_sql BFS chain with the
    harmonic (Σ 1/d over d > 0) final aggregate."""
    base = _closeness_sql(rounds, n_landmarks)
    head, _, _ = base.partition("agg AS (")
    return (head
            + "agg AS (\n"
            + "  SELECT v, count(CASE WHEN d > 0 THEN 1 END)::BIGINT"
            + " AS reached,\n"
            + "         COALESCE(sum(CASE WHEN d > 0 THEN 1.0 / d END),"
            + " 0.0) AS hs\n"
            + f"  FROM b{rounds} GROUP BY v)\n"
            + "SELECT v AS vid, reached, round(hs, 6) AS harmonic\n"
            + "FROM agg ORDER BY vid")


MIS_SEED = 7
MIS_ROUNDS = 24  # Luby join+remove iterations unrolled in the twin;
#                  expected O(log V) ≈ 11 at sf0.01 — margin asserted
#                  by the twin's final == penultimate fixpoint check


def _q_pg_mis(sf_dir):
    """Maximal independent set (Luby 1986) through the user-level
    VertexProgram surface: deterministic fmix64 priorities, alternating
    join/remove supersteps on the min-combiner. The twin unrolls the
    same iterations over row_number()-dense vids."""
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.mis(seed=MIS_SEED))


def _mis_sql(rounds: int, seed: int) -> str:
    from graphscope_ray.oracle_sql import fmix_u64_sql
    pri = fmix_u64_sql(f"xor(vid::UBIGINT, {seed}::UBIGINT)")
    parts = [f"WITH {_PRELUDE},",
             "vr AS MATERIALIZED (SELECT v, row_number() "
             "OVER (ORDER BY v) - 1 AS vid FROM v)",
             f"st0 AS MATERIALIZED (SELECT v, "
             f"(({pri}) >> 11)::DOUBLE AS pri, 0 AS st FROM vr)"]
    for r in range(1, rounds + 1):
        parts.append(f"""m{r} AS MATERIALIZED (
  SELECT e.t AS v, max(p.pri) AS mx
  FROM e JOIN st{r-1} p ON p.v = e.s AND p.st = 0 GROUP BY e.t)""")
        parts.append(f"""j{r} AS MATERIALIZED (
  SELECT s.v FROM st{r-1} s LEFT JOIN m{r} ON m{r}.v = s.v
  WHERE s.st = 0 AND s.pri > COALESCE(m{r}.mx, -1.0))""")
        parts.append(f"""r{r} AS MATERIALIZED (
  SELECT DISTINCT e.t AS v FROM e JOIN j{r} ON j{r}.v = e.s)""")
        parts.append(f"""st{r} AS MATERIALIZED (
  SELECT s.v, s.pri, CASE WHEN s.st <> 0 THEN s.st
    WHEN j.v IS NOT NULL THEN 1
    WHEN rr.v IS NOT NULL THEN 2 ELSE 0 END AS st
  FROM st{r-1} s LEFT JOIN j{r} j ON j.v = s.v
  LEFT JOIN r{r} rr ON rr.v = s.v)""")
    body = ",\n".join(parts[1:])
    # fixpoint margin: the unroll must have converged (no undecided)
    return (f"{parts[0]}\n{body},\n"
            f"chk AS (SELECT count(*) AS c FROM st{rounds} WHERE st = 0)\n"
            f"SELECT v AS vid, st::BIGINT AS status FROM st{rounds}\n"
            f"WHERE (SELECT c FROM chk) = 0 ORDER BY vid")


BETWEENNESS_DEPTH = 6  # sf0.01 source eccentricity = 3; margin asserted


def _q_pg_betweenness(sf_dir):
    """Sampled Brandes betweenness from the 2 smallest vertices —
    forward multi-source BFS with path counts, then level-descending
    dependency back-propagation on the superstep exchange."""
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    g, edges = _partgraph(sf_dir)
    srcs = [r["vid"] for r in
            partgraph_vertices(edges).sort("vid").limit(2).take_all()]
    return _round_col(g.to_oid(g.betweenness_sources(srcs)),
                      "betweenness")


def _betweenness_sql(depth: int = BETWEENNESS_DEPTH,
                     n_sources: int = 2) -> str:
    """Unrolled twin of _q_pg_betweenness: forward BFS levels + sigma
    per (source, vertex), then delta back-propagation from the depth
    bound down; sigma values are exact integers in double on both
    sides, delta is 6dp-rounded at the end (pagerank protocol)."""
    parts = [f"WITH {_PRELUDE},",
             f"lm AS MATERIALIZED (SELECT v AS l FROM v "
             f"ORDER BY v LIMIT {n_sources})",
             "f0 AS MATERIALIZED (SELECT lm.l, v.v, "
             "CASE WHEN v.v = lm.l THEN 0 END AS lvl, "
             "CASE WHEN v.v = lm.l THEN 1.0 ELSE 0.0 END AS sig "
             "FROM lm CROSS JOIN v)"]
    for r in range(1, depth + 1):
        parts.append(f"""f{r} AS MATERIALIZED (
  SELECT a.l, a.v,
    CASE WHEN a.lvl IS NOT NULL THEN a.lvl
         WHEN m.s IS NOT NULL THEN {r} END AS lvl,
    CASE WHEN a.lvl IS NULL AND m.s IS NOT NULL THEN m.s
         ELSE a.sig END AS sig
  FROM f{r-1} a LEFT JOIN (
    SELECT p.l, e.t AS v, sum(p.sig) AS s
    FROM e JOIN f{r-1} p ON p.v = e.s WHERE p.lvl = {r-1}
    GROUP BY p.l, e.t) m ON m.l = a.l AND m.v = a.v)""")
    parts.append(f"b{depth} AS MATERIALIZED "
                 f"(SELECT l, v, lvl, sig, 0.0 AS delta FROM f{depth})")
    for lv in range(depth, 0, -1):
        parts.append(f"""b{lv-1} AS MATERIALIZED (
  SELECT a.l, a.v, a.lvl, a.sig,
    a.delta + CASE WHEN a.lvl = {lv-1} AND m.s IS NOT NULL
                   THEN m.s * a.sig ELSE 0.0 END AS delta
  FROM b{lv} a LEFT JOIN (
    SELECT p.l, e.t AS v, sum((1.0 + p.delta) / p.sig) AS s
    FROM e JOIN b{lv} p ON p.v = e.s WHERE p.lvl = {lv}
    GROUP BY p.l, e.t) m ON m.l = a.l AND m.v = a.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(sum(CASE WHEN v = l THEN 0.0 "
            f"ELSE delta END), 6) AS betweenness\n"
            f"FROM b0 GROUP BY v ORDER BY vid")


def _q_pg_wcc(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.wcc(), vid_cols=("vid", "comp"))


def _q_pg_nx_wcc(sf_dir):
    """NetworkX-facade bridge row: the same partgraph components
    computed through graphscope_ray.nx (facade Graph → distributed
    engine → networkx-typed component sets), proving the NX emulation
    layer (reference python/graphscope/nx/algorithms/builtin.py:719)
    against the same DuckDB twin as pg_wcc."""
    import pandas as pd

    import graphscope_ray.nx as gnx

    _, edges = _partgraph(sf_dir)
    G = gnx.Graph()
    for t in edges.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow"):
        G.add_edges_from(zip(t["src"].to_numpy().tolist(),
                             t["dst"].to_numpy().tolist()))
    try:
        rows = []
        for comp in gnx.connected_components(G):
            c = min(comp)
            rows.extend((n, c) for n in comp)
    finally:
        G.close()
    rows.sort()
    return pd.DataFrame(rows, columns=["vid", "comp"])


def _q_pg_cdlp(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.cdlp(max_round=CDLP_ROUNDS), vid_cols=("vid", "label"))


def _q_pg_bfs(sf_dir):
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]  # min oid (oid_array is sorted)
    ds = g.to_oid(g.bfs(src, max_iter=BFS_CAP))

    def reachable(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["depth"], 0))

    return ds.map_batches(reachable, batch_format="pyarrow")


def _triangles_cached(sf_dir):
    key = sf_dir + "#tri"
    if key not in _CACHE:
        # partition-local actor path (no driver edge materialization);
        # the store is symmetrized so undirected degrees are resident
        g, _ = _partgraph(sf_dir)
        _CACHE[key] = g.to_oid(g.triangles()).materialize()
    return _CACHE[key]


def _q_pg_triangles(sf_dir):
    return _triangles_cached(sf_dir)


def _q_pg_tc_pregel(sf_dir):
    """The reference's THIRD triangle app — the Pregel message
    formulation (apps/pregel/tc_pregel.h:40-80): v sends id(b) per
    out-edge (v,b) to each distinct neighbor c ∈ in∪out; c counts
    payloads that are its own out-neighbors; value = counter // 2.
    Run over the SYMMETRIC partgraph edge set (both directions
    distinct — the app's intended input; on oriented edges it
    degenerates, see tests/test_tc_pregel.py), where it reproduces
    per-vertex triangle counts through entirely different machinery
    than pg_triangles' oriented wedge kernel. The SQL twin replays
    the two supersteps as two joins, not the triangle CTE."""
    from graphscope_ray.graph.api import tc_pregel
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    e0 = partgraph_edges(sf_dir).select_columns(["src", "dst"])

    def both(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([t["src"].combine_chunks(),
                                     t["dst"].combine_chunks()]),
            "dst": pa.concat_arrays([t["dst"].combine_chunks(),
                                     t["src"].combine_chunks()])})

    sym = e0.map_batches(both, batch_format="pyarrow")
    return tc_pregel(sym).sort("vid")


_TC_PREGEL_SQL = """
msg AS (SELECT u.t AS c, o.t AS b FROM e u JOIN e o ON o.s = u.s),
tcc AS (SELECT m.c AS v, count(*) AS cntr
        FROM msg m JOIN e oc ON oc.s = m.c AND oc.t = m.b
        GROUP BY m.c)"""


SCC_KEEP_PCT = 3  # hash-oriented subsample density for the SCC row


def _q_pg_scc(sf_dir):
    """Strongly connected components (extension op — the reference
    exposes SCC via its NetworkX layer,
    python/graphscope/nx/algorithms/builtin.py) — FW-BW-Trim coloring
    on the BSP actors over a deterministic hash-ORIENTED 3% sample of
    the co-occurrence pairs (the canonical src<dst orientation is a
    DAG of singleton SCCs; hash-parity orientation creates real
    cycles). Transient dual-direction store, closed in finally."""
    from graphscope_ray.data.hashing import B, U64, fmix64
    from graphscope_ray.graph.api import Graph

    _, edges = _partgraph(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        h = fmix64(s.astype(np.uint64) * B + d.astype(np.uint64))
        keep = (h % U64(100)) < U64(SCC_KEEP_PCT)
        s, d, h = s[keep], d[keep], h[keep]
        fwd = ((h >> U64(7)) % U64(2)) == 0
        return pa.table({"src": pa.array(np.where(fwd, s, d)),
                         "dst": pa.array(np.where(fwd, d, s))})

    de = edges.select_columns(["src", "dst"]).map_batches(
        orient, batch_format="pyarrow")
    g = Graph.from_edges(
        de, workdir=f"/tmp/gsr-scc-{abs(hash(sf_dir)) % 10**8}",
        directions="both")
    try:
        return (g.to_oid(g.scc(), vid_cols=("vid", "scc_id"))
                .sort("vid").materialize())
    finally:
        g.close()


def _scc_sql(pct: int) -> str:
    """Recursive-closure twin of _q_pg_scc: scc_id(v) = min u with
    v →* u and u →* v inside the hash-oriented subgraph."""
    from graphscope_ray.oracle_sql import fmix_u64_sql
    from graphscope_ray.data.hashing import B
    h = fmix_u64_sql(f"((src::HUGEINT * {int(B)} + dst) % 18446744073709551616)::UBIGINT")
    return f"""
WITH RECURSIVE {_PRELUDE},
eh AS (SELECT src, dst, {h} AS h FROM e0),
de AS MATERIALIZED (
  SELECT CASE WHEN (h >> 7) % 2 = 0 THEN src ELSE dst END AS src,
         CASE WHEN (h >> 7) % 2 = 0 THEN dst ELSE src END AS dst
  FROM eh WHERE h % 100 < {pct}),
reach AS (SELECT src AS a, src AS b FROM de
          UNION SELECT dst, dst FROM de
          UNION SELECT r.a, de.dst FROM reach r JOIN de ON de.src = r.b),
scc AS (SELECT r1.a AS vid, min(r1.b)::BIGINT AS scc_id
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
        GROUP BY r1.a)
SELECT vid, scc_id FROM scc ORDER BY vid"""


def _q_pg_tc_total(sf_dir):
    import pandas as pd
    t = int(_triangles_cached(sf_dir).sum("tri_cnt")) // 3
    return pd.DataFrame({"total": np.array([t], dtype=np.int64)})


def _q_pg_link_features(sf_dir):
    """Per-edge link-prediction features (common neighbors +
    neighborhood Jaccard) — wedge expansion bucketed by center,
    in-bucket semi-join onto the edge set."""
    from graphscope_ray.graph.api import edge_link_features
    _, edges = _partgraph(sf_dir)
    return edge_link_features(edges.select_columns(["src", "dst"]))


def _q_pg_squares(sf_dir):
    """Total 4-cycle count (squares = ½ Σ C(λ(u,v), 2) over
    co-neighbor counts) — the cohesion motif after triangles; one
    bucket shuffle + one bucketed λ-sum + a scalar fold."""
    from graphscope_ray.graph.api import square_count
    _, edges = _partgraph(sf_dir)
    return square_count(edges.select_columns(["src", "dst"]))


_SQUARES_SQL = f"""
WITH {_PRELUDE},
w AS MATERIALIZED (
  SELECT e1.t AS u, e2.t AS v
  FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.t < e2.t),
lam AS MATERIALIZED (
  SELECT u, v, count(*)::HUGEINT AS l FROM w GROUP BY u, v)
SELECT (sum((l * (l - 1)) // 2) // 2)::BIGINT AS squares FROM lam"""


def _q_pg_modularity(sf_dir):
    """Newman modularity of the CDLP-5 labeling — the community
    certificate metric: exact int64 sums (2m, intra-edges, per-label
    degree totals) and one final float expression, bit-exact vs the
    SQL twin."""
    from graphscope_ray.graph.api import modularity
    g, edges = _partgraph(sf_dir)
    labels = g.to_oid(g.cdlp(max_round=CDLP_ROUNDS),
                      vid_cols=("vid", "label")).materialize()
    return modularity(edges.select_columns(["src", "dst"]), labels,
                      label_count=g.store.num_vertices)


def _modularity_sql(rounds: int) -> str:
    """Twin of _q_pg_modularity: the CDLP label chain, then the same
    integer sums and the identical final float expression."""
    base = _cdlp_sql(rounds)
    head, _, _ = base.rpartition("SELECT v AS vid")
    return f"""{head}
, el AS MATERIALIZED (
  SELECT a.lab AS ls, b.lab AS ld
  FROM e JOIN l{rounds} a ON a.v = e.s JOIN l{rounds} b ON b.v = e.t),
m2 AS (SELECT count(*)::HUGEINT AS m2 FROM el),
si AS (SELECT count(*)::HUGEINT AS sin FROM el WHERE ls = ld),
tot AS (SELECT a.lab, count(*)::HUGEINT AS t
        FROM e JOIN l{rounds} a ON a.v = e.s GROUP BY a.lab),
st AS (SELECT sum(t * t)::HUGEINT AS stot2 FROM tot)
SELECT ((m2.m2 * si.sin - st.stot2)::DOUBLE)
       / ((m2.m2)::DOUBLE * (m2.m2)::DOUBLE) AS modularity
FROM m2, si, st"""


def _q_pg_nearest_seed(sf_dir):
    """Nearest-seed assignment (multi-source BFS Voronoi) from the 5
    smallest vertices — the seeded-propagation primitive, written
    entirely on the user vertex-program surface (one packed float of
    state, min-combine). Unreachable vertices are excluded on both
    sides."""
    import pandas as pd
    from graphscope_ray.graph.program import NearestSeedProgram
    g, _ = _partgraph(sf_dir)
    V = g.store.num_vertices
    prog = NearestSeedProgram(np.arange(5), np.arange(5, dtype=float),
                              scale=float(V))
    ds = g.engine.run_program(prog, max_round=BFS_CAP,
                              stop_when_zero=True)

    def dec(t: pa.Table) -> pa.Table:
        p = t["packed"].to_numpy()
        ok = np.isfinite(p)
        return pa.table({
            "vid": t["vid"].to_numpy()[ok],
            "dist": (p[ok] // V).astype(np.int64),
            "seed": (p[ok] % V).astype(np.int64)})

    return g.to_oid(ds.map_batches(dec, batch_format="pyarrow"),
                    vid_cols=("vid", "seed"))


# seed anchor via row_number, NOT a LIMIT CTE: DuckDB 1.0 can drop
# rows of an ORDER BY+LIMIT CTE referenced from a recursive anchor
# (repro: tools — a VALUES-backed seed table is unaffected)
_NEAREST_SEED_SQL = f"""
WITH RECURSIVE {_PRELUDE},
sd AS MATERIALIZED (SELECT v FROM (
  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v) WHERE rn <= 5),
ns AS (
  SELECT v, 0 AS d, v AS seed FROM sd
  UNION
  SELECT e.t, ns.d + 1, ns.seed FROM ns JOIN e ON e.s = ns.v
  WHERE ns.d < {BFS_CAP})
SELECT v AS vid, d::BIGINT AS dist, seed FROM (
  SELECT v, d, seed,
         row_number() OVER (PARTITION BY v ORDER BY d, seed) AS rn
  FROM ns) WHERE rn = 1 ORDER BY vid"""


def _q_events_attribution(sf_dir):
    """Conversion attribution (first/last touch in a 7-day lookback)
    — one bucket shuffle by user, fused per-key time axes, two global
    searchsorteds; no per-key Python."""
    from graphscope_ray.data.temporal import attribute_conversions
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    return attribute_conversions(events)


_ATTRIBUTION_SQL = """
WITH t AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type IN ('click', 'view')),
c AS (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'),
j AS (SELECT c.event_id AS conv_id, c.user_id, c.value,
             t.event_id AS tid, t.ts AS tts
      FROM c JOIN t ON t.user_id = c.user_id AND t.ts <= c.ts
        AND t.ts >= c.ts - INTERVAL 7 DAY),
r AS (SELECT conv_id, user_id, value,
        first_value(tid) OVER (PARTITION BY conv_id
            ORDER BY tts, tid) AS first_touch_id,
        last_value(tid) OVER (PARTITION BY conv_id
            ORDER BY tts, tid ROWS BETWEEN UNBOUNDED PRECEDING
            AND UNBOUNDED FOLLOWING) AS last_touch_id,
        row_number() OVER (PARTITION BY conv_id) AS rn
      FROM j)
SELECT conv_id, user_id, first_touch_id, last_touch_id, value
FROM r WHERE rn = 1 ORDER BY conv_id"""


def _q_pg_pseudo_diameter(sf_dir):
    """Pseudo-diameter by the classic double BFS sweep (the
    pivot-based lower bound used by graph partitioners): BFS from the
    min-oid vertex, re-BFS from the farthest reached vertex (tie →
    min oid), report (pivot, max depth). Two engine BFS runs + two
    tiny Dataset reduces — nothing O(V) on the driver."""
    import pandas as pd
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]
    d1 = g.to_oid(g.bfs(src, max_iter=BFS_CAP))
    far = d1.filter(expr="depth >= 0").sort(
        ["depth", "vid"], descending=[True, False]).limit(1).take_all()
    pivot = int(far[0]["vid"])
    d2 = g.to_oid(g.bfs(pivot, max_iter=BFS_CAP)).filter(
        expr="depth >= 0")
    return pd.DataFrame({"pivot": [pivot],
                         "pseudo_diameter": [int(d2.max("depth"))]})


_PSEUDO_DIAMETER_SQL = f"""
WITH RECURSIVE {_PRELUDE},
b1 AS (
  SELECT (SELECT min(v) FROM v) AS v, 0 AS d
  UNION
  SELECT e.t, b1.d + 1 FROM b1 JOIN e ON e.s = b1.v
  WHERE b1.d < {BFS_CAP}),
d1 AS (SELECT v, min(d) AS d FROM b1 GROUP BY v),
far AS (SELECT v FROM d1 ORDER BY d DESC, v LIMIT 1),
b2 AS (
  SELECT (SELECT v FROM far) AS v, 0 AS d
  UNION
  SELECT e.t, b2.d + 1 FROM b2 JOIN e ON e.s = b2.v
  WHERE b2.d < {BFS_CAP}),
d2 AS (SELECT v, min(d) AS d FROM b2 GROUP BY v)
SELECT (SELECT v FROM far)::BIGINT AS pivot,
       max(d)::BIGINT AS pseudo_diameter
FROM d2"""


def _q_pg_coarsen(sf_dir):
    """One multilevel-coarsening step (Karypis-Kumar shape): contract
    the locally-dominant matching (super = min of each matched pair),
    drop self-loops, merge parallel edges with summed weights — all
    broadcast-or-join attaches + one bucketed sum; the raw edge table
    shuffles once."""
    from graphscope_ray.graph.api import contract_edges
    g, edges = _partgraph(sf_dir)
    mapping = g.to_oid(g.coarsen_mapping(),
                       vid_cols=("vid", "super")).materialize()
    return contract_edges(edges.select_columns(["src", "dst", "weight"]),
                          mapping, map_count=g.store.num_vertices)


def _coarsen_sql(rounds: int = 24) -> str:
    """Twin of _q_pg_coarsen: the _matching_sql CTE chain, then
    relabel endpoints by super = matched-pair min (else self),
    drop loops, sum weights per coarse pair."""
    base = _matching_sql(rounds)
    head, _, _ = base.rpartition("SELECT a AS src")
    return f"""{head}
, vmap AS MATERIALIZED (
  SELECT v.v, COALESCE(mm.a, v.v) AS super
  FROM v LEFT JOIN (SELECT a, a AS m FROM m{rounds}
                    UNION ALL SELECT b, a FROM m{rounds}) mm(x, a)
         ON mm.x = v.v)
SELECT least(ms.super, md.super) AS src,
       greatest(ms.super, md.super) AS dst,
       sum(e0.w)::DOUBLE AS weight
FROM e0 JOIN vmap ms ON ms.v = e0.src
        JOIN vmap md ON md.v = e0.dst
WHERE ms.super <> md.super
GROUP BY 1, 2 ORDER BY src, dst"""


def _q_pg_node2vec(sf_dir):
    """node2vec second-order biased walks (Grover & Leskovec 2016)
    from the 3 smallest vertices — deterministic Efraimidis-Spirakis
    argmax over the shared walk_hash family, α ∈ {1/p, 1, 1/q} with
    p=2, q=1/2 (exact power-of-two scaling), replayed bit-for-bit by
    the unrolled SQL twin."""
    from graphscope_ray.graph.node2vec import node2vec_walks
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    _, edges = _partgraph(sf_dir)
    seeds = [r["vid"] for r in
             partgraph_vertices(edges).sort("vid").limit(3).take_all()]
    return node2vec_walks(edges.select_columns(["src", "dst"]), seeds,
                          length=4, p=2.0, q=0.5, seed=7)


def _node2vec_sql(length: int = 4, seed: int = 7, p: float = 2.0,
                  q: float = 0.5) -> str:
    """Unrolled twin of _q_pg_node2vec: per hop, candidates = N(cur),
    α by the same CASE order (first-step uniform, return 1/p,
    triangle-closing 1, else 1/q), ES key = round(ln(u)/α, 9) from
    walk_hash(cand, walk_id, hop, seed), argmax by (es DESC, cand)."""
    from graphscope_ray.oracle_sql import walk_hash_sql
    inv_p, inv_q = 1.0 / p, 1.0 / q
    parts = [f"WITH {_PRELUDE},"]
    # row_number, not a LIMIT CTE: DuckDB 1.0 can drop rows of an
    # ORDER BY+LIMIT CTE referenced from a recursive anchor — wk0 is
    # not recursive itself, but keep one safe shape everywhere
    parts.append("sd AS MATERIALIZED (SELECT v FROM (SELECT v, "
                 "row_number() OVER (ORDER BY v) AS rn FROM v) "
                 "WHERE rn <= 3)")
    parts.append("""wk0 AS MATERIALIZED (
  SELECT (row_number() OVER (ORDER BY v) - 1)::BIGINT AS walk_id,
         CAST(NULL AS BIGINT) AS prev, v AS cur FROM sd)""")
    outs = ["SELECT walk_id, 0::BIGINT AS hop, cur AS vid FROM wk0"]
    for r in range(1, length + 1):
        h = walk_hash_sql("c.cand", "c.walk_id", r, seed)
        parts.append(f"""cd{r} AS MATERIALIZED (
  SELECT w.walk_id, w.prev, w.cur, e.t AS cand
  FROM wk{r - 1} w JOIN e ON e.s = w.cur)""")
        parts.append(f"""sc{r} AS MATERIALIZED (
  SELECT c.walk_id, c.cur, c.cand,
    round(ln(greatest((({h}) >> 11)::DOUBLE * pow(2.0, -53),
                      pow(2.0, -53)))
          / (CASE WHEN c.prev IS NULL THEN 1.0
                  WHEN c.cand = c.prev THEN {inv_p}
                  WHEN EXISTS (SELECT 1 FROM e e2
                               WHERE e2.s = c.prev AND e2.t = c.cand)
                    THEN 1.0
                  ELSE {inv_q} END), 9) AS es
  FROM cd{r} c)""")
        parts.append(f"""wk{r} AS MATERIALIZED (
  SELECT walk_id, cur AS prev, cand AS cur FROM (
    SELECT walk_id, cur, cand,
           row_number() OVER (PARTITION BY walk_id
                              ORDER BY es DESC, cand) AS rn
    FROM sc{r}) WHERE rn = 1)""")
        outs.append(f"SELECT walk_id, {r}::BIGINT AS hop, cur AS vid "
                    f"FROM wk{r}")
    body = ",\n".join(parts[1:])
    union = "\nUNION ALL\n".join(outs)
    return (f"{parts[0]}\n{body}\nSELECT walk_id, hop, vid FROM "
            f"({union}) ORDER BY walk_id, hop")


def _q_pg_assortativity(sf_dir):
    """Newman degree assortativity (extension op — reference exposes
    it via NetworkX): exact int64 endpoint-degree sums folded through
    one small reduce; the final float expression is identical on both
    sides, so the compare is bit-exact."""
    from graphscope_ray.graph import api
    _, edges = _partgraph(sf_dir)
    return api.degree_assortativity(edges.select_columns(["src", "dst"]))


_ASSORT_SQL = """
WITH {prelude},
d AS MATERIALIZED (SELECT s AS v, count(*)::BIGINT AS dg
                   FROM e GROUP BY s),
j AS MATERIALIZED (SELECT da.dg AS x, db.dg AS y
  FROM e JOIN d da ON da.v = e.s JOIN d db ON db.v = e.t),
sm AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
              sum(y)::HUGEINT AS sy, sum(x * y)::HUGEINT AS sxy,
              sum(x * x)::HUGEINT AS sxx, sum(y * y)::HUGEINT AS syy
       FROM j)
SELECT round(((n * sxy - sx * sy)::DOUBLE)
             / (sqrt((n * sxx - sx * sx)::DOUBLE)
                * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
       AS assortativity
FROM sm"""


def _q_pg_matching(sf_dir):
    """Greedy maximal matching (extension op — the reference exposes
    matching via its NetworkX layer,
    python/graphscope/nx/algorithms/builtin.py): locally-dominant
    edges under the total order (w, min(u,v), max(u,v)) on the BSP
    actors. The fixpoint equals the sequential greedy matching, so
    the result is unique; dense vids are sorted-oid ranks, so the SQL
    twin ranks edges on raw partkeys."""
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.matching(), vid_cols=("src", "dst"))


def _matching_sql(rounds: int = 24) -> str:
    """Unrolled locally-dominant-matching twin of _q_pg_matching: per
    round, each alive vertex's min incident alive-alive edge by
    (w, fmix64(pack(ra, rb)), a, b) via row_number (ra/rb = dense
    sorted-oid ranks = the engine's vids), mutual pairs marry, their
    endpoints leave the alive set. Extra rounds past convergence are
    no-ops (no alive-alive edges → no proposals)."""
    from graphscope_ray.oracle_sql import fmix_u64_sql
    h = fmix_u64_sql(
        "(va.r * 4294967296::UBIGINT + vb.r)::UBIGINT")
    parts = [f"WITH {_PRELUDE},"]
    parts.append("vr AS MATERIALIZED (SELECT v, (row_number() "
                 "OVER (ORDER BY v) - 1)::UBIGINT AS r FROM v)")
    parts.append(f"""eh AS MATERIALIZED (
  SELECT e.s, e.t, e.w, least(e.s, e.t) AS a, greatest(e.s, e.t) AS b,
         {h} AS h
  FROM e JOIN vr va ON va.v = least(e.s, e.t)
         JOIN vr vb ON vb.v = greatest(e.s, e.t))""")
    parts.append("a0 AS MATERIALIZED (SELECT v FROM v)")
    parts.append("m0 AS MATERIALIZED (SELECT src AS a, dst AS b, w "
                 "FROM e0 WHERE FALSE)")
    for r in range(rounds):
        parts.append(f"""pr{r} AS MATERIALIZED (
  SELECT u, x, w, a, b FROM (
    SELECT e.s AS u, e.t AS x, e.w, e.a, e.b,
           row_number() OVER (PARTITION BY e.s
               ORDER BY e.w, e.h, e.a, e.b) AS rn
    FROM eh e JOIN a{r} x1 ON x1.v = e.s
              JOIN a{r} x2 ON x2.v = e.t)
  WHERE rn = 1)""")
        parts.append(f"""mm{r} AS MATERIALIZED (
  SELECT p1.a, p1.b, p1.w FROM pr{r} p1 JOIN pr{r} p2
    ON p1.x = p2.u AND p2.x = p1.u AND p1.u < p1.x)""")
        parts.append(f"""m{r + 1} AS MATERIALIZED (
  SELECT a, b, w FROM m{r} UNION ALL SELECT a, b, w FROM mm{r})""")
        parts.append(f"""a{r + 1} AS MATERIALIZED (
  SELECT v FROM a{r} WHERE v NOT IN (SELECT a FROM mm{r})
                       AND v NOT IN (SELECT b FROM mm{r}))""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT a AS src, b AS dst, w::DOUBLE AS weight "
            f"FROM m{rounds} ORDER BY src, dst")


def _q_pg_msf(sf_dir):
    """Minimum spanning forest (extension op — the reference exposes
    MST via its NetworkX layer,
    python/graphscope/nx/algorithms/builtin.py): distributed Boruvka
    on the BSP actors over the weighted co-occurrence partgraph.
    Deterministic: the forest is THE unique MSF under the total edge
    order (w, min(u,v), max(u,v)); dense vids are sorted-oid ranks, so
    vid-order comparisons equal oid-order comparisons and the SQL twin
    can rank edges on raw partkeys."""
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.msf(), vid_cols=("src", "dst"))


def _msf_sql(rounds: int = 12) -> str:
    """Unrolled-Boruvka twin of _q_pg_msf: per round, component labels
    of the forest-so-far via the min-label recursive flood (the
    _WCC_SQL kernel over forest edges), per-component min cross edge
    by (w, a, b), forest += chosen edges (UNION dedups the mutual
    pair's edge). Components at least halve per round, so
    rounds=12 ≥ ceil(log2 V) at sf0.01 covers convergence; extra
    rounds are no-ops."""
    parts = [f"WITH RECURSIVE {_PRELUDE},"]
    parts.append("f0 AS MATERIALIZED (SELECT src AS a, dst AS b, w "
                 "FROM e0 WHERE FALSE)")
    for r in range(rounds):
        parts.append(f"""fe{r} AS MATERIALIZED (
  SELECT a AS s, b AS t FROM f{r} UNION ALL SELECT b, a FROM f{r})""")
        parts.append(f"""lab{r} AS (
  SELECT v AS x, v AS l FROM v
  UNION
  SELECT fe{r}.t, lab{r}.l FROM lab{r} JOIN fe{r} ON fe{r}.s = lab{r}.x
  WHERE lab{r}.l < fe{r}.t)""")
        parts.append(f"""clab{r} AS MATERIALIZED (
  SELECT x AS v, min(l) AS c FROM lab{r} GROUP BY x)""")
        parts.append(f"""ac{r} AS MATERIALIZED (
  SELECT ca.c AS comp, e0.w, e0.src AS a, e0.dst AS b
  FROM e0 JOIN clab{r} ca ON ca.v = e0.src
          JOIN clab{r} cb ON cb.v = e0.dst
  WHERE ca.c <> cb.c
  UNION ALL
  SELECT cb.c, e0.w, e0.src, e0.dst
  FROM e0 JOIN clab{r} ca ON ca.v = e0.src
          JOIN clab{r} cb ON cb.v = e0.dst
  WHERE ca.c <> cb.c)""")
        parts.append(f"""wn{r} AS MATERIALIZED (
  SELECT comp, w, a, b FROM (
    SELECT comp, w, a, b,
           row_number() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn
    FROM ac{r}) WHERE rn = 1)""")
        # explicit DISTINCT: under WITH RECURSIVE, DuckDB 1.0 does NOT
        # dedup a plain UNION inside non-self-referencing CTEs
        parts.append(f"""f{r + 1} AS MATERIALIZED (
  SELECT DISTINCT a, b, w FROM (
    SELECT a, b, w FROM f{r}
    UNION ALL SELECT a, b, w FROM wn{r}))""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT a AS src, b AS dst, w::DOUBLE AS weight "
            f"FROM f{rounds} ORDER BY src, dst")


def _q_pg_feature_prop(sf_dir):
    """2-round GNN feature smoothing (self-loop neighborhood mean,
    weighted) over the symmetric partgraph with deterministic seed
    features f0 = oid%7, f1 = oid%11 — each round is one SpMV
    (np.add.at combiner + bucketed_sum) and two joins."""
    from graphscope_ray.graph.api import feature_propagate

    _, edges = _partgraph(sf_dir)

    def both_dirs(t: pa.Table) -> pa.Table:
        import pyarrow as _pa
        return _pa.table({
            "src": _pa.concat_arrays([t["src"].combine_chunks(),
                                      t["dst"].combine_chunks()]),
            "dst": _pa.concat_arrays([t["dst"].combine_chunks(),
                                      t["src"].combine_chunks()]),
            "weight": _pa.concat_arrays([t["weight"].combine_chunks()] * 2),
        })

    # partgraph edges are unique src<dst pairs, so both directions are
    # distinct — the weighted symmetric table needs no dedup
    und = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    from graphscope_ray.util import bucketed_distinct
    verts = bucketed_distinct(
        und.select_columns(["src"]).map_batches(
            lambda t: pa.table({"vid": t["src"]}), batch_format="pyarrow"),
        "vid")

    def feats(t: pa.Table) -> pa.Table:
        v = t["vid"].to_numpy()
        return pa.table({"vid": t["vid"],
                         "f0": pa.array((v % 7).astype(np.float64)),
                         "f1": pa.array((v % 11).astype(np.float64))})

    x0 = verts.map_batches(feats, batch_format="pyarrow")
    return feature_propagate(und, x0, feat_cols=["f0", "f1"], rounds=2,
                             weight_col="weight")


def _feature_prop_sql(rounds: int = 2) -> str:
    """Unrolled twin of _q_pg_feature_prop over the shared partgraph
    prelude: per round, (x + Σ w·x_nbr) / (1 + Σ w); final 6dp round
    (the pagerank protocol — intermediates full precision)."""
    parts = [f"WITH {_PRELUDE},",
             "wd AS MATERIALIZED (SELECT t AS v, sum(w)::DOUBLE AS wd "
             "FROM e GROUP BY t)",
             "x0 AS MATERIALIZED (SELECT v.v, (v.v % 7)::DOUBLE AS f0, "
             "(v.v % 11)::DOUBLE AS f1 FROM v)"]
    for k in range(1, rounds + 1):
        parts.append(f"""x{k} AS MATERIALIZED (
  SELECT v.v,
    (x.f0 + COALESCE(m.s0, 0)) / (1 + COALESCE(wd.wd, 0)) AS f0,
    (x.f1 + COALESCE(m.s1, 0)) / (1 + COALESCE(wd.wd, 0)) AS f1
  FROM v JOIN x{k-1} x ON x.v = v.v
  LEFT JOIN (SELECT e.t AS v, sum(e.w * p.f0) AS s0,
                    sum(e.w * p.f1) AS s1
             FROM e JOIN x{k-1} p ON p.v = e.s GROUP BY e.t) m
    ON m.v = v.v
  LEFT JOIN wd ON wd.v = v.v)""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT v AS vid, round(f0, 6) AS f0, round(f1, 6) AS f1 "
            f"FROM x{rounds} ORDER BY vid")


KTRUSS_K = 5
KTRUSS_ROUNDS = 6  # sf0.01 fixpoint = 3 peels; margin asserted in tests


def _q_pg_ktruss(sf_dir):
    """Edges of the 5-truss (support-peeling to fixpoint on the
    oriented wedge kernel; only a COUNT scalar reaches the driver per
    round)."""
    from graphscope_ray.graph.api import ktruss
    _, edges = _partgraph(sf_dir)
    return ktruss(edges.select_columns(["src", "dst"]), KTRUSS_K)


def _ktruss_sql(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    """Unrolled twin of _q_pg_ktruss: per round, common-neighbor
    support within the SURVIVING subgraph via the wedge pair-join;
    edges sharing no neighbor drop through the inner join (support 0 <
    k−2 for k ≥ 3)."""
    parts = [f"WITH {_PRELUDE},",
             "t0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"y{r - 1} AS MATERIALIZED (SELECT a AS s, b AS t FROM t{r - 1} "
            f"UNION ALL SELECT b, a FROM t{r - 1})")
        parts.append(f"""t{r} AS MATERIALIZED (
  SELECT t.a, t.b FROM t{r - 1} t JOIN (
    SELECT p.t AS x, q.t AS y, count(*) AS c
    FROM y{r - 1} p JOIN y{r - 1} q ON p.s = q.s AND p.t < q.t
    GROUP BY p.t, q.t) c ON c.x = t.a AND c.y = t.b
  WHERE c.c >= {k - 2})""")
    body = ",\n".join(parts[1:])
    return (f"{parts[0]}\n{body}\n"
            f"SELECT a AS src, b AS dst FROM t{rounds} ORDER BY src, dst")


def _q_pg_khop(sf_dir):
    """Deterministic 2-hop fanout-3 neighbor sampling (GNN mini-batch
    shape) from the 3 smallest vertices — walk_hash family replayed in
    SQL."""
    from graphscope_ray.graph.api import khop_sample
    from graphscope_ray.pipelines.partgraph import partgraph_vertices
    _, edges = _partgraph(sf_dir)
    seeds = [r["vid"] for r in
             partgraph_vertices(edges).sort("vid").limit(3).take_all()]
    return khop_sample(edges.select_columns(["src", "dst"]), seeds,
                       hops=2, fanout=3, seed=5)


def _khop_sql(hops: int = 2, fanout: int = 3, seed: int = 5,
              n_seeds: int = 3) -> str:
    from graphscope_ray.oracle_sql import walk_hash_sql
    ctes = [f"f0 AS (SELECT v FROM v ORDER BY v LIMIT {n_seeds})"]
    sels = []
    for h in range(1, hops + 1):
        ctes.append(f"""h{h} AS (
  SELECT e.s AS src, e.t AS dst,
         {walk_hash_sql('e.t', 'e.s', h, seed)} AS sc
  FROM e JOIN f{h-1} f ON f.v = e.s),
s{h} AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src ORDER BY sc, dst) AS rn FROM h{h})
  WHERE rn <= {fanout}),
f{h} AS (SELECT DISTINCT dst AS v FROM s{h})""")
        sels.append(f"SELECT {h}::BIGINT AS hop, src, dst FROM s{h}")
    return (f"WITH {_PRELUDE},{','.join(ctes)}\n"
            + "\nUNION ALL ".join(sels) + "\nORDER BY hop, src, dst")


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
        from graphscope_ray.util import round_half_away
        return pa.table({"vid": t["vid"],
                         "clustering": pa.array(round_half_away(c, 6))})

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
    from graphscope_ray.util import round_half_away
    return pd.DataFrame({"transitivity": [float(round_half_away(t, 6))]})


def _q_pg_avg_clustering(sf_dir):
    import pandas as pd
    from graphscope_ray.util import round_half_away
    # Dataset.mean: distributed reduce — the per-vertex clustering
    # table never lands on the driver (r02 VERDICT #5)
    m = _q_pg_clustering(sf_dir).mean("clustering")
    return pd.DataFrame({"avg_clustering": [
        float(round_half_away(float(m), 6))]})


def _q_pg_bfs_tree(sf_dir):
    """BFS tree predecessors (bfs_generic 'predecessors' format):
    deterministic min-predecessor tie-break makes this SQL-checkable."""
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]
    ds = g.engine.bfs_generic(g.vid_of_oid(src),
                              output_format="predecessors",
                              depth_limit=BFS_CAP)
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
        from graphscope_ray.util import round_half_away
        d = t["dist"].to_numpy()
        keep = np.isfinite(d)
        return pa.table({"vid": t["vid"].to_numpy()[keep],
                         "dist": round_half_away(d[keep], 6)})

    return ds.map_batches(fin, batch_format="pyarrow")


AVGLEN_SOURCES = 8  # first k vids = k smallest oids (deterministic)


def _q_pg_sssp_path(sf_dir):
    """SSSP with predecessors — apps/sssp/sssp_path.h:172. The engine's
    min-parent tie-break makes the converged pred exactly
    argmin-min{s : d(s)+w = d(v)}, which _sssp_path_sql replays."""
    g, _ = _partgraph(sf_dir)
    src = g.oid_array[0]
    ds = g.sssp_path(src)

    def fin(t: pa.Table) -> pa.Table:
        from graphscope_ray.util import round_half_away
        d = t["dist"].to_numpy()
        keep = np.isfinite(d)
        return pa.table({"vid": t["vid"].to_numpy()[keep],
                         "dist": round_half_away(d[keep], 6),
                         "pred": t["pred"].to_numpy()[keep]})

    return g.to_oid(ds.map_batches(fin, batch_format="pyarrow"),
                    vid_cols=("vid", "pred"))


def _q_pg_sssp_has_path(sf_dir):
    """Reachability min-oid → max-oid — apps/sssp/sssp_has_path.h:157."""
    import pandas as pd
    g, _ = _partgraph(sf_dir)
    src, tgt = g.oid_array[0], g.oid_array[-1]
    return pd.DataFrame({"has_path": [bool(g.sssp_has_path(src, tgt))]})


def _q_pg_sssp_avg_len(sf_dir):
    """Mean weighted shortest-path length over the first
    AVGLEN_SOURCES sources × all reachable targets, self-pairs
    excluded — apps/sssp/sssp_average_length.h:251 (its deterministic
    subsample mode)."""
    import pandas as pd
    from graphscope_ray.util import round_half_away
    g, _ = _partgraph(sf_dir)
    val = g.sssp_average_length(batch_k=AVGLEN_SOURCES,
                                max_sources=AVGLEN_SOURCES)
    return pd.DataFrame({"avg_length": [float(round_half_away(val, 6))]})


def _q_pg_kcore(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.kcore(3))


def _q_pg_kshell(sf_dir):
    g, _ = _partgraph(sf_dir)
    return g.to_oid(g.kshell(3))


def _q_pg_eigenvector(sf_dir):
    # fixed-round mode (tol=0 → exactly EIG_ROUNDS rounds) so the
    # unrolled SQL oracle replays it; bench keeps the tol mode
    g, _ = _partgraph(sf_dir)
    out = g.engine.eigenvector_centrality(tol=0.0, max_round=EIG_ROUNDS)
    return _round_col(g.to_oid(out), "centrality")


def _q_pg_katz(sf_dir):
    g, _ = _partgraph(sf_dir)
    out = g.engine.katz_centrality(alpha=KATZ_ALPHA, beta=KATZ_BETA,
                                   tol=0.0, max_round=KATZ_ROUNDS)
    return _round_col(g.to_oid(out), "centrality")


def _q_pg_hits(sf_dir):
    from graphscope_ray.graph.api import Graph, to_undirected
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    # undirected semantics: the digraph contains BOTH orientations of
    # every co-occurrence edge, and the dual store additionally tags
    # reversals so HITS's two phases each see the full neighborhood.
    # Transient pool (see _mutgraph's pool-budget note).
    _, edges = _partgraph(sf_dir)  # materialized, shared
    g = Graph.from_edges(
        to_undirected(edges.select_columns(["src", "dst"])),
        workdir=f"/tmp/gsr-hits-{abs(hash(sf_dir)) % 10**8}",
        directions="both",
    )
    try:
        out = g.engine.hits(tolerance=0.0, max_round=HITS_ROUNDS)
        ds = g.to_oid(out)
        ds = _round_col(ds, "auth")
        return _round_col(ds, "hub").materialize()
    finally:
        g.close()


def _q_pg_louvain_sweep(sf_dir):
    """ONE level-0 local-moving sweep (both parity phases) of the
    deterministic Louvain on the resident actors — the kernel of
    pg_louvain with an exact SQL twin (integer co-occurrence weights
    make every distributed sum exact, so the modularity-gain doubles
    are bit-identical to DuckDB's)."""
    import pandas as pd
    from graphscope_ray.graph.louvain import _level0_bsp
    g, _ = _partgraph(sf_dir)
    comm, _k, _m, _moved = _level0_bsp(g.engine, max_sweeps=1)
    oids = g.oid_array
    return pd.DataFrame({"vid": oids, "community": oids[comm]})


def _louvain_sweep_sql() -> str:
    """SQL twin of one _one_level sweep: two sequential synchronous
    parity phases from the singleton state. Formula order mirrors the
    numpy kernel exactly (FP products are left-associative on both
    sides); all sums are of integer-valued doubles, hence exact."""
    parts = [f"""WITH {_PRELUDE},
vr AS MATERIALIZED (
  SELECT v, (row_number() OVER (ORDER BY v) - 1) % 2 AS par FROM v),
kw AS MATERIALIZED (
  SELECT s AS v, sum(w)::DOUBLE AS k FROM e GROUP BY s),
mm AS MATERIALIZED (SELECT sum(w) / 2.0 AS m FROM e),
c0 AS MATERIALIZED (SELECT v, v AS comm FROM v)"""]
    for i, par in ((0, 0), (1, 1)):
        j = i + 1
        parts.append(f"""tot{i} AS MATERIALIZED (
  SELECT c.comm AS c, sum(kw.k) AS tot
  FROM c{i} c JOIN kw ON kw.v = c.v GROUP BY c.comm),
cand{i} AS MATERIALIZED (
  SELECT e.t AS v, c.comm AS cc, sum(e.w)::DOUBLE AS kvc
  FROM e JOIN c{i} c ON c.v = e.s GROUP BY e.t, c.comm),
score{i} AS MATERIALIZED (
  SELECT cand.v, cand.cc,
         cand.kvc / m.m - kw.k *
           (tot.tot - CASE WHEN cand.cc = cv.comm THEN kw.k ELSE 0 END)
           / (2 * m.m * m.m) AS score
  FROM cand{i} cand
  JOIN kw ON kw.v = cand.v
  JOIN c{i} cv ON cv.v = cand.v
  JOIN tot{i} tot ON tot.c = cand.cc
  CROSS JOIN mm m),
best{i} AS MATERIALIZED (
  SELECT v, cc, score FROM (
    SELECT *, row_number() OVER (PARTITION BY v
                                 ORDER BY score DESC, cc ASC) AS rn
    FROM score{i}) WHERE rn = 1),
stay{i} AS MATERIALIZED (
  SELECT b.v,
         COALESCE(s.score,
                  -kw.k * (tot.tot - kw.k) / (2 * m.m * m.m)) AS stay
  FROM best{i} b
  JOIN c{i} cv ON cv.v = b.v
  JOIN kw ON kw.v = b.v
  JOIN tot{i} tot ON tot.c = cv.comm
  LEFT JOIN score{i} s ON s.v = b.v AND s.cc = cv.comm
  CROSS JOIN mm m),
c{j} AS MATERIALIZED (
  SELECT cv.v,
         CASE WHEN vr.par = {par} AND b.score > st.stay + 1e-12
                   AND b.cc <> cv.comm
              THEN b.cc ELSE cv.comm END AS comm
  FROM c{i} cv
  JOIN vr ON vr.v = cv.v
  LEFT JOIN best{i} b ON b.v = cv.v
  LEFT JOIN stay{i} st ON st.v = cv.v)""")
    body = ",\n".join(parts)
    return f"{body}\nSELECT v AS vid, comm AS community FROM c2 ORDER BY vid"


LOUVAIN_LEVELS = 4  # unrolled levels; engine converges by level 3 at
#                     the sf0.01 gate (level 4 pads idempotently)
LOUVAIN_SWEEPS = 4  # MUST equal the max_sweeps the driver query passes:
#                     capped levels depend on the cap, so the SQL runs
#                     it exactly (early-converged levels pad
#                     idempotently). The driver row pins a smaller cap
#                     than louvain()'s default 10 purely to keep the
#                     unrolled twin's CTE count plannable (DuckDB's
#                     optimizer goes superlinear past ~300 CTEs); the
#                     default-cap run is covered by the driver-vs-engine
#                     parity fuzz (tools/fuzz2.py) instead.


def _louvain_full_sql(levels: int, sweeps: int) -> str:
    """Full multi-level Louvain twin of _q_pg_louvain (r02 VERDICT #3).

    Exactness argument: co-occurrence weights are integers, so every
    distributed/SQL sum (k, tot, kvc, contracted w) is exact; the gain
    formula is written in the same FP operation order as the numpy
    kernel (louvain._one_level) and the BSP actors, so scores are
    bit-identical and the (score DESC, cc ASC) tie-break plus the
    1e-12 move threshold decide identically. A level that converges
    before ``sweeps`` sweeps is idempotent under further sweeps, and a
    converged state is idempotent under further levels, so the fixed
    unroll equals the engine's early-breaking loop as long as the
    engine used <= ``levels`` levels and its cap equals ``sweeps``
    (asserted in tests/test_entry_contract.py)."""
    p = [f"""WITH {_PRELUDE},
vm AS MATERIALIZED (
  SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM v),
g0 AS MATERIALIZED (
  SELECT a.r AS s, b.r AS t, e.w::DOUBLE AS w FROM e
  JOIN vm a ON a.v = e.s JOIN vm b ON b.v = e.t),
mm AS MATERIALIZED (SELECT sum(w) / 2.0 AS m FROM g0),
a0 AS MATERIALIZED (SELECT r AS orig, r AS nid FROM vm)"""]
    for lv in range(levels):
        p.append(f"""kw{lv} AS MATERIALIZED (
  SELECT s AS v, sum(w) AS k FROM g{lv} GROUP BY s),
c{lv}x0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS comm FROM g{lv})""")
        for t in range(2 * sweeps):
            phase = t % 2
            p.append(f"""tot{lv}x{t} AS MATERIALIZED (
  SELECT c.comm AS c, sum(kw.k) AS tot
  FROM c{lv}x{t} c JOIN kw{lv} kw ON kw.v = c.v GROUP BY c.comm),
cand{lv}x{t} AS MATERIALIZED (
  SELECT g.t AS v, c.comm AS cc, sum(g.w) AS kvc
  FROM g{lv} g JOIN c{lv}x{t} c ON c.v = g.s
  WHERE g.s <> g.t GROUP BY g.t, c.comm),
score{lv}x{t} AS MATERIALIZED (
  SELECT cand.v, cand.cc,
         cand.kvc / m.m - kw.k *
           (tot.tot - CASE WHEN cand.cc = cv.comm THEN kw.k ELSE 0 END)
           / (2 * m.m * m.m) AS score
  FROM cand{lv}x{t} cand
  JOIN kw{lv} kw ON kw.v = cand.v
  JOIN c{lv}x{t} cv ON cv.v = cand.v
  JOIN tot{lv}x{t} tot ON tot.c = cand.cc
  CROSS JOIN mm m),
best{lv}x{t} AS MATERIALIZED (
  SELECT v, cc, score FROM (
    SELECT *, row_number() OVER (PARTITION BY v
                                 ORDER BY score DESC, cc ASC) AS rn
    FROM score{lv}x{t}) WHERE rn = 1),
stay{lv}x{t} AS MATERIALIZED (
  SELECT b.v,
         COALESCE(s.score,
                  -kw.k * (tot.tot - kw.k) / (2 * m.m * m.m)) AS stay
  FROM best{lv}x{t} b
  JOIN c{lv}x{t} cv ON cv.v = b.v
  JOIN kw{lv} kw ON kw.v = b.v
  JOIN tot{lv}x{t} tot ON tot.c = cv.comm
  LEFT JOIN score{lv}x{t} s ON s.v = b.v AND s.cc = cv.comm
  CROSS JOIN mm m),
c{lv}x{t + 1} AS MATERIALIZED (
  SELECT cv.v,
         CASE WHEN cv.v % 2 = {phase} AND b.score > st.stay + 1e-12
                   AND b.cc <> cv.comm
              THEN b.cc ELSE cv.comm END AS comm
  FROM c{lv}x{t} cv
  LEFT JOIN best{lv}x{t} b ON b.v = cv.v
  LEFT JOIN stay{lv}x{t} st ON st.v = cv.v)""")
        T = 2 * sweeps
        p.append(f"""u{lv} AS MATERIALIZED (
  SELECT comm, row_number() OVER (ORDER BY comm) - 1 AS nid
  FROM (SELECT DISTINCT comm FROM c{lv}x{T})),
map{lv} AS MATERIALIZED (
  SELECT c.v, u.nid FROM c{lv}x{T} c JOIN u{lv} u ON u.comm = c.comm),
g{lv + 1} AS MATERIALIZED (
  SELECT ma.nid AS s, mb.nid AS t, sum(g.w) AS w
  FROM g{lv} g JOIN map{lv} ma ON ma.v = g.s
               JOIN map{lv} mb ON mb.v = g.t GROUP BY 1, 2),
a{lv + 1} AS MATERIALIZED (
  SELECT a.orig, mp.nid FROM a{lv} a JOIN map{lv} mp ON mp.v = a.nid)""")
    return (",\n".join(p) + f"""
SELECT vo.v AS vid, lo.lab AS community
FROM a{levels} a JOIN vm vo ON vo.r = a.orig
JOIN (SELECT a2.nid, min(vm3.v) AS lab
      FROM a{levels} a2 JOIN vm vm3 ON vm3.r = a2.orig
      GROUP BY a2.nid) lo ON lo.nid = a.nid
ORDER BY vid""")


def _q_pg_louvain(sf_dir):
    import pandas as pd
    from graphscope_ray.graph.louvain import louvain
    g, edges = _partgraph(sf_dir)
    # full multi-level run on the resident actors (identical labels:
    # integer weights make the distributed sums exact); max_sweeps is
    # pinned to the SQL twin's unroll (see LOUVAIN_SWEEPS) — capped
    # levels depend on the cap, so both sides must run the same one
    vids, labels, q = louvain(edges, weight_col="weight", engine=g.engine,
                              max_sweeps=LOUVAIN_SWEEPS)
    oids = g.oid_array
    return pd.DataFrame({"vid": oids[vids], "community": oids[labels]})


SAMPLE_ROOTS = 3
SAMPLE_LEN = 4
SAMPLE_SEED = 11


def _q_pg_sampling(sf_dir):
    """Deterministic path sampling (apps/sampling_path) on the resident
    actors — partition-walk variant; roots = 3 smallest oids (vids
    0..2 under dense rank ids)."""
    g, _ = _partgraph(sf_dir)
    out = g.engine.sampling_path(range(SAMPLE_ROOTS), length=SAMPLE_LEN,
                                 seed=SAMPLE_SEED)
    return g.to_oid(out)


def _sampling_sql(n_roots: int, length: int, seed: int) -> str:
    """The engine hashes DENSE vids (rank of oid), so the SQL maps oids
    to ranks first, walks in rank space, and maps back for output."""
    parts = [f"WITH {_PRELUDE},"]
    parts.append("""vm AS MATERIALIZED (
  SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM v),
ev AS MATERIALIZED (
  SELECT a.r AS s, b.r AS t FROM e
  JOIN vm a ON a.v = e.s JOIN vm b ON b.v = e.t)""")
    parts.append(f"""p0 AS MATERIALIZED (
  SELECT r AS path_id, r AS vid FROM vm WHERE r < {n_roots})""")
    for hop in range(1, length + 1):
        h = _osql().walk_hash_sql("cand", "path_id", hop, seed)
        parts.append(f"""p{hop} AS MATERIALIZED (
  SELECT path_id, cand AS vid FROM (
    SELECT p.path_id, ev.t AS cand,
           row_number() OVER (PARTITION BY p.path_id
                              ORDER BY {h}, ev.t) AS rn
    FROM p{hop-1} p JOIN ev ON ev.s = p.vid) WHERE rn = 1)""")
    body = ",\n".join(parts[1:])
    selects = "\nUNION ALL ".join(
        f"SELECT path_id, {hop}::BIGINT AS hop, vid FROM p{hop}"
        for hop in range(0, length + 1))
    return (f"{parts[0]}\n{body}\n"
            f"SELECT u.path_id, u.hop, vm.v AS vid\n"
            f"FROM ({selects}) u JOIN vm ON vm.r = u.vid\n"
            f"ORDER BY path_id, hop")


def _q_pg_dfs(sf_dir):
    """DFS preorder ranks from the min-oid source over the symmetric
    partgraph — api.dfs (sequential, like the reference's token walk)."""
    from graphscope_ray.graph import api
    from graphscope_ray.graph.api import to_undirected
    _, edges = _partgraph(sf_dir)
    und = to_undirected(edges.select_columns(["src", "dst"]))
    src = int(und.min("src"))
    return api.dfs(und, src, output_format="ranks")


_DFS_SQL = f"""
WITH RECURSIVE {_PRELUDE},
walk AS (
  SELECT [ (SELECT min(v) FROM v) ] AS stack,
         [ (SELECT min(v) FROM v) ] AS pre,
         0 AS done
  UNION ALL
  SELECT CASE WHEN nxt IS NULL THEN stack[1:len(stack)-1]
              ELSE list_append(stack, nxt) END,
         CASE WHEN nxt IS NULL THEN pre ELSE list_append(pre, nxt) END,
         CASE WHEN nxt IS NULL AND len(stack) = 1 THEN 1 ELSE 0 END
  FROM (
    SELECT stack, pre, done,
      (SELECT min(e.t) FROM e WHERE e.s = stack[len(stack)]
        AND NOT list_contains(pre, e.t)) AS nxt
    FROM walk WHERE done = 0)
)
SELECT u.vid, u.ord - 1 AS rank
FROM (SELECT unnest(pre) AS vid,
             generate_subscripts(pre, 1) AS ord
      FROM walk WHERE done = 1) u
ORDER BY rank"""


def _q_pg_lpa(sf_dir):
    """True LPA-U2I (apps/lpa/lpa_u2i.h) on the customer→part bipartite
    graph; see graphscope_ray.graph.lpa."""
    from ray.data.aggregate import Sum
    from graphscope_ray.graph.joins import attach_values
    from graphscope_ray.graph.lpa import lpa_u2i

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    e = attach_values(li, orders, on="l_orderkey",
                      table_key="o_orderkey", value_names=["o_custkey"])

    def pairs(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy().astype(np.int64)
        i = t["l_partkey"].to_numpy().astype(np.int64)
        key = (u << np.int64(32)) | i  # custkey/partkey < 2^31
        k, c = np.unique(key, return_counts=True)
        return pa.table({"k": k, "_c": c.astype(np.int64)})

    agg = (e.map_batches(pairs, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("_c", alias_name="w")))

    def unpack(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        return pa.table({"src": pa.array(k >> np.int64(32)),
                         "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                         "weight": pa.array(t["w"].to_numpy()
                                            .astype(np.float64))})

    edges = agg.map_batches(unpack, batch_format="pyarrow").materialize()
    users = np.unique(np.concatenate(
        [t["src"].to_numpy() for t in
         edges.select_columns(["src"]).iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.int64)]))
    uref = ray.put(users)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def lab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        us = ray.get(uref)
        ck = t["c_custkey"].to_numpy()
        pos = np.clip(np.searchsorted(us, ck), 0, max(0, len(us) - 1))
        keep = us[pos] == ck if len(us) else np.zeros(len(ck), bool)
        t = t.filter(pa.array(keep))
        seg = t["c_mktsegment"]
        p0 = np.where(pc.equal(seg, "BUILDING").to_numpy(False), 1.0,
                      np.where(pc.equal(seg, "AUTOMOBILE").to_numpy(False),
                               0.0, 0.5))
        p1 = t["c_acctbal"].to_numpy().astype(np.float64) / 20000.0
        return pa.table({"vid": t["c_custkey"], "p0": pa.array(p0),
                         "p1": pa.array(p1)})

    labels = cust.map_batches(lab, batch_format="pyarrow")
    out = lpa_u2i(edges, labels, prop_cols=["p0", "p1"],
                  max_round=LPA_ROUNDS)
    return _round_col(_round_col(out, "p0"), "p1")


def _q_media_pipeline(sf_dir):
    """Multimodal stage chain over deterministic synthetic media (the
    driver tables carry no binary column): BMP resize (real NN
    resample) → real BMP/WAV decode → feature extraction on an actor
    pool. The feature vectors are exploded to (media_id, dim, feat)
    scalar rows and hash-compared against an expectation REGENERATED
    at check time by the INDEPENDENT struct-based oracle
    (graphscope_ray.oracle.media_pipeline_expected — no committed
    artifact, r03 VERDICT #5); kernel correctness is additionally
    pinned by tests/test_codecs.py."""
    from graphscope_ray.data.multimodal import (image_resize,
                                                media_features,
                                                synth_media)
    ds = ray.data.from_arrow(synth_media(n=96, seed=5))
    out = media_features(image_resize(ds, out_w=8, out_h=8),
                         decode="real", feat_dim=8)

    def explode(t: pa.Table) -> pa.Table:
        from graphscope_ray.util import round_half_away
        mids, kinds, nbytes, dims, feats = [], [], [], [], []
        for mid, kind, feat, nb in zip(
                t["media_id"].to_pylist(), t["kind"].to_pylist(),
                t["feature"].to_pylist(), t["payload_bytes"].to_pylist()):
            for d, f in enumerate(feat):
                mids.append(mid)
                kinds.append(kind)
                nbytes.append(nb)
                dims.append(d)
                feats.append(f)
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload_bytes": pa.array(nbytes, pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "feat": pa.array(round_half_away(
                np.asarray(feats, dtype=np.float64), 6)),
        })

    return out.map_batches(explode, batch_format="pyarrow")


def _q_media_frames(sf_dir):
    """REAL video frame sampling (r03 VERDICT #8): the synthetic AVIs
    are decoded (pure-numpy RIFF/DIB walk), the frame nearest each
    500 ms timestamp is re-encoded as BMP, and the row reports the
    frame bytes' sha256 — hash-compared against an expectation
    REGENERATED at check time by the independent struct-based oracle
    (graphscope_ray.oracle.frame_sample_expected: struct RIFF walk +
    struct BMP writer, no shared codec code)."""
    import hashlib

    from graphscope_ray.data.multimodal import frame_sample, synth_media
    ds = ray.data.from_arrow(synth_media(n=96, seed=5))
    frames = frame_sample(ds, every_ms=500)

    def digest(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "ts_ms": t["ts_ms"],
            "frame_sha256": pa.array(
                [hashlib.sha256(f).hexdigest()
                 for f in t["frame"].to_pylist()], pa.string()),
        })

    return frames.map_batches(
        digest, batch_format="pyarrow").sort(["media_id", "ts_ms"])


def _media_frames_expectation_path() -> str:
    """Like :func:`_media_expectation_path`, for the frame-sampling
    row (always regenerated)."""
    import os

    from graphscope_ray.data.multimodal import synth_media
    from graphscope_ray.oracle import frame_sample_expected

    path = "/tmp/graphscope_ray_media_frames_expected.parquet"
    df = frame_sample_expected(synth_media(n=96, seed=5), every_ms=500)
    tmp = f"{path}.{os.getpid()}.tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


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


def _q_doc_curation(sf_dir):
    """Composed curation pipeline (pipelines/curation.py): one fused
    pass gating language + quality, then digest-bucket exact dedup of
    the survivors — the read happens once, rejected rows never reach
    a shuffle."""
    from graphscope_ray.pipelines.curation import curate
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return curate(docs, lang="en", min_quality=0.1)


def _q_doc_fingerprint(sf_dir):
    from graphscope_ray.data import fingerprint
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return fingerprint(docs)


def _q_doc_span_dedup(sf_dir):
    """Cross-document duplicated 8-token span counts (token-level
    exact-substring dedup signal, Lee et al. 2022 shape) — only
    (doc_id, span-hash) pairs shuffle; see data/dedup.duplicated_spans."""
    from graphscope_ray.data.dedup import duplicated_spans
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return duplicated_spans(docs, k=8)


def _q_doc_sample(sf_dir):
    """Deterministic 25% Bernoulli sample — fmix64 row coin, no
    shuffle, reproducible at any parallelism (data/curate.py)."""
    from graphscope_ray.data.curate import hash_sample
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    return hash_sample(docs, 0.25, seed=1)


def _q_doc_weighted_sample(sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys from the fmix64 row coin) — 100 docs drawn
    proportional to n_chars; deterministic at any parallelism
    (data/curate.weighted_sample)."""
    from graphscope_ray.data.curate import weighted_sample
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    return weighted_sample(docs, 100, weight_col="n_chars", seed=13)


def _weighted_sample_sql(k: int, seed: int = 13) -> str:
    from graphscope_ray.oracle_sql import _row_hash_sql
    h = _row_hash_sql(seed)
    u = f"greatest((({h}) >> 11)::DOUBLE * pow(2.0, -53), pow(2.0, -53))"
    return f"""
WITH scored AS (
  SELECT doc_id, n_chars::DOUBLE AS n_chars,
         round(ln({u}) / n_chars::DOUBLE, 9) AS es_key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, n_chars, es_key,
       row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn
FROM scored QUALIFY rn <= {k} ORDER BY doc_id"""


_MIX_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.1, "src3": 0.0}


def _q_doc_domain_mix(sf_dir):
    """Deterministic per-source downsampling to a target mixture — no
    shuffle, resumable (data/curate.domain_mixture)."""
    from graphscope_ray.data.curate import domain_mixture
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    return domain_mixture(docs, _MIX_RATES, default_rate=0.75, seed=5)


def _q_doc_order(sf_dir):
    """Deterministic global training-order shuffle: distributed
    range-sort on a per-key fmix64 stamp (data/curate.training_order)."""
    from graphscope_ray.data.curate import training_order
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return training_order(docs, seed=11)


def _q_doc_tfidf(sf_dir):
    """Sparse hashed TF-IDF rows: slot = fmix64(poly(token)) % dim,
    smooth idf, 6-dp half-away tfidf (data/text.tfidf_rows; the dense
    variant tfidf_vectors feeds knn_graph/ann_topk — see
    tests/test_tfidf.py)."""
    from graphscope_ray.data.text import tfidf_rows
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return tfidf_rows(docs, dim=128)


def _q_doc_topk_source(sf_dir):
    """Stratified per-domain selection: top-3 docs per source by
    quality (curate.topk_per_group — per-block trim combiner + one
    coarse-bucket exchange; twin: row_number() window)."""
    from graphscope_ray.data.text import quality_score
    from graphscope_ray.data.curate import topk_per_group
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    q = quality_score(docs, keep=("source",))
    return topk_per_group(q, group="source", score="quality",
                          key="doc_id", k=3)


def _q_doc_profile(sf_dir):
    """Corpus profile of the per-doc token count: exact count / min /
    max / 6-dp mean / exact discrete quantiles (data/profile
    .column_profile — per-batch moment combiner + sorted
    order-statistic block fetch; twin: quantile_disc)."""
    from graphscope_ray.data.text import token_count
    from graphscope_ray.data.profile import column_profile
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return column_profile(token_count(docs), "n_tokens")


def _q_doc_split(sf_dir):
    from graphscope_ray.data.curate import split_assign
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return split_assign(docs, seed=7)


def _q_doc_split_stratified(sf_dir):
    """Per-domain EXACT-fraction split (stratified sibling of
    doc_split's global coin): within each source, docs ranked by the
    shared fmix64 row hash carve train/val/test to ±1 doc per group —
    the domain-balanced carve a mixture pipeline needs. Engine side is
    the coarse-bucket multi-group rank kernel; the twin replays the
    identical hash + ceil arithmetic in a row_number window."""
    from graphscope_ray.data.curate import stratified_split
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    return stratified_split(docs, group="source", seed=7).sort("doc_id")


def _q_doc_normalize(sf_dir):
    from graphscope_ray.data.curate import normalize_text
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return normalize_text(docs)


def _q_doc_pii(sf_dir):
    from graphscope_ray.data.curate import pii_scrub
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return pii_scrub(docs)


def _q_doc_repetition(sf_dir):
    from graphscope_ray.data.curate import repetition_stats
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return repetition_stats(docs)


def _q_doc_vocab(sf_dir):
    """Global top-100 vocabulary — per-batch value_counts combiner,
    then a distinct-token groupby (never O(total tokens) shuffled)."""
    from graphscope_ray.data.curate import vocab_topk
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return vocab_topk(docs, k=100)


def _q_doc_bm25(sf_dir):
    """BM25 retrieval scores for a fixed 3-term query — one KB-scale
    stats fold (N, avgdl, per-term df) + a stateless vectorized
    scoring pass; per-(doc, term) scores are integer-1e-6 units so
    the per-doc sum is order-independent (bit-exact vs the SQL twin,
    which sums in arbitrary order)."""
    from graphscope_ray.data.text import bm25_scores
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return bm25_scores(docs, ["join", "hash", "vector"])


def _bm25_sql(terms, k1: float = 1.2, b: float = 0.75) -> str:
    """Twin of data/text.bm25_scores: identical arithmetic
    left-to-right (idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))), per-term
    round to integer 1e-6 units, integer per-doc sum."""
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH tok AS MATERIALIZED (SELECT doc_id,
        unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents),
dl AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS dl
      FROM tok GROUP BY doc_id),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
tt AS (SELECT count(*)::BIGINT AS total FROM tok),
dfq AS MATERIALIZED (SELECT t, count(DISTINCT doc_id)::BIGINT AS df
      FROM tok WHERE t IN ({tl}) GROUP BY t),
tf AS MATERIALIZED (SELECT doc_id, t, count(*)::BIGINT AS tf
      FROM tok WHERE t IN ({tl}) GROUP BY doc_id, t),
term AS (SELECT tf.doc_id,
    CAST(round(ln(1.0 + (nn.n - dfq.df + 0.5) / (dfq.df + 0.5))
          * tf.tf * ({k1} + 1.0)
          / (tf.tf + {k1} * (1.0 - {b}
             + {b} * dl.dl / (tt.total::DOUBLE / nn.n)))
          * 1000000.0, 0) AS BIGINT) AS e6
    FROM tf JOIN dfq ON dfq.t = tf.t
            JOIN dl ON dl.doc_id = tf.doc_id, nn, tt)
SELECT doc_id, sum(e6) / 1000000.0 AS score
FROM term GROUP BY doc_id ORDER BY doc_id"""


def _q_doc_topk_mg(sf_dir):
    """Exact top-100 vocabulary via the no-shuffle scale path:
    Misra-Gries prefilter tree-merged through one native aggregate
    (O(capacity) accumulator traffic), then exact counting of the
    candidates only. The guarantee check (k-th exact count > MG
    decrement bound) proves bit-equality with brute force — enforced
    here so the oracle compare is sound by construction."""
    from graphscope_ray.data.heavyhitters import mg_topk
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    df, info = mg_topk(docs, k=100, capacity=4096)
    if not info["guaranteed"]:
        raise RuntimeError(f"mg_topk guarantee failed: {info}")
    return df


def _q_doc_hll(sf_dir):
    """HyperLogLog distinct-token sketch (p=10): per-block register
    folds tree-merged through ONE native global aggregate — 1 KiB
    accumulators are all that move; the oracle replays the register
    table bit-exactly from the shared token-hash family."""
    from graphscope_ray.data.sketch import hll_register_rows
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return hll_register_rows(docs, p=10)


def _q_doc_hll_by_source(sf_dir):
    """Per-source HLL registers — groupby(source).aggregate with the
    same fold/merge; one 1 KiB vector per source is the group state."""
    from graphscope_ray.data.sketch import hll_register_rows_by_key
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])
    return hll_register_rows_by_key(docs, key="source", p=10)


def _q_doc_bloom(sf_dir):
    """Bloom-filter decontamination scale path: build an OR-merged
    bitset over the benchmark carve's tokens (one native aggregate),
    broadcast it once, probe every doc vectorized. The oracle replays
    membership — including false positives — from the distinct
    set-bit positions."""
    import pyarrow as _pa
    from graphscope_ray.data.sketch import bloom_build, bloom_probe
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def carve(t: _pa.Table) -> _pa.Table:
        return t.filter(_pa.array((t["doc_id"].to_numpy() % 20) == 0))

    words = bloom_build(docs.map_batches(carve, batch_format="pyarrow"),
                        k=3, m_bits=1 << 16)
    return bloom_probe(docs, words, k=3, m_bits=1 << 16)


def _q_doc_cms(sf_dir):
    """Count-min frequency sketch (d=4, w=1024): per-block count folds
    tree-merged by elementwise sum through ONE native global aggregate
    — 32 KiB accumulators are the only traffic; the oracle replays the
    dense count table bit-exactly from the shared rehash family."""
    from graphscope_ray.data.sketch import cms_rows
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return cms_rows(docs, d=4, w=1024)


def _q_doc_packing(sf_dir):
    """Fixed-token-budget sequence packing — global sort + distributed
    prefix sum (O(#blocks) scalars on the driver)."""
    from graphscope_ray.data.curate import pack_sequences
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return pack_sequences(docs, 2048)


def _q_doc_decontaminate(sf_dir):
    """Benchmark decontamination — 8-token window hashes vs a
    broadcast benchmark set (docs with doc_id % 20 == 0)."""
    from graphscope_ray.data.curate import decontaminate
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def bench_filter(t):
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 20 == 0))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return decontaminate(docs, bench, n=8)


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


def _q_doc_bpe_tokens(sf_dir):
    from graphscope_ray.data.text import bpe_token_count
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return bpe_token_count(docs)


def _q_doc_jaccard(sf_dir):
    from graphscope_ray.data.dedup import fingerprint_jaccard_pairs
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return fingerprint_jaccard_pairs(docs, threshold=0.5)


def _q_doc_classifier(sf_dir):
    """Frozen-weight logistic quality classifier — the model-inference
    stage shape; features + double-precision logistic replayed in SQL."""
    from graphscope_ray.data.text import quality_classifier
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return quality_classifier(docs)


def _q_doc_chunk(sf_dir):
    """Overlapping fixed-size chunking (context prep) — shuffle-free
    flat expansion, codepoint-exact vs the DuckDB substr twin."""
    from graphscope_ray.data.curate import chunk_text
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return chunk_text(docs, size=256, overlap=32)


def _q_doc_bigrams(sf_dir):
    """Corpus top-100 word bigrams — per-batch value_counts combiner
    before the distinct-bigram groupby."""
    from graphscope_ray.data.curate import bigram_topk
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return bigram_topk(docs, k=100)


def _q_doc_lm_score(sf_dir):
    """Corpus-trained bigram-LM quality score (CCNet shape, Wenzek et
    al. 2020): add-one-smoothed per-token NLL of each doc under the
    corpus's own bigram counts — combiner-reduced count tables +
    broadcast-or-join attach; the SQL twin recomputes the identical
    model and formula."""
    from graphscope_ray.data.text import lm_score
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return lm_score(docs)


_DOC_LM_SCORE_SQL = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS l
  FROM documents),
uni AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS c1
  FROM (SELECT unnest(l) AS w FROM toks) GROUP BY w),
vv AS MATERIALIZED (SELECT count(*)::DOUBLE AS v FROM uni),
bg AS MATERIALIZED (
  SELECT doc_id, w1, bgr, count(*)::BIGINT AS m FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(l) - 1),
                                 i -> l[i])) AS w1,
           unnest(list_transform(generate_series(1, len(l) - 1),
                                 i -> l[i] || ' ' || l[i + 1])) AS bgr
    FROM toks)
  GROUP BY doc_id, w1, bgr),
c2 AS MATERIALIZED (SELECT bgr, sum(m)::BIGINT AS c2 FROM bg
                    GROUP BY bgr),
terms AS (
  SELECT b.doc_id,
         sum(b.m * ln((c2.c2 + 1.0) / (u.c1 + (SELECT v FROM vv))))
           AS s,
         sum(b.m)::BIGINT AS n
  FROM bg b JOIN c2 USING (bgr) JOIN uni u ON u.w = b.w1
  GROUP BY b.doc_id)
SELECT d.doc_id, coalesce(t.n, 0)::BIGINT AS n_bigrams,
       round(coalesce(-t.s / t.n, 0.0), 6) AS lm_nll
FROM documents d LEFT JOIN terms t USING (doc_id) ORDER BY d.doc_id"""


def _q_doc_dsir(sf_dir):
    """DSIR importance resampling (Xie 2023, arXiv:2302.03169):
    log-likelihood ratio of a target-domain (src0/src1) unigram model
    over the raw-corpus model, top 20% kept deterministically
    (rank by rounded weight, doc_id tiebreak)."""
    from graphscope_ray.data.curate import dsir_select
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"])
    return dsir_select(docs, ["src0", "src1"], 0.2)


_DOC_DSIR_SQL = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS l
  FROM documents),
rows_ AS MATERIALIZED (
  SELECT doc_id, source, w, count(*)::BIGINT AS m
  FROM (SELECT doc_id, source, unnest(l) AS w FROM toks)
  GROUP BY doc_id, source, w),
cq AS MATERIALIZED (SELECT w, sum(m)::BIGINT AS cq FROM rows_
                    GROUP BY w),
cp AS MATERIALIZED (
  SELECT w, sum(m)::BIGINT AS cp FROM rows_
  WHERE source IN ('src0', 'src1') GROUP BY w),
consts AS MATERIALIZED (
  SELECT (SELECT count(*)::DOUBLE FROM cq) AS v,
         (SELECT sum(cq)::DOUBLE FROM cq) AS nq,
         (SELECT coalesce(sum(cp), 0)::DOUBLE FROM cp) AS np_),
lw AS (
  SELECT r.doc_id,
         sum(r.m * (ln((coalesce(p.cp, 0) + 1.0) / (c.np_ + c.v))
                    - ln((q.cq + 1.0) / (c.nq + c.v)))) AS lw
  FROM rows_ r
  JOIN cq q USING (w)
  LEFT JOIN cp p USING (w)
  CROSS JOIN consts c
  GROUP BY r.doc_id),
all_docs AS (
  SELECT d.doc_id, round(coalesce(lw.lw, 0.0), 6) AS lw
  FROM documents d LEFT JOIN lw USING (doc_id)),
ranked AS (
  SELECT doc_id, lw,
         row_number() OVER (ORDER BY lw DESC, doc_id) AS rn
  FROM all_docs)
SELECT doc_id, lw FROM ranked
WHERE rn <= ceil(0.2 * (SELECT count(*) FROM documents))
ORDER BY doc_id"""


def _q_emb_mmr(sf_dir):
    """MMR diversified retrieval (Carbonell & Goldstein 1998): greedy
    top-5 re-rank of the whole pool against vec 0's embedding at
    λ=0.7, on the repo-wide rounded-cosine protocol (the DuckDB twin
    unrolls the five greedy steps as successive argmax CTEs)."""
    import pyarrow.parquet as pq
    from graphscope_ray.data.similarity import mmr_select
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)])["embedding"][0].as_py()
    return mmr_select(emb, np.asarray(q, dtype=np.float64),
                      k=5, lam=0.7)


def _mmr_sql(k: int = 5, lam: float = 0.7) -> str:
    """Unrolled greedy-MMR twin: step i = argmax of
    round(λ·qc − (1−λ)·greatest(pairwise cos6 to picks 1..i−1), 6)
    over the not-yet-picked pool, vec_id tiebreak."""
    parts = ["""WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb AS qv FROM e WHERE vec_id = 0),
sc AS MATERIALIZED (
  SELECT e.vec_id, e.emb,
         round(list_cosine_similarity(e.emb, (SELECT qv FROM q)), 6)
           AS qc
  FROM e)"""]
    for i in range(1, k + 1):
        if i == 1:
            parts.append(
                f"s1 AS (SELECT vec_id, emb, round({lam} * qc, 6) AS "
                f"score FROM sc ORDER BY round({lam} * qc, 6) DESC, "
                f"vec_id LIMIT 1)")
            continue
        excl = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i))
        terms = ", ".join(
            f"round(list_cosine_similarity(sc.emb, "
            f"(SELECT emb FROM s{j})), 6)" for j in range(1, i))
        g = terms if i == 2 else f"greatest({terms})"
        parts.append(
            f"s{i} AS (SELECT vec_id, emb, round({lam} * qc - "
            f"{1.0 - lam} * {g}, 6) AS score FROM sc "
            f"WHERE vec_id NOT IN ({excl}) "
            f"ORDER BY score DESC, vec_id LIMIT 1)")
    union = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS rank, vec_id, score FROM s{i}"
        for i in range(1, k + 1))
    return (",\n".join(parts)
            + f"\nSELECT * FROM ({union}) ORDER BY rank")


def _q_doc_gopher(sf_dir):
    """Gopher quality-rule set (Rae 2021, arXiv:2112.11446 §A1.1 —
    the rule family RefinedWeb/Dolma reuse): per-doc rule booleans +
    fused keep flag, all single-pass vectorized string kernels."""
    from graphscope_ray.data.curate import gopher_rules
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return gopher_rules(docs).sort("doc_id")


_DOC_GOPHER_SQL = r"""
WITH base AS MATERIALIZED (
  SELECT doc_id, coalesce(text, '') AS t,
         lower(coalesce(text, '')) AS lo FROM documents),
p AS MATERIALIZED (
  SELECT doc_id, t, lo,
         list_filter(string_split_regex(lo, '\s+'),
                     x -> len(x) > 0) AS ws,
         string_split(t, chr(10)) AS ls
  FROM base),
m AS (
  SELECT doc_id,
    len(ws)::BIGINT AS n_words,
    round(coalesce(list_sum(list_transform(ws, x -> len(x))), 0)
          / greatest(len(ws), 1), 6) AS mwl,
    round(((len(t) - len(replace(t, '#', '')))
           + (len(t) - len(replace(t, '...', ''))) / 3)
          / greatest(len(ws), 1), 6) AS sym_ratio,
    round(len(list_filter(ls,
              l -> regexp_matches(l, '^[ \t]*[-*•]')))
          / greatest(len(ls), 1), 6) AS bullet_ratio,
    round(len(list_filter(ls,
              l -> rtrim(l, ' ' || chr(9) || chr(13) || chr(12))
                   LIKE '%...'))
          / greatest(len(ls), 1), 6) AS ell_ratio,
    round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
          / greatest(len(ws), 1), 6) AS alpha_ratio,
    ((CASE WHEN regexp_matches(lo, '\bthe\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bbe\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bto\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bof\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\band\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bthat\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bhave\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(lo, '\bwith\b') THEN 1 ELSE 0 END)
    ) AS stop_hits
  FROM p),
r AS (
  SELECT doc_id, n_words,
    (n_words >= 10 AND n_words <= 100000) AS r_words,
    (mwl >= 2.0 AND mwl <= 12.0) AS r_mwl,
    (sym_ratio <= 0.1) AS r_symbol,
    (bullet_ratio <= 0.9) AS r_bullet,
    (ell_ratio <= 0.3) AS r_ellipsis,
    (alpha_ratio >= 0.6) AS r_alpha,
    (stop_hits >= 1) AS r_stop
  FROM m)
SELECT doc_id, n_words, r_words, r_mwl, r_symbol, r_bullet,
       r_ellipsis, r_alpha, r_stop,
       (r_words AND r_mwl AND r_symbol AND r_bullet AND r_ellipsis
        AND r_alpha AND r_stop) AS keep
FROM r ORDER BY doc_id"""


def _q_rel_q5_volume(sf_dir):
    """TPC-H Q5-shaped local-supplier-volume pipeline: six-table join
    chain as broadcast lookups onto the one big (never-shuffled)
    lineitem table + integer-cents partial aggregation."""
    from graphscope_ray.pipelines.relational import local_supplier_volume
    return local_supplier_volume(sf_dir)


def _q5_sql():
    from graphscope_ray.pipelines.relational import \
        LOCAL_SUPPLIER_VOLUME_SQL
    return LOCAL_SUPPLIER_VOLUME_SQL


def _q_doc_adaptive_quality(sf_dir):
    """Per-domain adaptive quality gate (keep docs ≥ their source's
    median quality) — per-group quantile_disc thresholds via one
    coarse-bucket order-statistic exchange; doc rows never shuffle."""
    from graphscope_ray.data.curate import adaptive_quality_filter
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    return adaptive_quality_filter(docs)


_DOC_ADAPTIVE_QUALITY_SQL = r"""
WITH s AS MATERIALIZED (
  SELECT doc_id, source, round(
    round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
          / greatest(length(text), 1), 6)
    * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> ''))::DOUBLE / 100.0), 6)
    AS quality
  FROM documents),
t AS (SELECT source, quantile_disc(quality, 0.5) AS thr
      FROM s GROUP BY source)
SELECT s.doc_id, s.source, s.quality, t.thr
FROM s JOIN t USING (source)
WHERE s.quality >= t.thr ORDER BY s.doc_id"""


PQ_M, PQ_K, PQ_ITERS, PQ_DIM = 4, 8, 2, 64


def _q_emb_pq_codes(sf_dir):
    """Product-quantization codes (Jégou et al. 2011): per-subspace
    kmeans codebooks (shared Lloyd's protocol) over the normalized
    embeddings, each vector encoded to m uint8 codes — flattened to
    code_<j> columns for the hash compare. The twin unrolls m
    independent kmeans chains over 1-based list slices."""
    from graphscope_ray.data.similarity import pq_encode, pq_train
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    books = pq_train(emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    codes = pq_encode(emb, books)

    def flat(t: pa.Table) -> pa.Table:
        import numpy as np
        c = np.stack(t["codes"].to_numpy(zero_copy_only=False))
        cols = {"vec_id": t["vec_id"]}
        for j in range(PQ_M):
            cols[f"code_{j}"] = pa.array(c[:, j].astype("int64"))
        return pa.table(cols)

    return codes.map_batches(flat, batch_format="pyarrow")


def _pq_codes_sql(m: int, k: int, iters: int, dim: int) -> str:
    """Twin of _q_emb_pq_codes: normalize, slice into m subspaces
    (1-based inclusive list slicing), run the kmeans_sql protocol
    (smallest-id init, rounded-6dp list_distance argmin with ties to
    the lower code, double-precision means, empty codes keep their
    previous centroid) independently per subspace."""
    sub = dim // m
    parts = ["""en AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS e0,
         sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                      y -> y * y))) AS nrm
  FROM embeddings)"""]
    selects = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        p = f"s{j}"
        parts.append(f"""{p} AS MATERIALIZED (
  SELECT vec_id, list_transform(e0[{lo}:{hi}], x -> x / nrm) AS emb
  FROM en)""")
        parts.append(f"""{p}c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb AS c
  FROM (SELECT vec_id, emb FROM {p} ORDER BY vec_id LIMIT {k}))""")
        prev = f"{p}c0"
        for it in range(1, iters):
            parts.append(f"""{p}d{it} AS (
  SELECT e.vec_id, c.cid, round(list_distance(e.emb, c.c), 6) AS dd
  FROM {p} e CROSS JOIN {prev} c),
{p}a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn
    FROM {p}d{it}) WHERE rn = 1),
{p}m{it} AS (
  SELECT a.cid, g.i, avg(e.emb[g.i]) AS v
  FROM {p}a{it} a JOIN {p} e USING (vec_id),
       generate_series(1, {sub}) g(i)
  GROUP BY a.cid, g.i),
{p}c{it} AS (
  SELECT q.cid, CASE WHEN count(mm.i) = 0 THEN q.c
                ELSE list(mm.v ORDER BY mm.i) END AS c
  FROM {prev} q LEFT JOIN {p}m{it} mm ON mm.cid = q.cid
  GROUP BY q.cid, q.c)""")
            prev = f"{p}c{it}"
        parts.append(f"""{p}fin AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(list_distance(e.emb, c.c), 6), c.cid) rn
    FROM {p} e CROSS JOIN {prev} c) WHERE rn = 1)""")
        selects.append(f"{p}fin.cid::BIGINT AS code_{j}")
    joins = "\n".join(
        f"JOIN s{j}fin ON s{j}fin.vec_id = en.vec_id"
        for j in range(m))
    return (f"WITH {','.join(parts)}\n"
            f"SELECT en.vec_id, {', '.join(selects)}\n"
            f"FROM en\n{joins}\nORDER BY en.vec_id")


def _q_emb_kmeans(sf_dir):
    """Distributed Lloyd's k-means (k=8, 2 iterations) — broadcast
    centroids + per-batch partial sums; the SQL twin unrolls both
    iterations with the shared rounded-argmin tie protocol."""
    from graphscope_ray.data.similarity import kmeans_assign
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return kmeans_assign(emb, k=8, iters=2)


def _q_emb_semdedup(sf_dir):
    """SemDeDup (arXiv:2303.09540): kmeans clusters (k=8, 2 iters) →
    in-cluster cosine pairs at rounded >= 0.3 → keep the smallest id
    of each near-dup group. Cluster-bucketed pair kernel; the SQL twin
    shares the kmeans CTEs with emb_kmeans."""
    from graphscope_ray.data.similarity import semantic_dedup
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return semantic_dedup(emb, k=8, iters=2, threshold=0.3)


def _q_emb_cluster_sample(sf_dir):
    """Cluster-balanced sampling: k-means (k=8, 2 iters) + keep the 10
    rows of each cluster with the smallest fmix64 coin."""
    from graphscope_ray.data.similarity import cluster_sample
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return cluster_sample(emb, k=8, iters=2, m=10, seed=3)


def _q_emb_ann_topk(sf_dir):
    from graphscope_ray.data import ann_topk
    import pyarrow.compute as pc
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # pick the 3 query vectors with a pushed-down filter (never
    # materialize the embedding table on the driver — r01 VERDICT #3)
    qtab = (emb.filter(expr="vec_id < 3")
            .take_batch(16, batch_format="pyarrow"))
    order = pc.sort_indices(qtab["vec_id"])
    queries = np.stack([np.asarray(v)
                        for v in qtab["embedding"].take(order).to_pylist()])
    out = ann_topk(emb, queries, k=5)
    from graphscope_ray.util import round_half_away
    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 6)
    return out


def _q_pg_component_sizes(sf_dir):
    """Component-size distribution (how many components of each
    size) — completes the graph-audit trio with pg_degree_hist and
    pg_pseudo_diameter; two chained bucketed sums over the resident
    WCC labels."""
    from graphscope_ray.util import bucketed_sum
    g, _ = _partgraph(sf_dir)
    wc = g.wcc()

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"comp": t["comp"],
                         "n": np.ones(len(t), np.int64)})

    sizes = bucketed_sum(wc.map_batches(one, batch_format="pyarrow"),
                         "comp", "n")

    def one2(t: pa.Table) -> pa.Table:
        return pa.table({"size": t["n"],
                         "n_components": np.ones(len(t), np.int64)})

    return bucketed_sum(sizes.map_batches(one2, batch_format="pyarrow"),
                        "size", "n_components")


_COMPONENT_SIZES_SQL = f"""
WITH RECURSIVE {_PRELUDE},
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
),
comp AS (SELECT v, min(l) AS c FROM r GROUP BY v),
sizes AS (SELECT c, count(*)::BIGINT AS size FROM comp GROUP BY c)
SELECT size, count(*)::BIGINT AS n_components FROM sizes
GROUP BY size ORDER BY size"""


def _q_events_window_hll(sf_dir):
    """Daily-active-users HLL: per tumbling day, the 2^8 register
    table of fmix64(user_id·B + seed) — sketch × temporal composition
    (only #days · 256 B of accumulator move; exact register replay in
    SQL)."""
    from graphscope_ray.data.sketch import hll_window_ids
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "user_id"])
    return hll_window_ids(events, p=8, seed=5)


def _window_hll_sql(p: int = 8, seed: int = 5,
                    wns: int = 86_400_000_000_000) -> str:
    from graphscope_ray.oracle_sql import B, M64, fmix_u64_sql
    m, cap = 1 << p, 64 - p + 1
    h = fmix_u64_sql(f"((user_id::HUGEINT * {B} + {seed}) % {M64})"
                     "::UBIGINT")
    w = f"((h >> {p})::BIGINT)"
    return f"""
WITH x AS (SELECT (epoch_ns(ts) // {wns})::BIGINT AS wid, {h} AS h
           FROM events),
rr AS (SELECT wid, (h % {m})::BIGINT AS idx,
       CASE WHEN (h >> {p}) = 0 THEN {cap}
            ELSE least(bit_count(({w} & (-{w})) - 1) + 1, {cap})
       END AS rho
       FROM x),
regs AS (SELECT wid, idx, max(rho) AS reg FROM rr GROUP BY wid, idx),
wids AS (SELECT DISTINCT wid FROM x),
grid AS (SELECT wids.wid, g.reg_idx FROM wids
         CROSS JOIN (SELECT unnest(range({m})) AS reg_idx) g)
SELECT grid.wid AS wid, grid.reg_idx::BIGINT AS reg_idx,
       coalesce(regs.reg, 0)::BIGINT AS reg
FROM grid LEFT JOIN regs ON regs.wid = grid.wid
                        AND regs.idx = grid.reg_idx
ORDER BY grid.wid, grid.reg_idx"""


def _q_pg_degree_hist(sf_dir):
    """Degree distribution (histogram of undirected degrees) — the
    power-law health check every link-graph audit starts with; two
    chained bucketed sums (vid degrees → degree counts)."""
    from graphscope_ray.graph import api
    from graphscope_ray.util import bucketed_sum
    _, edges = _partgraph(sf_dir)
    deg = api.degrees(api.to_undirected(edges), mode="out")

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"degree": t["degree"],
                         "n": np.ones(len(t), np.int64)})

    return bucketed_sum(deg.map_batches(one, batch_format="pyarrow"),
                        "degree", "n")


_DEGREE_HIST_SQL = f"""
WITH {_PRELUDE},
d AS (SELECT s AS v, count(*)::BIGINT AS degree FROM e GROUP BY s)
SELECT degree, count(*)::BIGINT AS n FROM d
GROUP BY degree ORDER BY degree"""


def _q_pg_sparsify(sf_dir):
    """Top-k edge sparsification: keep each source's 3 strongest
    co-occurrence edges (weight desc, dst asc) — the kNN-graph
    preprocessing step for community/embedding pipelines; pure
    composition of the per-group top-k combiner over the edge table
    (no O(E) driver state, at most k·V rows survive)."""
    from graphscope_ray.data.curate import topk_per_group
    _, edges = _partgraph(sf_dir)
    return topk_per_group(edges.select_columns(["src", "dst", "weight"]),
                          group="src", score="weight", key="dst", k=3)


_SPARSIFY_SQL = f"""
WITH {_PRELUDE}
SELECT src, dst, w::BIGINT AS weight, rn FROM (
  SELECT src, dst, w,
         row_number() OVER (PARTITION BY src
                            ORDER BY w DESC, dst) AS rn
  FROM e0)
WHERE rn <= 3 ORDER BY src, rn"""


def _q_events_zscore(sf_dir):
    """Per-event z-score within its user's value distribution
    (stddev_samp semantics; integer-cents exact moments, bit-exact
    final float expression)."""
    from graphscope_ray.data.temporal import user_zscores
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "value"])
    return user_zscores(events)


_ZSCORE_SQL = """
WITH m AS MATERIALIZED (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100.0, 0) AS BIGINT))::BIGINT AS sx,
         sum(CAST(round(value * 100.0, 0) AS BIGINT)
             * CAST(round(value * 100.0, 0) AS BIGINT))::BIGINT AS sxx
  FROM events GROUP BY 1),
j AS (SELECT e.event_id, e.user_id,
             CAST(round(e.value * 100.0, 0) AS BIGINT) AS c,
             m.n, m.sx, m.sxx
      FROM events e JOIN m USING (user_id) WHERE m.n >= 2)
SELECT event_id, user_id,
       round(((c * n - sx)::DOUBLE)
             / (sqrt(((n * sxx - sx * sx)::DOUBLE)
                     / ((n * (n - 1))::DOUBLE)) * n), 6) AS z
FROM j WHERE (n * sxx - sx * sx) > 0 ORDER BY event_id"""


def _q_doc_keywords(sf_dir):
    """Per-document keyword extraction: top-3 TF-IDF slots per doc
    (tfidf_rows → topk_per_group; keyword = hashed slot id in the
    shared fmix64 family) — the per-doc feature-selection composition
    of two existing oracle-checked operators."""
    from graphscope_ray.data.curate import topk_per_group
    from graphscope_ray.data.text import tfidf_rows
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return topk_per_group(tfidf_rows(docs, dim=128), group="doc_id",
                          score="tfidf", key="slot", k=3)


def _keywords_sql() -> str:
    base = _osql().tfidf_sql(dim=128).rstrip()
    assert base.endswith("ORDER BY doc_id, slot")
    inner = base[: -len("ORDER BY doc_id, slot")]
    return f"""
WITH t AS ({inner})
SELECT doc_id, slot, tf, tfidf, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY tfidf DESC, slot) AS rn FROM t)
WHERE rn <= 3 ORDER BY doc_id, rn"""


def _q_rel_rfm(sf_dir):
    """RFM customer segmentation (recency/frequency/monetary quartile
    scores, integer-cents money) — pipelines/relational.rfm_segments."""
    from graphscope_ray.pipelines.relational import rfm_segments
    return rfm_segments(sf_dir)


_RFM_SQL = """
WITH c AS MATERIALIZED (
  SELECT o_custkey AS cust,
         max(o_orderdate) AS rec,
         count(*)::BIGINT AS freq,
         sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))::BIGINT
           AS mon
  FROM orders GROUP BY 1),
q AS (SELECT quantile_disc(rec, 0.25) r1, quantile_disc(rec, 0.5) r2,
             quantile_disc(rec, 0.75) r3,
             quantile_disc(freq, 0.25) f1, quantile_disc(freq, 0.5) f2,
             quantile_disc(freq, 0.75) f3,
             quantile_disc(mon, 0.25) m1, quantile_disc(mon, 0.5) m2,
             quantile_disc(mon, 0.75) m3
      FROM c)
SELECT cust,
  (1 + (rec > q.r1)::INT + (rec > q.r2)::INT + (rec > q.r3)::INT
   )::BIGINT AS r_score,
  (1 + (freq > q.f1)::INT + (freq > q.f2)::INT + (freq > q.f3)::INT
   )::BIGINT AS f_score,
  (1 + (mon > q.m1)::INT + (mon > q.m2)::INT + (mon > q.m3)::INT
   )::BIGINT AS m_score,
  (100 * (1 + (rec > q.r1)::INT + (rec > q.r2)::INT + (rec > q.r3)::INT)
   + 10 * (1 + (freq > q.f1)::INT + (freq > q.f2)::INT
           + (freq > q.f3)::INT)
   + (1 + (mon > q.m1)::INT + (mon > q.m2)::INT + (mon > q.m3)::INT)
   )::BIGINT AS rfm
FROM c, q ORDER BY cust"""


def _q_emb_range_search(sf_dir):
    """Cosine range search (radius sibling of top-k ANN): all vectors
    with round6(cosine) ≥ 0.2 per query — streaming broadcast-matmul
    filter, no merge stage, no top-k state."""
    from graphscope_ray.data.similarity import range_search
    import pyarrow.compute as pc
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtab = (emb.filter(expr="vec_id < 3")
            .take_batch(16, batch_format="pyarrow"))
    order = pc.sort_indices(qtab["vec_id"])
    queries = np.stack([np.asarray(v)
                        for v in qtab["embedding"].take(order).to_pylist()])
    return range_search(emb, queries, threshold=0.2)


_RANGE_SEARCH_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.emb, q.qv), 6) AS cosine
      FROM e CROSS JOIN q)
SELECT query_id, vec_id, cosine FROM s WHERE cosine >= 0.2
ORDER BY query_id, vec_id"""


def _q_emb_ivf_ann(sf_dir):
    from graphscope_ray.data.similarity import ivf_ann_topk
    import pyarrow.compute as pc
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtab = (emb.filter(expr="vec_id < 3")
            .take_batch(16, batch_format="pyarrow"))
    order = pc.sort_indices(qtab["vec_id"])
    queries = np.stack([np.asarray(v)
                        for v in qtab["embedding"].take(order).to_pylist()])
    return ivf_ann_topk(emb, queries, k=5, num_centroids=8, nprobe=2)


def _q_emb_knn_wcc(sf_dir):
    """Composed pipeline: exact cosine kNN graph (chunked broadcast
    matmul, no shuffle) over the embeddings table → BSP graph-engine
    WCC over the symmetrized edge list → (vec_id, comp) single-link
    clusters (data/similarity.knn_graph). k=1 (mutual
    nearest-neighbor chains) keeps the oracle discriminating: at this
    sf it yields 138 components, so any wrong edge moves comp labels;
    k ≥ 2 collapses to one component and the hash would only check
    the vertex set."""
    from graphscope_ray.data.similarity import knn_graph
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.util import rename
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    edges = knn_graph(emb, k=1).select_columns(["src", "dst"])
    g = Graph.from_edges(edges, symmetrize=True)
    try:
        out = g.to_oid(g.wcc(), vid_cols=("vid", "comp"))
        return rename(out, {"vid": "vec_id"}).materialize()
    finally:
        g.close()


_KNN_WCC_SQL = """
WITH RECURSIVE
ev AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb
                    FROM embeddings),
s AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(list_cosine_similarity(a.emb, b.emb), 6) AS c
  FROM ev a JOIN ev b ON a.vec_id <> b.vec_id),
rk AS (SELECT src, dst, row_number() OVER (
         PARTITION BY src ORDER BY c DESC, dst) AS rnk FROM s),
e0 AS MATERIALIZED (SELECT src, dst FROM rk WHERE rnk <= 1),
e AS MATERIALIZED (SELECT src AS s, dst AS t FROM e0
                   UNION SELECT dst, src FROM e0),
v AS MATERIALIZED (SELECT DISTINCT s AS v FROM e),
r AS (
  SELECT v, v AS l FROM v
  UNION
  SELECT e.t, r.l FROM r JOIN e ON e.s = r.v WHERE r.l < e.t
)
SELECT v AS vec_id, min(l) AS comp FROM r GROUP BY v ORDER BY vec_id
"""


def _q_emb_cosine_dups(sf_dir):
    from graphscope_ray.data.dedup import embedding_cosine_dedup
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_cosine_dedup(emb, threshold=0.9)


def _q_events_session(sf_dir):
    """Session windows (30-min gap) per user — the gaps-and-islands
    streaming operator as one bucket shuffle + vectorized kernel."""
    from graphscope_ray.data.temporal import session_windows
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    return session_windows(ev)


def _q_events_hopping(sf_dir):
    """Hopping windows (1 h size, 15 min hop) per user: each event
    lands in 4 overlapping grid-aligned windows — expand-then-groupby."""
    from graphscope_ray.data.temporal import hopping_windows
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return hopping_windows(ev, size_us=3600 * 1_000_000,
                           hop_us=900 * 1_000_000)


def _q_events_funnel(sf_dir):
    """view→click→purchase ordered funnel per user (72 h horizon) —
    one coarse-bucket shuffle + vectorized per-bucket step walk."""
    from graphscope_ray.data.temporal import funnel
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel(ev, ["view", "click", "purchase"])


def _q_events_retention(sf_dir):
    """Weekly cohort retention matrix — per-key cohort/offset dedup
    completes inside one coarse-bucket shuffle; the (cohort, offset)
    reduce is the house bucketed_sum."""
    from graphscope_ray.data.temporal import retention
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return retention(ev, unit_days=7)


def _q_events_rolling(sf_dir):
    """7-day trailing window count + exact e6-scaled sum per event —
    segment-offset-adjusted single searchsorted per bucket; the SQL
    RANGE frame replays it bit-for-bit."""
    from graphscope_ray.data.temporal import rolling_window
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    return rolling_window(ev, window=np.timedelta64(7, "D"))


def _q_events_asof(sf_dir):
    """As-of join: each event picks the user's most recent order at
    event time (ties → max o_orderkey); unmatched events keep -1."""
    import pyarrow.compute as pc
    from graphscope_ray.data.temporal import asof_join
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    out = asof_join(ev, orders, by="user_id", right_by="o_custkey",
                    on="ts", right_on="o_orderdate",
                    value_cols=("o_orderkey", "o_totalprice"),
                    tiebreak=("o_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "o_orderkey": pc.cast(pc.fill_null(t["o_orderkey"], -1),
                                  pa.int64()),
            "o_totalprice": pc.fill_null(t["o_totalprice"], 0.0),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_rel_shipping(sf_dir):
    """TPC-H Q3-shaped shipping priority: semi-join + broadcast
    attach + per-order revenue combiner + per-block top-k trim
    (pipelines/relational.shipping_priority)."""
    from graphscope_ray.pipelines.relational import shipping_priority
    return shipping_priority(sf_dir)


def _q_rel_pricing(sf_dir):
    """TPC-H Q1-shaped pricing summary: batch-level partial aggregation
    (≤6 rows leave each batch), exact integer-scaled money sums."""
    from graphscope_ray.pipelines.relational import pricing_summary
    return pricing_summary(sf_dir)


def _q_rel_nation_revenue(sf_dir):
    """Order revenue per customer nation — broadcast lookups + partial
    aggregation (attach_values auto-falls back to a hash join >20M)."""
    from graphscope_ray.pipelines.relational import nation_revenue
    return nation_revenue(sf_dir)


def _q_orders_range90d(sf_dir):
    """Banded range join (self): per order, the customer's order count
    in the trailing 90-day window (inclusive of the order itself)."""
    from graphscope_ray.data.temporal import range_join_count
    left = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    right = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    out = range_join_count(left, right, by="o_custkey",
                           on="o_orderdate",
                           window=np.timedelta64(90, "D"),
                           out_col="n_orders_90d")
    return out.select_columns(["o_orderkey", "n_orders_90d"])


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
        from graphscope_ray.util import round_half_away
        i = t.schema.get_field_index("sum_value")
        return t.set_column(
            i, "sum_value",
            pa.array(round_half_away(t["sum_value"].to_numpy(), 6)))

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
    # Deterministic rotation (tools/rotate_queries.py): the driver
    # hard-verifies only the FIRST 50 dict entries, so rows least
    # recently checked (never-checked first) lead; re-run the tool
    # each round after the driver writes CORRECTNESS_r{N}.json.
    return {
        "doc_bigrams": _q_doc_bigrams,
        "doc_lm_score": _q_doc_lm_score,
        "doc_adaptive_quality": _q_doc_adaptive_quality,
        "emb_cluster_sample": _q_emb_cluster_sample,
        "emb_range_search": _q_emb_range_search,
        "rel_rfm": _q_rel_rfm,
        "doc_keywords": _q_doc_keywords,
        "events_zscore": _q_events_zscore,
        "pg_sparsify": _q_pg_sparsify,
        "pg_degree_hist": _q_pg_degree_hist,
        "events_window_hll": _q_events_window_hll,
        "pg_component_sizes": _q_pg_component_sizes,
        "emb_knn_wcc": _q_emb_knn_wcc,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "events_rolling": _q_events_rolling,
        "rel_shipping": _q_rel_shipping,
        "rel_q5_volume": _q_rel_q5_volume,
        "gie_group_by": _q_gie_group_by,
        "gie_program_sssp": _q_gie_program_sssp,
        "pg_pregel_udf": _q_pg_pregel_udf,
        "pg_property_pagerank": _q_pg_property_pagerank,
        "gie_and_or": _q_gie_and_or,
        "gie_optional": _q_gie_optional,
        "gie_pred_compose": _q_gie_pred_compose,
        "gie_choose": _q_gie_choose,
        "gie_project": _q_gie_project,
        "doc_dsir": _q_doc_dsir,
        "doc_gopher": _q_doc_gopher,
        "emb_mmr": _q_emb_mmr,
        "gie_coalesce": _q_gie_coalesce,
        "gie_math": _q_gie_math,
        "pg_dfs": _q_pg_dfs,
        "pg_sampling": _q_pg_sampling,
        "doc_sha256": _q_doc_sha256,
        "media_pipeline": _q_media_pipeline,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_token_count": _q_doc_token_count,
        "doc_bpe_tokens": _q_doc_bpe_tokens,
        "doc_quality": _q_doc_quality,
        "doc_langid": _q_doc_langid,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_minhash_dedup": _q_doc_minhash_dedup,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "doc_jaccard": _q_doc_jaccard,
        "emb_cosine_dups": _q_emb_cosine_dups,
        "events_window": _q_events_window,
        "events_session": _q_events_session,
        "events_hopping": _q_events_hopping,
        "events_asof": _q_events_asof,
        "orders_range90d": _q_orders_range90d,
        "rel_pricing": _q_rel_pricing,
        "rel_nation_revenue": _q_rel_nation_revenue,
        "pg_edges": _q_pg_edges,
        "pg_degree": _q_pg_degree,
        "pg_degree_centrality": _q_pg_degree_centrality,
        "pg_pagerank": _q_pg_pagerank,
        "pg_pagerank_pregel": _q_pg_pagerank_pregel,
        "pg_sssp_pregel": _q_pg_sssp_pregel,
        "pg_ppr": _q_pg_ppr,
        "pg_wcc": _q_pg_wcc,
        "pg_nx_wcc": _q_pg_nx_wcc,
        "pg_cdlp": _q_pg_cdlp,
        "pg_bfs": _q_pg_bfs,
        "pg_triangles": _q_pg_triangles,
        "pg_tc_pregel": _q_pg_tc_pregel,
        "pg_scc": _q_pg_scc,
        "pg_msf": _q_pg_msf,
        "pg_matching": _q_pg_matching,
        "pg_assortativity": _q_pg_assortativity,
        "pg_node2vec": _q_pg_node2vec,
        "pg_coarsen": _q_pg_coarsen,
        "pg_pseudo_diameter": _q_pg_pseudo_diameter,
        "events_attribution": _q_events_attribution,
        "pg_nearest_seed": _q_pg_nearest_seed,
        "pg_modularity": _q_pg_modularity,
        "pg_squares": _q_pg_squares,
        "pg_tc_total": _q_pg_tc_total,
        "pg_clustering": _q_pg_clustering,
        "pg_link_features": _q_pg_link_features,
        "pg_feature_prop": _q_pg_feature_prop,
        "pg_ktruss": _q_pg_ktruss,
        "pg_closeness": _q_pg_closeness,
        "pg_harmonic": _q_pg_harmonic,
        "pg_mis": _q_pg_mis,
        "pg_betweenness": _q_pg_betweenness,
        "pg_khop": _q_pg_khop,
        "pg_avg_clustering": _q_pg_avg_clustering,
        "pg_bfs_tree": _q_pg_bfs_tree,
        "pg_transitivity": _q_pg_transitivity,
        "pg_report": _q_pg_report,
        "pg_sssp": _q_pg_sssp,
        "pg_sssp_path": _q_pg_sssp_path,
        "pg_sssp_has_path": _q_pg_sssp_has_path,
        "pg_sssp_avg_len": _q_pg_sssp_avg_len,
        "pg_kcore": _q_pg_kcore,
        "pg_kshell": _q_pg_kshell,
        "pg_eigenvector": _q_pg_eigenvector,
        "pg_katz": _q_pg_katz,
        "pg_hits": _q_pg_hits,
        "pg_louvain": _q_pg_louvain,
        "pg_louvain_sweep": _q_pg_louvain_sweep,
        "pg_lpa": _q_pg_lpa,
        "doc_split_stratified": _q_doc_split_stratified,
        "pg_labeled_app": _q_pg_labeled_app,
        "gie_gremlin": _q_gie_gremlin,
        "media_frames": _q_media_frames,
        "pg_mutation_wcc": _q_pg_mutation_wcc,
        "pg_mutation_sssp": _q_pg_mutation_sssp,
        "pg_string_oids": _q_pg_string_oids,
        "pg_labeled_select": _q_pg_labeled_select,
        "pg_pattern_paths": _q_pg_pattern_paths,
        "gie_part_reach": _q_gie_part_reach,
        "gie_heavy_parts": _q_gie_heavy_parts,
        "gie_cust_big_orders": _q_gie_cust_big_orders,
        "gie_order_topk": _q_gie_order_topk,
        "gie_loyal_custs": _q_gie_loyal_custs,
        "gie_part_qty": _q_gie_part_qty,
        "gie_modest_custs": _q_gie_modest_custs,
        "gie_repeat_reach": _q_gie_repeat_reach,
        "gie_price_page": _q_gie_price_page,
        "gie_path_project": _q_gie_path_project,
        "gie_fold_unfold": _q_gie_fold_unfold,
        "gie_program_wcc": _q_gie_program_wcc,
        "doc_curation": _q_doc_curation,
        "doc_sample": _q_doc_sample,
        "doc_weighted_sample": _q_doc_weighted_sample,
        "doc_domain_mix": _q_doc_domain_mix,
        "doc_order": _q_doc_order,
        "doc_tfidf": _q_doc_tfidf,
        "doc_topk_source": _q_doc_topk_source,
        "doc_profile": _q_doc_profile,
        "doc_split": _q_doc_split,
        "doc_normalize": _q_doc_normalize,
        "doc_pii": _q_doc_pii,
        "doc_repetition": _q_doc_repetition,
        "doc_vocab": _q_doc_vocab,
        "doc_topk_mg": _q_doc_topk_mg,
        "doc_bm25": _q_doc_bm25,
        "doc_hll": _q_doc_hll,
        "doc_cms": _q_doc_cms,
        "doc_bloom": _q_doc_bloom,
        "doc_hll_by_source": _q_doc_hll_by_source,
        "doc_packing": _q_doc_packing,
        "doc_decontaminate": _q_doc_decontaminate,
        "doc_span_dedup": _q_doc_span_dedup,
        "doc_chunk": _q_doc_chunk,
        "doc_classifier": _q_doc_classifier,
        "emb_kmeans": _q_emb_kmeans,
        "emb_pq_codes": _q_emb_pq_codes,
        "emb_semdedup": _q_emb_semdedup,
        "emb_ann_topk": _q_emb_ann_topk,
        "emb_ivf_ann": _q_emb_ivf_ann,
    }


def _osql():
    from graphscope_ray import oracle_sql as mod
    return mod


def _pii_sql() -> str:
    from graphscope_ray.data.curate import EMAIL_PATTERN, LONGNUM_PATTERN
    return _osql().pii_scrub_sql(EMAIL_PATTERN, LONGNUM_PATTERN)


def _vocab_sql() -> str:
    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
    return _osql().vocab_topk_sql(100, VOCAB_TOKEN_PATTERN)


def _bigrams_sql() -> str:
    from graphscope_ray.data.curate import VOCAB_TOKEN_PATTERN
    return _osql().bigram_topk_sql(100, VOCAB_TOKEN_PATTERN)


def _bpe_tokens_sql() -> str:
    from graphscope_ray.data.text import BPE_PATTERN
    pat = BPE_PATTERN.replace("'", "''")
    return (f"SELECT doc_id, len(regexp_extract_all(text, '{pat}'))::BIGINT"
            f" AS n_bpe_tokens FROM documents ORDER BY doc_id")


def _media_expectation_path() -> str:
    """Write the media_pipeline expectation parquet to /tmp with the
    INDEPENDENT struct-based oracle (graphscope_ray.oracle.
    media_pipeline_expected) and return the path. Called when
    oracle_sql() builds its strings, so the file exists before DuckDB
    runs the twin — no committed artifact (r03 VERDICT #5). Constants
    mirror _q_media_pipeline (n=96, seed=5, 8×8 resize, 8-dim
    features)."""
    import os

    from graphscope_ray.data.multimodal import synth_media
    from graphscope_ray.oracle import media_pipeline_expected

    path = "/tmp/graphscope_ray_media_expected.parquet"
    # ALWAYS regenerate (cheap, 96 rows): a stale cache from an older
    # code version would silently compare against outdated semantics
    df = media_pipeline_expected(synth_media(n=96, seed=5),
                                 out_w=8, out_h=8, feat_dim=8)
    tmp = f"{path}.{os.getpid()}.tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def oracle_sql() -> dict[str, str]:
    from graphscope_ray.pipelines.relational import (
        NATION_REVENUE_SQL, pricing_summary_sql, shipping_priority_sql)
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
        "pg_pagerank_pregel": _pregel_pagerank_sql(PR_PREGEL_ROUNDS, DELTA),
        "pg_sssp_pregel": _sssp_sql(SSSP_ROUNDS),
        "pg_ppr": _ppr_sql(4, DELTA, n_seeds=3),
        "pg_wcc": _WCC_SQL,
        "doc_split_stratified": _osql().stratified_split_sql(seed=7),
        "pg_labeled_app": _LABELED_APP_SQL,
        "pg_nx_wcc": _WCC_SQL,
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
        "pg_tc_pregel": f"""
WITH {_PRELUDE},
{_TC_PREGEL_SQL}
SELECT v.v AS vid, (COALESCE(tcc.cntr, 0) // 2)::BIGINT AS tc
FROM v LEFT JOIN tcc ON tcc.v = v.v ORDER BY vid""",
        "pg_scc": _scc_sql(SCC_KEEP_PCT),
        "pg_msf": _msf_sql(12),
        "pg_matching": _matching_sql(24),
        "pg_assortativity": _ASSORT_SQL.format(prelude=_PRELUDE),
        "pg_node2vec": _node2vec_sql(4, 7),
        "pg_coarsen": _coarsen_sql(24),
        "pg_pseudo_diameter": _PSEUDO_DIAMETER_SQL,
        "events_attribution": _ATTRIBUTION_SQL,
        "pg_nearest_seed": _NEAREST_SEED_SQL,
        "pg_modularity": _modularity_sql(CDLP_ROUNDS),
        "pg_squares": _SQUARES_SQL,
        "pg_feature_prop": _feature_prop_sql(2),
        "pg_ktruss": _ktruss_sql(),
        "pg_closeness": _closeness_sql(SSSP_ROUNDS),
        "pg_harmonic": _harmonic_sql(SSSP_ROUNDS),
        "pg_mis": _mis_sql(MIS_ROUNDS, MIS_SEED),
        "pg_betweenness": _betweenness_sql(),
        "pg_khop": _khop_sql(hops=2, fanout=3, seed=5, n_seeds=3),
        "pg_link_features": f"""
WITH {_PRELUDE},
common AS (
  SELECT a.t AS x, b.t AS y, count(*)::BIGINT AS c
  FROM e a JOIN e b ON a.s = b.s AND a.t < b.t
  GROUP BY a.t, b.t)
SELECT e0.src, e0.dst,
  COALESCE(cm.c, 0)::BIGINT AS common_nbrs,
  round(COALESCE(cm.c, 0)::DOUBLE /
        (du.d + dv.d - COALESCE(cm.c, 0)), 6) AS jaccard
FROM e0
LEFT JOIN common cm ON cm.x = e0.src AND cm.y = e0.dst
JOIN deg du ON du.v = e0.src
JOIN deg dv ON dv.v = e0.dst
ORDER BY e0.src, e0.dst""",
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
        "pg_sssp": _sssp_sql(SSSP_ROUNDS),
        "pg_mutation_wcc": _MUT_WCC_SQL,
        "pg_mutation_sssp": _mut_sssp_sql(SSSP_ROUNDS),
        "pg_sssp_path": _sssp_path_sql(SSSP_ROUNDS),
        "pg_sssp_has_path": _HAS_PATH_SQL,
        "pg_sssp_avg_len": _sssp_avg_sql(SSSP_ROUNDS, AVGLEN_SOURCES),
        "pg_kcore": _kcore_sql(KCORE_K, PEEL_ROUNDS),
        "pg_kshell": _kshell_sql(KCORE_K, PEEL_ROUNDS),
        "pg_eigenvector": _eig_sql(EIG_ROUNDS),
        "pg_katz": _katz_sql(KATZ_ROUNDS, KATZ_ALPHA, KATZ_BETA),
        "pg_hits": _hits_sql(HITS_ROUNDS),
        "pg_lpa": _lpa_sql(LPA_ROUNDS),
        "pg_louvain": _louvain_full_sql(LOUVAIN_LEVELS, LOUVAIN_SWEEPS),
        "pg_louvain_sweep": _louvain_sweep_sql(),
        "pg_dfs": _DFS_SQL,
        "pg_sampling": _sampling_sql(SAMPLE_ROOTS, SAMPLE_LEN, SAMPLE_SEED),
        "pg_string_oids": _string_oids_sql(PR_ROUNDS, DELTA),
        "pg_labeled_select": _labeled_select_sql(PR_ROUNDS, DELTA),
        "pg_pattern_paths": _PATTERN_PATHS_SQL,
        "gie_part_reach": _GIE_PART_REACH_SQL,
        "gie_heavy_parts": _GIE_HEAVY_PARTS_SQL,
        "gie_cust_big_orders": _GIE_CUST_BIG_ORDERS_SQL,
        "gie_order_topk": _GIE_ORDER_TOPK_SQL,
        "gie_loyal_custs": _GIE_LOYAL_CUSTS_SQL,
        "gie_part_qty": _GIE_PART_QTY_SQL,
        "gie_modest_custs": _GIE_MODEST_CUSTS_SQL,
        "gie_repeat_reach": _GIE_REPEAT_REACH_SQL,
        "gie_price_page": _GIE_PRICE_PAGE_SQL,
        "gie_path_project": _GIE_PATH_PROJECT_SQL,
        "gie_fold_unfold": _GIE_FOLD_UNFOLD_SQL,
        "gie_gremlin": _GIE_GREMLIN_SQL,
        "media_frames": f"""
SELECT media_id, ts_ms, frame_sha256
FROM read_parquet('{_media_frames_expectation_path()}')
ORDER BY media_id, ts_ms""",
        "gie_program_wcc": _GIE_PROGRAM_WCC_SQL,
        "gie_group_by": _GIE_GROUP_BY_SQL,
        "gie_program_sssp": _GIE_PROGRAM_SSSP_SQL,
        "pg_pregel_udf": _GIE_PROGRAM_SSSP_SQL,
        # pg_property_pagerank: the pg_pagerank unroll with a parity
        # label column stacked on the final select
        "pg_property_pagerank": _pagerank_sql(PR_ROUNDS, DELTA).replace(
            "SELECT v AS vid, round(r, 6) AS rank FROM",
            "SELECT v AS id, CASE WHEN v % 2 = 0 THEN 'even' "
            "ELSE 'odd' END AS label, round(r, 6) AS rank FROM"
        ).replace("ORDER BY vid", "ORDER BY id"),
        "gie_and_or": _GIE_AND_OR_SQL,
        "gie_optional": _GIE_OPTIONAL_SQL,
        "gie_pred_compose": _GIE_PRED_COMPOSE_SQL,
        "gie_choose": _GIE_CHOOSE_SQL,
        "gie_project": _GIE_PROJECT_SQL,
        "doc_dsir": _DOC_DSIR_SQL,
        "doc_gopher": _DOC_GOPHER_SQL,
        "emb_mmr": _mmr_sql(),
        "gie_coalesce": _GIE_COALESCE_SQL,
        "gie_math": _GIE_MATH_SQL,
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
        # binary media itself is not SQL-expressible; the expectation
        # parquet is REGENERATED at oracle_sql() call time by the
        # independent struct-based chain in graphscope_ray/oracle.py
        # (no committed artifact — r03 VERDICT #5), then hash-compared
        # to pin the whole resize→decode→feature chain bit-for-bit
        "media_pipeline": f"""
SELECT media_id, kind, payload_bytes, dim, feat
FROM read_parquet('{_media_expectation_path()}')
ORDER BY media_id, dim""",
        "doc_sha256": """
SELECT doc_id, sha256(text) AS content_sha256 FROM documents ORDER BY doc_id""",
        "doc_exact_dedup": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS dup_count
FROM documents GROUP BY text ORDER BY doc_id""",
        "doc_token_count": r"""
SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''))::BIGINT AS n_tokens
FROM documents ORDER BY doc_id""",
        "doc_profile": r"""
WITH tc AS (SELECT len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''))::BIGINT AS n_tokens
            FROM documents)
SELECT count(*)::BIGINT AS n,
       (count(*) - count(n_tokens))::BIGINT AS nulls,
       min(n_tokens) AS min, max(n_tokens) AS max,
       round(avg(n_tokens), 6) AS mean,
       quantile_disc(n_tokens, 0.25) AS q25,
       quantile_disc(n_tokens, 0.50) AS q50,
       quantile_disc(n_tokens, 0.75) AS q75,
       quantile_disc(n_tokens, 0.90) AS q90,
       quantile_disc(n_tokens, 0.99) AS q99
FROM tc""",
        "doc_quality": r"""
SELECT doc_id, round(
  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        / greatest(length(text), 1), 6)
  * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''))::DOUBLE / 100.0), 6) AS quality
FROM documents ORDER BY doc_id""",
        "doc_bpe_tokens": _bpe_tokens_sql(),
        "doc_langid": _osql().langid_sql(),
        "doc_curation": _osql().curation_sql(lang="en", min_quality=0.1),
        "doc_sample": _osql().hash_sample_sql(0.25, seed=1),
        "doc_weighted_sample": _weighted_sample_sql(100, seed=13),
        "doc_domain_mix": _osql().domain_mixture_sql(
            _MIX_RATES, default_rate=0.75, seed=5),
        "doc_order": _osql().training_order_sql(seed=11),
        "doc_tfidf": _osql().tfidf_sql(dim=128),
        "doc_topk_source": r"""
WITH q AS (SELECT doc_id, source, round(
  round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        / greatest(length(text), 1), 6)
  * least(1.0, len(list_filter(string_split_regex(text, '\s+'),
                               x -> x <> ''))::DOUBLE / 100.0), 6) AS quality
  FROM documents),
r AS (SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn
      FROM q)
SELECT doc_id, source, quality, rn FROM r WHERE rn <= 3
ORDER BY source, rn""",
        "doc_split": _osql().split_assign_sql(seed=7),
        "doc_normalize": _osql().NORMALIZE_SQL,
        "doc_pii": _pii_sql(),
        "doc_repetition": _osql().REPETITION_SQL,
        "doc_vocab": _vocab_sql(),
        # the MG route must equal brute-force top-k exactly (the
        # guarantee check raises otherwise), so the twin is the same
        # exact-SQL as doc_vocab
        "doc_topk_mg": _vocab_sql(),
        "doc_bm25": _bm25_sql(["join", "hash", "vector"]),
        "doc_hll": _osql().hll_registers_sql(10),
        "doc_cms": _osql().cms_rows_sql(4, 1024),
        "doc_bloom": _osql().bloom_probe_sql(3, 1 << 16, 20),
        "doc_hll_by_source": _osql().hll_registers_by_key_sql(10, "source"),
        "doc_packing": _osql().pack_sequences_sql(2048),
        "doc_decontaminate": _osql().decontaminate_sql(n=8, bench_mod=20),
        "doc_fingerprint": _osql().fingerprint_sql(k=5),
        "doc_minhash_dedup": _osql().minhash_dedup_sql(threshold=0.9),
        "doc_simhash_pairs": _osql().simhash_pairs_sql(max_hamming=0),
        "doc_jaccard": _osql().jaccard_pairs_sql(threshold=0.5),
        "doc_span_dedup": _osql().span_dedup_sql(k=8),
        "doc_chunk": _osql().chunk_text_sql(size=256, overlap=32),
        "doc_classifier": _osql().quality_classifier_sql(),
        "doc_bigrams": _bigrams_sql(),
        "doc_lm_score": _DOC_LM_SCORE_SQL,
        "doc_adaptive_quality": _DOC_ADAPTIVE_QUALITY_SQL,
        "emb_pq_codes": _pq_codes_sql(PQ_M, PQ_K, PQ_ITERS, PQ_DIM),
        "emb_kmeans": _osql().kmeans_sql(k=8, iters=2, dim=64),
        "emb_semdedup": _osql().semdedup_sql(k=8, iters=2, dim=64,
                                             threshold=0.3),
        "emb_cluster_sample": _osql().cluster_sample_sql(
            k=8, iters=2, m=10, seed=3, dim=64),
        "emb_range_search": _RANGE_SEARCH_SQL,
        "rel_rfm": _RFM_SQL,
        "doc_keywords": _keywords_sql(),
        "events_zscore": _ZSCORE_SQL,
        "pg_sparsify": _SPARSIFY_SQL,
        "pg_degree_hist": _DEGREE_HIST_SQL,
        "events_window_hll": _window_hll_sql(8, 5),
        "pg_component_sizes": _COMPONENT_SIZES_SQL,
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
        "emb_ivf_ann": """
WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c AS MATERIALIZED (SELECT vec_id AS cid, emb AS cv FROM e WHERE vec_id < 8),
q AS MATERIALIZED (SELECT vec_id AS query_id, emb AS qv FROM e
                   WHERE vec_id < 3),
assign AS MATERIALIZED (
  SELECT vec_id, emb, cid FROM (
    SELECT e.vec_id, e.emb, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.emb, c.cv), 6) DESC,
                      c.cid) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1),
probe AS MATERIALIZED (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                      c.cid) AS rn
    FROM q CROSS JOIN c) WHERE rn <= 2),
s AS (SELECT p.query_id, a.vec_id,
             round(list_cosine_similarity(a.emb, q.qv), 6) AS cosine
      FROM assign a JOIN probe p ON p.cid = a.cid
                    JOIN q ON q.query_id = p.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank""",
        "emb_knn_wcc": _KNN_WCC_SQL,
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
        "events_session": """
WITH o AS (SELECT user_id, ts, value, event_id,
  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)
            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
        "events_hopping": """
SELECT user_id,
       (((epoch_us(ts) // 900000000) - j) * 900000000)::BIGINT AS wstart_us,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js
GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_funnel": _osql().funnel_sql(
            ["view", "click", "purchase"], horizon_hours=72),
        "events_retention": _osql().retention_sql(7),
        "events_rolling": _osql().rolling_window_sql(7),
        "events_asof": """
WITH j AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT e.event_id,
       coalesce(j.o_orderkey, -1)::BIGINT AS o_orderkey,
       coalesce(j.o_totalprice, 0.0) AS o_totalprice
FROM events e LEFT JOIN j ON j.event_id = e.event_id AND j.rn = 1
ORDER BY e.event_id""",
        "rel_pricing": pricing_summary_sql(),
        "rel_shipping": shipping_priority_sql(),
        "rel_q5_volume": _q5_sql(),
        "rel_nation_revenue": NATION_REVENUE_SQL,
        "orders_range90d": """
SELECT l.o_orderkey, count(r.o_orderdate)::BIGINT AS n_orders_90d
FROM orders l JOIN orders r
  ON r.o_custkey = l.o_custkey
 AND r.o_orderdate > l.o_orderdate - INTERVAL 90 DAY
 AND r.o_orderdate <= l.o_orderdate
GROUP BY l.o_orderkey ORDER BY l.o_orderkey""",
    }
