"""Benchmark harness (driver-run; BASELINE.md protocol).

Default mode: builds the canonical co-occurrence graph over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and times the headline
pipelines — PageRank to 1e-6 convergence (superstep loop only, matching
the reference's harness which times ``worker->Query()`` only:
/root/reference/analytical_engine/benchmarks/basic_graph_benchmarks.cc:67-71),
WCC and CDLP to completion, triangle counting — then prints ONE JSON
line.

``--scaling``: runs the same job in two fresh processes at
RAY_GRAFT_CPUS=8 and =32 and reports PageRank edge-throughput at both
plus scaling efficiency = (eps_32 / eps_8) / 4 (the sandbox analogue of
the N→4N-node rule; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _page_fault_sentinel() -> float:
    """Seconds to first-touch a fresh 200 MB numpy buffer. The sandbox
    host intermittently services new anonymous-page faults ~1000x slow
    (BASELINE.md "measurement-environment caveat"); a healthy machine
    returns < 0.2 s, a degraded window returns tens of seconds. The
    value is reported alongside the timings so a reader can tell
    whether a run understates the engine."""
    import numpy as np
    t0 = time.perf_counter()
    buf = np.empty(25_000_000, dtype=np.float64)
    buf[:] = 1.0
    return round(time.perf_counter() - t0, 3)


def run_bench() -> dict:
    import ray
    import ray.data

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sentinel = _page_fault_sentinel()

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)  # keep stdout = exactly one JSON line
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from graphscope_ray.graph.api import Graph, triangle_total
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    # warm the page cache so we measure compute+shuffle, not cold reads
    _ = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet").count()

    queries: dict = {}
    t0 = time.perf_counter()
    edges = partgraph_edges(sf_dir).materialize()
    queries["build_derive"] = round(time.perf_counter() - t0, 3)
    t1 = time.perf_counter()
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-bench-{num_cpus}",
        weight_col="weight",
        symmetrize=True,
        # P=16 beats P=32 at sf0.1 scale: per-round barrier cost grows
        # with P while per-partition compute is tiny (measured:
        # 14 ms vs 51 ms per superstep)
        num_parts=min(num_cpus, 16),
        hub_threshold=8192,
    )
    queries["build_store"] = round(time.perf_counter() - t1, 3)
    t1 = time.perf_counter()
    eng = g.engine  # actor pool up
    queries["build_pool"] = round(time.perf_counter() - t1, 3)
    queries["build"] = round(time.perf_counter() - t0, 3)

    E = g.store.meta["num_edges"]  # symmetrized edge count

    base_s = eng.superstep_seconds
    base_n = eng.supersteps
    pr = g.pagerank(delta=0.85, tol=1e-6)
    pr_rows = pr.count()
    pr_sec = eng.superstep_seconds - base_s
    pr_steps = eng.supersteps - base_n
    queries["pagerank_tol1e6"] = round(pr_sec, 3)
    queries["pagerank_supersteps"] = pr_steps
    eps = E * pr_steps / pr_sec if pr_sec > 0 else 0.0
    queries["pagerank_edges_per_sec"] = round(eps, 1)

    base_s = eng.superstep_seconds
    wc = g.wcc()
    wc_rows = wc.count()
    queries["wcc"] = round(eng.superstep_seconds - base_s, 3)

    base_s = eng.superstep_seconds
    cd = g.cdlp(max_round=10)
    cd_rows = cd.count()
    queries["cdlp10"] = round(eng.superstep_seconds - base_s, 3)

    t0 = time.perf_counter()
    tv = eng.triangles()  # local-closing actor path (r03 default)
    tc = int(tv.sum("tri_cnt")) // 3
    queries["triangles"] = round(time.perf_counter() - t0, 3)
    queries["triangle_total"] = tc

    # the routed-probe path (the >64M-oriented-edge scale shape) —
    # forced via local_keys_limit=0 so its number stays on record
    t0 = time.perf_counter()
    tv_r = eng.triangles(local_keys_limit=0)
    tc_routed = int(tv_r.sum("tri_cnt")) // 3
    queries["triangles_routed_path"] = round(time.perf_counter() - t0, 3)
    assert tc_routed == tc, (tc_routed, tc)

    # keep the standalone broadcast path measured for comparison
    t0 = time.perf_counter()
    tc_bc = triangle_total(edges.select_columns(["src", "dst"]),
                           num_partitions=min(num_cpus, 32))
    queries["triangles_broadcast_path"] = round(time.perf_counter() - t0, 3)
    assert tc_bc == tc, (tc_bc, tc)

    # the Dataset.join scale path (what actually runs at 100x) — forced
    # via broadcast_edge_limit=0 so its number is on record (r01 VERDICT)
    t0 = time.perf_counter()
    tc_join = triangle_total(edges.select_columns(["src", "dst"]),
                             num_partitions=min(num_cpus, 32),
                             broadcast_edge_limit=0)
    queries["triangles_join_path"] = round(time.perf_counter() - t0, 3)
    assert tc_join == tc, (tc_join, tc)

    assert pr_rows == wc_rows == cd_rows == g.store.num_vertices

    # spanning forest + maximal matching (session-8 extension ops) —
    # sparse-exchange loops on the same resident pool
    try:
        t0 = time.perf_counter()
        msf_edges = g.msf().count()
        queries["msf"] = round(time.perf_counter() - t0, 3)
        queries["msf_edges"] = msf_edges
        t0 = time.perf_counter()
        queries["matching_pairs"] = g.matching().count()
        queries["matching"] = round(time.perf_counter() - t0, 3)
    except NotImplementedError:
        pass  # hub-split store at this scale — not wired for msf/mm

    from graphscope_ray.graph.api import degree_assortativity
    t0 = time.perf_counter()
    queries["assortativity_r"] = float(
        degree_assortativity(edges.select_columns(["src", "dst"]))
        ["assortativity"].iloc[0])
    queries["assortativity"] = round(time.perf_counter() - t0, 3)

    # -- training-data ops (first-class alongside the graph headline;
    # not part of the headline metric, reported for BASELINE tracking)
    from graphscope_ray.data import minhash_lsh_dedup
    from graphscope_ray.data.text import bpe_token_count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]).materialize()
    n_docs = docs.count()
    t0 = time.perf_counter()
    dedup_res = minhash_lsh_dedup(docs, threshold=0.9)
    if hasattr(dedup_res, "__len__"):  # pandas (small)
        clustered = len(dedup_res)
        n_groups = dedup_res["dup_group"].nunique() if clustered else 0
    else:  # Dataset (scale route)
        clustered = dedup_res.count()
        n_groups = len(dedup_res.unique("dup_group")) if clustered else 0
    queries["minhash_dedup"] = round(time.perf_counter() - t0, 3)
    queries["minhash_docs_per_sec"] = round(
        n_docs / max(queries["minhash_dedup"], 1e-9), 1)
    # docs that belong to a duplicate cluster, and docs surviving dedup
    # (one representative kept per cluster) — r02's "kept_docs" counted
    # the former under the latter's name
    queries["minhash_clustered_docs"] = clustered
    queries["minhash_kept_docs"] = n_docs - clustered + n_groups

    t0 = time.perf_counter()
    ntok = int(bpe_token_count(docs).sum("n_bpe_tokens"))
    queries["bpe_tokens"] = round(time.perf_counter() - t0, 3)
    queries["bpe_tokens_per_sec"] = round(
        ntok / max(queries["bpe_tokens"], 1e-9), 1)

    # BM25 retrieval scoring (stats fold + stateless scoring pass)
    from graphscope_ray.data import bm25_scores, mg_topk
    t0 = time.perf_counter()
    n_scored = bm25_scores(docs, ["join", "hash", "vector"]).count()
    queries["bm25"] = round(time.perf_counter() - t0, 3)
    queries["bm25_docs_per_sec"] = round(
        n_docs / max(queries["bm25"], 1e-9), 1)
    queries["bm25_scored_docs"] = n_scored

    # Misra-Gries two-pass exact top-k (the no-shuffle vocab path)
    t0 = time.perf_counter()
    _, mg_info = mg_topk(docs, k=100, capacity=4096)
    queries["mg_topk"] = round(time.perf_counter() - t0, 3)
    queries["mg_topk_guaranteed"] = bool(mg_info["guaranteed"])

    # fused one-pass curation (langid + quality gate + exact dedup +
    # token count — pipelines/curation.py)
    from graphscope_ray.pipelines.curation import curate
    t0 = time.perf_counter()
    kept_docs = curate(docs, lang="en", min_quality=0.1).count()
    queries["curation"] = round(time.perf_counter() - t0, 3)
    queries["curation_docs_per_sec"] = round(
        n_docs / max(queries["curation"], 1e-9), 1)
    queries["curation_kept_docs"] = kept_docs

    # corpus-trained bigram-LM quality score (r03 session 6): two
    # corpus passes (count tables) + attach + per-doc reduce
    from graphscope_ray.data.text import lm_score
    t0 = time.perf_counter()
    lm_rows = lm_score(docs).count()
    queries["lm_score"] = round(time.perf_counter() - t0, 3)
    queries["lm_score_docs_per_sec"] = round(
        lm_rows / max(queries["lm_score"], 1e-9), 1)

    # DSIR importance resampling (r05): one corpus pass + O(vocab)
    # exchanges + top-frac selection (needs the source column the
    # other stages drop)
    from graphscope_ray.data.curate import dsir_select
    docs_src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"])
    t0 = time.perf_counter()
    dsir_rows = dsir_select(docs_src, ["src0", "src1"], 0.2).count()
    queries["dsir"] = round(time.perf_counter() - t0, 3)
    queries["dsir_docs_per_sec"] = round(
        n_docs / max(queries["dsir"], 1e-9), 1)
    queries["dsir_selected"] = dsir_rows

    # cross-document duplicated-span detection (r03 session 3)
    from graphscope_ray.data.dedup import duplicated_spans
    t0 = time.perf_counter()
    sp = duplicated_spans(docs, k=8)
    span_dup_docs = sp.filter(expr="dup_spans > 0").count()
    queries["span_dedup"] = round(time.perf_counter() - t0, 3)
    queries["span_dedup_docs_per_sec"] = round(
        n_docs / max(queries["span_dedup"], 1e-9), 1)
    queries["span_dup_docs"] = span_dup_docs

    # hashed TF-IDF dense vectorization (r03 session 3)
    from graphscope_ray.data.text import tfidf_vectors
    t0 = time.perf_counter()
    n_vec_docs = tfidf_vectors(docs, dim=256).count()
    queries["tfidf_vectorize"] = round(time.perf_counter() - t0, 3)
    queries["tfidf_docs_per_sec"] = round(
        n_docs / max(queries["tfidf_vectorize"], 1e-9), 1)
    assert n_vec_docs == n_docs

    # overlapping chunking (context prep, r03 session 4)
    from graphscope_ray.data.curate import chunk_text
    t0 = time.perf_counter()
    n_chunks = chunk_text(docs, size=512, overlap=64).count()
    queries["chunking"] = round(time.perf_counter() - t0, 3)
    queries["chunking_docs_per_sec"] = round(
        n_docs / max(queries["chunking"], 1e-9), 1)
    queries["n_chunks"] = n_chunks

    # corpus bigram statistics (r03 session 4)
    from graphscope_ray.data.curate import bigram_topk
    t0 = time.perf_counter()
    bigram_topk(docs, k=100).count()
    queries["bigrams_top100"] = round(time.perf_counter() - t0, 3)
    queries["bigrams_docs_per_sec"] = round(
        n_docs / max(queries["bigrams_top100"], 1e-9), 1)

    # exact cosine kNN graph over the embeddings table (k=5)
    from graphscope_ray.data.similarity import knn_graph
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"]) \
        .materialize()
    n_vecs = emb.count()
    t0 = time.perf_counter()
    knn_edges = knn_graph(emb, k=5).count()
    queries["knn_graph"] = round(time.perf_counter() - t0, 3)
    queries["knn_vecs_per_sec"] = round(
        n_vecs / max(queries["knn_graph"], 1e-9), 1)
    assert knn_edges == n_vecs * 5, (knn_edges, n_vecs)

    # per-edge link-prediction features: resident-pool route (default)
    # + the Dataset broadcast route for path-ordering evidence
    from graphscope_ray.graph.api import edge_link_features
    t0 = time.perf_counter()
    n_lf = g.engine.link_features().count()
    queries["link_features"] = round(time.perf_counter() - t0, 3)
    queries["link_features_edges_per_sec"] = round(
        n_lf / max(queries["link_features"], 1e-9), 1)
    t0 = time.perf_counter()
    edge_link_features(edges.select_columns(["src", "dst"])).count()
    queries["link_features_dataset_path"] = round(
        time.perf_counter() - t0, 3)

    # distributed k-means over the embeddings (k=8, 3 iterations)
    from graphscope_ray.data.similarity import kmeans_assign
    t0 = time.perf_counter()
    n_assigned = kmeans_assign(emb, k=8, iters=3).count()
    queries["kmeans"] = round(time.perf_counter() - t0, 3)
    queries["kmeans_vecs_per_sec"] = round(
        n_vecs / max(queries["kmeans"], 1e-9), 1)
    assert n_assigned == n_vecs

    # ordered funnel over the event stream
    from graphscope_ray.data.temporal import funnel
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"]) \
        .materialize()
    n_events = ev.count()
    t0 = time.perf_counter()
    funnel(ev, ["view", "click", "purchase"]).count()
    queries["funnel"] = round(time.perf_counter() - t0, 3)
    queries["funnel_events_per_sec"] = round(
        n_events / max(queries["funnel"], 1e-9), 1)

    # personalized PageRank (seed-restart on the superstep engine);
    # seeds = real oids from the edge table
    seed_oids = [r["src"] for r in edges.take(3)]
    t0 = time.perf_counter()
    g.ppr(seed_oids, max_round=10).count()
    queries["ppr10"] = round(time.perf_counter() - t0, 3)
    queries["ppr_edges_per_sec"] = round(
        10 * E / max(queries["ppr10"], 1e-9), 1)

    # deterministic k-hop fanout sampling (GNN mini-batch shape)
    from graphscope_ray.graph.api import khop_sample
    kh_seeds = sorted({r["src"] for r in edges.take(200)})
    t0 = time.perf_counter()
    n_kh = khop_sample(edges.select_columns(["src", "dst"]),
                       seeds=kh_seeds, hops=2, fanout=10).count()
    queries["khop"] = round(time.perf_counter() - t0, 3)
    queries["khop_rows"] = n_kh

    # frozen-weight logistic quality classifier (model-inference shape)
    from graphscope_ray.data.text import quality_classifier
    t0 = time.perf_counter()
    n_cls = quality_classifier(docs).count()
    queries["classifier"] = round(time.perf_counter() - t0, 3)
    queries["classifier_docs_per_sec"] = round(
        n_cls / max(queries["classifier"], 1e-9), 1)

    # mergeable sketches: global HLL registers + count-min counts
    from graphscope_ray.data.sketch import cms_counts, hll_registers
    t0 = time.perf_counter()
    hll_registers(docs, p=12)
    queries["hll_p12"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    cms_counts(docs, d=4, w=4096)
    queries["cms_4x4096"] = round(time.perf_counter() - t0, 3)
    queries["sketch_docs_per_sec"] = round(
        2 * n_docs / max(queries["hll_p12"] + queries["cms_4x4096"],
                         1e-9), 1)

    # GIE-lite traversal: 2-hop + bucketed group_count + grouped sum
    # over the TPC-H customer→order→part labeled graph
    from graphscope_ray.gie import PropertyGraph
    import pyarrow as pa
    import pyarrow.compute as _pc

    def _enc_ord(t):
        return pa.table({
            "src": _pc.add(_pc.multiply(t["o_custkey"], 4), 0),
            "dst": _pc.add(_pc.multiply(t["o_orderkey"], 4), 1),
            "label": pa.array(["places"] * len(t), pa.string()),
            "qty": pa.nulls(len(t), pa.float64())})

    def _enc_li(t):
        return pa.table({
            "src": _pc.add(_pc.multiply(t["l_orderkey"], 4), 1),
            "dst": _pc.add(_pc.multiply(t["l_partkey"], 4), 2),
            "label": pa.array(["contains"] * len(t), pa.string()),
            "qty": t["l_quantity"]})

    gie_edges = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
        .map_batches(_enc_ord, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_quantity"])
            .map_batches(_enc_li, batch_format="pyarrow"))
        .materialize())
    gie_verts = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]) \
        .map_batches(lambda t: pa.table({
            "id": _pc.add(_pc.multiply(t["c_custkey"], 4), 0),
            "label": pa.array(["customer"] * len(t), pa.string())}),
            batch_format="pyarrow").materialize()
    n_gie_edges = gie_edges.count()
    pg = PropertyGraph(gie_verts, gie_edges)
    t0 = time.perf_counter()
    pg.V("customer").out("places").out("contains").group_count() \
        .count()
    pg.E("contains").group_agg("e_dst", "e_qty", "sum").count()
    queries["gie_traversal"] = round(time.perf_counter() - t0, 3)
    queries["gie_edges_per_sec"] = round(
        2 * n_gie_edges / max(queries["gie_traversal"], 1e-9), 1)

    # flagship north-star pipeline (BASELINE.json): synthetic code
    # corpus → sha256 row invariant → fused co-occurrence derivation →
    # graph build → PageRank to 1e-6 (r02 VERDICT #2's wall-time
    # datum). The corpus parquet is pre-written OUTSIDE the timer
    # (write_corpus is idempotent), so the stage times the pipeline,
    # not the data generator.
    from graphscope_ray.corpus import write_corpus
    from graphscope_ray.pipelines.flagship import flagship_pagerank
    n_files = 20_000
    fw = "/tmp/gsr-bench-flagship"
    write_corpus(os.path.join(fw, f"corpus-{n_files}.parquet"),
                 n_files=n_files)
    t0 = time.perf_counter()
    fg, fpr = flagship_pagerank(n_files=n_files, workdir=fw)
    n_rank = fpr.count()
    queries["flagship"] = round(time.perf_counter() - t0, 3)
    queries["flagship_files_per_sec"] = round(
        n_files / max(queries["flagship"], 1e-9), 1)
    queries["flagship_vertices"] = n_rank
    fg.close()

    total = (queries["pagerank_tol1e6"] + queries["wcc"]
             + queries["cdlp10"] + queries["triangles"])
    out = {
        "metric": "partgraph pagerank(1e-6)+wcc+cdlp10+triangles seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "num_vertices": g.store.num_vertices,
        "num_edges_directed": E,
        # start AND end sentinels: the host's degraded page-fault
        # windows can open or close mid-run, so a single healthy probe
        # does not certify the whole record (observed 2026-08-19: start
        # sentinel 0.056 s yet build/PR stages ran ~6x slow).
        "page_fault_sentinel_sec": sentinel,
        "page_fault_sentinel_end_sec": _page_fault_sentinel(),
    }
    g.close()
    ray.shutdown()
    return out


def run_scaling_job() -> dict:
    """One scaling-run child: big deterministic synthetic graph,
    P = num_cpus partitions (the reference's own scale-out protocol
    likewise grows fragments with workers: ``mpirun -n N``), PageRank
    for a fixed number of rounds; reports edges/sec of the superstep
    loop. Result identity across partition counts is separately proven
    by the partition-invariance tests (tests/test_bsp_algorithms.py).

    The graph is sized so per-round per-partition compute dominates
    the BSP barrier — the regime a real deployment operates in."""
    import ray
    import ray.data

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    V = int(os.environ.get("GRAFT_SCALE_V", 500_000))
    E = int(os.environ.get("GRAFT_SCALE_E", 128_000_000))
    rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", 20))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)  # keep stdout = exactly one JSON line
    ray.data.DataContext.get_current().enable_progress_bars = False

    from graphscope_ray.graph.api import Graph
    from graphscope_ray.synth import synth_edge_dataset

    t0 = time.perf_counter()
    edges = synth_edge_dataset(V, E)
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-scale-{num_cpus}",
        oid_space=False,            # already dense vids
        num_vertices=V,
        num_parts=num_cpus,         # fragments track workers (mpirun -n N)
        hub_threshold=1_000_000,
    )
    build = time.perf_counter() - t0
    eng = g.engine
    g.pagerank(max_round=2)         # warm actors / page cache
    s0, n0 = eng.superstep_seconds, eng.supersteps
    g.pagerank(max_round=rounds)
    sec = eng.superstep_seconds - s0
    steps = eng.supersteps - n0
    E_actual = g.store.meta["num_edges"]
    eps = E_actual * steps / sec if sec > 0 else 0.0
    out = {
        "num_cpus": num_cpus, "V": V, "E": E_actual, "rounds": steps,
        "build_sec": round(build, 1), "superstep_sec": round(sec, 3),
        "edges_per_sec": round(eps, 1),
    }
    g.close()
    ray.shutdown()
    return out


def run_scaling_data_job() -> dict:
    """The data-pipeline scaling child: fused curation + MinHash-LSH
    dedup over a deterministic synthetic corpus (~108k docs from
    corpus.synth_corpus_table — no external data), docs/sec at this
    process's parallelism level. Generation time is excluded."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    # big enough that per-stage fixed costs (~1-2 s of task spin-up)
    # do not drown the parallel fraction at the high level: 150k docs
    # reads 0.60-0.66 minhash efficiency (fixed-cost-bound), the SAME
    # code reads 0.851 at 1M docs (BENCH_scaling_r03d/r04b) — size the
    # default so the pipeline sets the wall-time
    n_files = int(os.environ.get("GRAFT_SCALE_DOCS", "1000000"))
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from graphscope_ray.corpus import synth_corpus_table
    from graphscope_ray.data import minhash_lsh_dedup
    from graphscope_ray.pipelines.curation import curate

    tab = synth_corpus_table(n_files, seed=9)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(tab.num_rows, dtype=np.int64)),
        "text": tab["content"],
    })).repartition(num_cpus * 2).materialize()
    n_docs = docs.count()

    t0 = time.perf_counter()
    curate(docs, lang="en", min_quality=0.1).count()
    cur_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = minhash_lsh_dedup(docs, threshold=0.9)
    # pandas below the row cap, Dataset on the scale route
    _ = len(res) if hasattr(res, "index") else res.count()
    mh_sec = time.perf_counter() - t0

    out = {
        "num_cpus": num_cpus, "n_docs": n_docs,
        "curation_sec": round(cur_sec, 3),
        "curation_docs_per_sec": round(n_docs / max(cur_sec, 1e-9), 1),
        "minhash_sec": round(mh_sec, 3),
        "minhash_docs_per_sec": round(n_docs / max(mh_sec, 1e-9), 1),
    }
    ray.shutdown()
    return out


def run_scaling_tri_job() -> dict:
    """Triangles scaling child — the COMPUTE-BOUND counterpoint to the
    DRAM-bandwidth-bound superstep loop: wedge intersection does O(Σd²)
    integer work per byte moved, so it keeps scaling past the ~8-core
    memory-system ceiling that flattens PageRank edges/sec on one box
    (BASELINE.md "DRAM ceiling"). Times the SECOND run (per-actor
    scratch already faulted; warm ≈ compute — the first-touch
    protocol in README "performance shape")."""
    import ray
    import ray.data

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    V = int(os.environ.get("GRAFT_SCALE_TRI_V", 200_000))
    E = int(os.environ.get("GRAFT_SCALE_TRI_E", 16_000_000))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    ray.data.DataContext.get_current().enable_progress_bars = False

    from graphscope_ray.graph.api import Graph
    from graphscope_ray.synth import synth_edge_dataset

    edges = synth_edge_dataset(V, E)
    g = Graph.from_edges(
        edges,
        workdir=f"/tmp/gsr-scale-tri-{num_cpus}",
        oid_space=False,
        num_vertices=V,
        num_parts=num_cpus,
        symmetrize=True,
        hub_threshold=1_000_000,
    )
    eng = g.engine
    total0 = int(eng.triangles().sum("tri_cnt"))  # warm scratch + cache
    t0 = time.perf_counter()
    total = int(eng.triangles().sum("tri_cnt"))
    sec = time.perf_counter() - t0
    assert total == total0
    out = {
        "num_cpus": num_cpus, "V": V,
        "E_undirected": g.store.meta["num_edges"] // 2,
        "triangles_sec": round(sec, 3),
        "triangle_total": total // 3,
        "tri_per_sec": round(total / 3 / max(sec, 1e-9), 1),
    }
    g.close()
    ray.shutdown()
    return out


def run_scaling_flagship_job() -> dict:
    """Flagship (north-star) pipeline scaling child: synthetic code
    corpus → sha256 row invariant → fused co-occurrence derivation →
    graph build → PageRank to 1e-6 — the EXACT pipeline the north rule
    measures, end to end, at one parallelism level. The corpus parquet
    is pre-written outside the timer (write_corpus is idempotent)."""
    import ray
    import ray.data

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
    # Size so the PIPELINE, not the harness, sets the wall-time: below
    # ~1M files the ~10 s of size-independent Ray session / actor-pool
    # / exchange-barrier latency dominates and the efficiency reading
    # is an artifact of job launch (r04 sweep in BASELINE.md: 0.45 at
    # 360k, 0.54 at 1M, 0.69 at 3M — the criterion's real cluster
    # processes the same 100 TB at both sizes, so W >> F always).
    # 3M ≈ 23 s at 8 CPUs / 65 s at 2.
    n_files = int(os.environ.get("GRAFT_SCALE_FLAGSHIP_FILES",
                                 "3000000"))

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    ray.data.DataContext.get_current().enable_progress_bars = False

    from graphscope_ray.corpus import write_corpus
    from graphscope_ray.pipelines.flagship import flagship_pagerank

    fw = f"/tmp/gsr-scale-flagship-{n_files}"
    write_corpus(os.path.join(fw, f"corpus-{n_files}.parquet"),
                 n_files=n_files)
    t0 = time.perf_counter()
    fg, fpr = flagship_pagerank(
        n_files=n_files, workdir=fw,
        num_parts=num_cpus)
    n_rank = fpr.count()
    sec = time.perf_counter() - t0
    out = {
        "num_cpus": num_cpus, "n_files": n_files,
        "flagship_sec": round(sec, 3),
        "flagship_vertices": n_rank,
        "flagship_files_per_sec": round(n_files / max(sec, 1e-9), 1),
    }
    fg.close()
    ray.shutdown()
    return out


def run_child(ncpu: int, extra=()) -> dict:
    """Fresh process at the given parallelism level. ``ray.init(
    num_cpus=N)`` only gates Ray's scheduler bookkeeping — resident
    actors still run on every physical core — so the child is ALSO
    pinned to N physical cores with taskset, making the two-level
    comparison a genuine hardware-parallelism experiment."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    cmd = [sys.executable, os.path.abspath(__file__), *extra]
    import shutil as _sh
    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"scaling child {extra} at {ncpu} CPUs failed "
            f"(rc={proc.returncode}): {proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    if "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_job()))
        return
    if "--scaling-data-child" in sys.argv:
        print(json.dumps(run_scaling_data_job()))
        return
    if "--scaling-tri-child" in sys.argv:
        print(json.dumps(run_scaling_tri_job()))
        return
    if "--scaling-flagship-child" in sys.argv:
        print(json.dumps(run_scaling_flagship_job()))
        return
    if "--scaling-flagship" in sys.argv:
        # flagship pair only (the north-star pipeline at N and 4N)
        lo = int(os.environ.get("GRAFT_SCALE_CPUS_LO", 2))
        hi = int(os.environ.get("GRAFT_SCALE_CPUS_HI", 8))
        sent0 = _page_fault_sentinel()
        f_lo = run_child(lo, ["--scaling-flagship-child"])
        f_hi = run_child(hi, ["--scaling-flagship-child"])
        sent1 = _page_fault_sentinel()
        eff = ((f_hi["flagship_files_per_sec"]
                / f_lo["flagship_files_per_sec"]) / (hi / lo)
               if f_lo["flagship_files_per_sec"] else 0.0)
        print(json.dumps({
            "metric": f"flagship files/sec scaling {lo}→{hi} CPUs "
                      "(corpus→sha256→derive→build→PageRank 1e-6)",
            "cpus_lo": lo, "cpus_hi": hi,
            "n_files": f_hi["n_files"],
            "flagship_sec_lo": f_lo["flagship_sec"],
            "flagship_sec_hi": f_hi["flagship_sec"],
            "files_per_sec_lo": f_lo["flagship_files_per_sec"],
            "files_per_sec_hi": f_hi["flagship_files_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "page_fault_sentinel_sec": sent0,
            "page_fault_sentinel_end_sec": sent1,
        }))
        return
    if "--scaling" in sys.argv:
        # N and 4N CPUs, both physically pinned (taskset). Default 2→8:
        # the superstep loop is DRAM-bandwidth-bound above ~8 cores on a
        # single box (each extra node in a real cluster brings its own
        # memory system; extra cores here do not) — see BASELINE.md.
        lo = int(os.environ.get("GRAFT_SCALE_CPUS_LO", 2))
        hi = int(os.environ.get("GRAFT_SCALE_CPUS_HI", 8))
        r_lo = run_child(lo, ["--scaling-child"])
        r_hi = run_child(hi, ["--scaling-child"])
        eps_lo = r_lo["edges_per_sec"]
        eps_hi = r_hi["edges_per_sec"]
        eff = (eps_hi / eps_lo) / (hi / lo) if eps_lo else 0.0
        # second scaling datum: the data-pipeline shape (fused
        # curation + minhash dedup docs/sec) at the same two levels.
        # A child failure must not discard the pagerank datum above.
        try:
            d_lo = run_child(lo, ["--scaling-data-child"])
            d_hi = run_child(hi, ["--scaling-data-child"])
        except Exception as e:  # noqa: BLE001 — report, keep pagerank row
            print(f"scaling-data child failed: {e}", file=sys.stderr)
            d_lo = d_hi = {"n_docs": 0, "curation_docs_per_sec": 0,
                           "minhash_docs_per_sec": 0}
        # third scaling datum: triangles — compute-bound, shows the
        # engine keeps scaling where the superstep loop hits the
        # single-box DRAM ceiling.
        try:
            t_lo = run_child(lo, ["--scaling-tri-child"])
            t_hi = run_child(hi, ["--scaling-tri-child"])
        except Exception as e:  # noqa: BLE001
            print(f"scaling-tri child failed: {e}", file=sys.stderr)
            t_lo = t_hi = {"tri_per_sec": 0, "triangles_sec": 0.0}
        # fourth scaling datum: the flagship north-star pipeline end
        # to end (corpus → sha256 → derive → build → PageRank 1e-6)
        try:
            f_lo = run_child(lo, ["--scaling-flagship-child"])
            f_hi = run_child(hi, ["--scaling-flagship-child"])
        except Exception as e:  # noqa: BLE001
            print(f"scaling-flagship child failed: {e}", file=sys.stderr)
            f_lo = f_hi = {"flagship_files_per_sec": 0,
                           "flagship_sec": 0.0}

        def _eff(a, b):
            return round((b / a) / (hi / lo), 3) if a else 0.0

        print(json.dumps({
            "metric": f"pagerank edges/sec scaling {lo}→{hi} CPUs "
                      "(P=num_cpus, synthetic graph)",
            "cpus_lo": lo, "cpus_hi": hi,
            "edges_per_sec_lo": eps_lo, "edges_per_sec_hi": eps_hi,
            "superstep_sec_lo": r_lo["superstep_sec"],
            "superstep_sec_hi": r_hi["superstep_sec"],
            "V": r_hi["V"], "E": r_hi["E"], "rounds": r_hi["rounds"],
            "scaling_efficiency": round(eff, 3),
            "data_n_docs": d_hi["n_docs"],
            "curation_docs_per_sec_lo": d_lo["curation_docs_per_sec"],
            "curation_docs_per_sec_hi": d_hi["curation_docs_per_sec"],
            "curation_scaling_efficiency": _eff(
                d_lo["curation_docs_per_sec"],
                d_hi["curation_docs_per_sec"]),
            "minhash_docs_per_sec_lo": d_lo["minhash_docs_per_sec"],
            "minhash_docs_per_sec_hi": d_hi["minhash_docs_per_sec"],
            "minhash_scaling_efficiency": _eff(
                d_lo["minhash_docs_per_sec"],
                d_hi["minhash_docs_per_sec"]),
            "triangles_sec_lo": t_lo["triangles_sec"],
            "triangles_sec_hi": t_hi["triangles_sec"],
            "triangles_scaling_efficiency": _eff(
                t_lo["tri_per_sec"], t_hi["tri_per_sec"]),
            "flagship_sec_lo": f_lo["flagship_sec"],
            "flagship_sec_hi": f_hi["flagship_sec"],
            "flagship_scaling_efficiency": _eff(
                f_lo["flagship_files_per_sec"],
                f_hi["flagship_files_per_sec"]),
        }))
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
