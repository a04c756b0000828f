"""graphscope_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the analytical capabilities of
GraphScope (reference: /root/reference, LDA111222/GraphScope v0.4.1) on
top of ``ray.data.Dataset`` pipelines + stateful partition actors:

- corpus ingest with content-sha256 row invariant and co-occurrence
  edge derivation (``graphscope_ray.ingest``)
- graph build: deterministic dense vertex ids, hash partitioning by
  source vertex, per-partition CSR-style edge layouts
  (``graphscope_ray.graph``)
- BSP vertex programs: PageRank, WCC, CDLP/LPA, SSSP, BFS, k-core,
  k-shell, HITS, eigenvector/Katz centrality
  (``graphscope_ray.algorithms``)
- join-based triangle counting / clustering coefficients
- training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine), ANN similarity search, text analysis,
  multimodal plumbing (``graphscope_ray.data``)

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the caller (tests, bench.py, or the verification driver).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of per-call
    mmap/munmap (glibc mallopt M_MMAP_THRESHOLD / M_TRIM_THRESHOLD).

    Without this, every large per-batch/per-round temporary re-faults
    fresh pages; on hosts with a slow page-fault path (memory
    ballooning/dedup — observed in this sandbox at ~5 MB/s of new
    pages) that turns vectorized kernels 100-1000x slower. With heap
    reuse the fault cost is paid once per worker at its high-water
    mark. Runs at import time so every Ray worker that imports the
    package is covered; a failure (musl, non-Linux) is silently
    ignored."""
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_malloc()
