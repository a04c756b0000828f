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
