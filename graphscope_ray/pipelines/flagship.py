"""Flagship corpus pipeline (BASELINE.json north star, end to end):

synthetic source-code corpus (repo, path, commit, lang, content)
→ content-sha256 row invariant → co-occurrence edge derivation
→ dense vertex ids → partitioned graph build → PageRank to 1e-6
→ (file oid, rank) result.
"""

from __future__ import annotations

import os

import ray.data

from graphscope_ray.corpus import write_corpus
from graphscope_ray.ingest import derive_edges, with_sha256
from graphscope_ray.graph.api import Graph


def flagship_pagerank(
    n_files: int = 2000,
    *,
    workdir: str = "/tmp/gsr-flagship",
    num_parts: int | None = None,
    tol: float = 1e-6,
    hub_threshold: int | None = 512,
):
    os.makedirs(workdir, exist_ok=True)
    corpus_path = write_corpus(
        os.path.join(workdir, f"corpus-{n_files}.parquet"), n_files=n_files
    )
    # ~4 read blocks per CPU: Ray's default minimum parallelism (200)
    # would split this corpus into hundreds of ~2k-row blocks and the
    # sha256 pass into as many ~4 ms tasks — pure dispatch overhead
    # (a measured, parallelism-independent ~2 s slice of the 2→8
    # scaling gap)
    import ray as _ray
    if _ray.is_initialized():
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    else:  # standalone call: read_parquet auto-inits later
        cpus = os.cpu_count() or 8
    nblocks = 4 * max(1, cpus)
    corpus = ray.data.read_parquet(corpus_path,
                                   override_num_blocks=nblocks)
    corpus = with_sha256(corpus)  # row invariant rides along
    edges = derive_edges(corpus)
    g = Graph.from_edges(
        edges,
        workdir=os.path.join(workdir, "graph"),
        num_parts=num_parts,
        weight_col="weight",
        symmetrize=True,
        hub_threshold=hub_threshold,
    )
    pr = g.pagerank(tol=tol)
    out = g.to_oid(pr)
    return g, out
