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
    corpus = ray.data.read_parquet(corpus_path)
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
