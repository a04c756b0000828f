"""job.py — the `ray job submit` entrypoint — driven in-process.

The analytics checkpoint/resume path is covered by
tests/test_bsp_algorithms.py; here the shard-resumable curate job is
pinned: one output dir per input shard, `_SUCCESS` markers, --resume
skipping finished shards without re-reading or re-writing them.
"""
import argparse
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data  # noqa: F401  (session fixture)


def _mk_shards(d, n_shards=3, docs_per=40):
    rows = 0
    for i in range(n_shards):
        df = pd.DataFrame({
            "doc_id": range(rows, rows + docs_per),
            "text": [f"the quick brown fox {j} jumps over it"
                     for j in range(docs_per)]})
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, f"documents-{i:03d}.parquet"))
        rows += docs_per
    return n_shards


def test_curate_shard_resume(ray_session, tmp_path):
    import job

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    n = _mk_shards(str(src))
    args = argparse.Namespace(sf_dir=str(src), out=str(out),
                              lang="en", min_quality=0.0, resume=False)
    m1 = job.cmd_curate(args)
    assert m1["n_shards"] == n and m1["shards_skipped"] == 0
    assert m1["kept_docs"] > 0
    # every shard dir has its marker
    for i in range(n):
        assert (out / f"shard={i:05d}" / "_SUCCESS").exists()

    # resume: nothing recomputed, outputs byte-identical
    mtimes = {p: p.stat().st_mtime_ns
              for p in out.rglob("*.parquet")}
    args.resume = True
    m2 = job.cmd_curate(args)
    assert m2["shards_skipped"] == n
    assert m2["kept_docs"] == m1["kept_docs"]
    for p, t in mtimes.items():
        assert p.stat().st_mtime_ns == t

    # partial failure: drop one shard's marker → only it re-runs
    (out / "shard=00001" / "_SUCCESS").unlink()
    m3 = job.cmd_curate(args)
    assert m3["shards_skipped"] == n - 1
    assert m3["kept_docs"] == m1["kept_docs"]


def test_curate_empty_dir_raises(ray_session, tmp_path):
    import job

    args = argparse.Namespace(sf_dir=str(tmp_path), out=str(tmp_path),
                              lang="en", min_quality=0.0, resume=False)
    with pytest.raises(FileNotFoundError):
        job.cmd_curate(args)
