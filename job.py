"""Cluster job entrypoint — the north rule's ``ray job submit`` surface.

On a real cluster (fixed N or 4N nodes), submit from any client:

    ray job submit --working-dir . -- python job.py analytics \
        --sf-dir /shared/tables --out /shared/results \
        --checkpoint-dir /shared/ckpt --resume

    ray job submit --working-dir . -- python job.py flagship \
        --n-files 1000000 --out /shared/results

    ray job submit --working-dir . -- python job.py curate \
        --sf-dir /shared/tables --out /shared/curated

In this sandbox the same commands run against the local Ray
(``RAY_ADDRESS=local`` is preset). The job owns its Ray session (the
library never calls ray.init); results stream to partitioned parquet
via ``io.write_context`` (resumable output layout), and ONE summary
JSON line goes to stdout for the submitting client's log tail.

Preemption story: ``analytics --checkpoint-dir D`` checkpoints every
superstep (per-partition state + lineage.json); re-submitting the same
command with ``--resume`` continues from the last complete round
instead of restarting the app.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _init_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)


def _write(ds, out: str, name: str) -> str:
    from graphscope_ray.io import write_context
    dest = os.path.join(out, name)
    write_context(ds, dest)
    return dest


def cmd_analytics(a) -> dict:
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.pipelines.partgraph import partgraph_edges

    t0 = time.perf_counter()
    g = Graph.from_edges(
        partgraph_edges(a.sf_dir).materialize(),
        workdir=os.path.join(a.out, "graph"),
        weight_col="weight", symmetrize=True)
    build_s = time.perf_counter() - t0
    eng = g.engine
    metrics: dict = {"build_sec": round(build_s, 3)}
    ckpt = dict(checkpoint_dir=a.checkpoint_dir,
                checkpoint_every=1, resume=a.resume) \
        if a.checkpoint_dir else {}
    for app in a.apps.split(","):
        t0 = time.perf_counter()
        if app == "pagerank":
            res = g.to_oid(eng.pagerank(tol=a.tol, **(
                {**ckpt, "checkpoint_dir":
                 os.path.join(a.checkpoint_dir, "pagerank")}
                if ckpt else {})))
        elif app == "wcc":
            res = g.to_oid(eng.wcc(**(
                {**ckpt, "checkpoint_dir":
                 os.path.join(a.checkpoint_dir, "wcc")} if ckpt else {})),
                vid_cols=("vid", "comp"))
        elif app == "cdlp":
            res = g.to_oid(eng.cdlp(max_round=10),
                           vid_cols=("vid", "label"))
        elif app == "triangles":
            res = g.to_oid(eng.triangles())
        else:
            raise SystemExit(f"unknown app {app!r}")
        _write(res, a.out, app)
        metrics[f"{app}_sec"] = round(time.perf_counter() - t0, 3)
    metrics["supersteps"] = eng.supersteps
    metrics["superstep_sec"] = round(eng.superstep_seconds, 3)
    g.save()
    return metrics


def cmd_flagship(a) -> dict:
    from graphscope_ray.pipelines.flagship import flagship_pagerank
    t0 = time.perf_counter()
    g, out_ds = flagship_pagerank(a.n_files,
                                  workdir=os.path.join(a.out, "work"))
    _write(out_ds, a.out, "pagerank")
    return {"n_files": a.n_files,
            "total_sec": round(time.perf_counter() - t0, 3),
            "supersteps": g.engine.supersteps}


def cmd_curate(a) -> dict:
    """Shard-resumable curation: one output directory per input
    parquet shard (`shard=<i>/` + `_SUCCESS` marker) — a preempted or
    failed run re-submitted with ``--resume`` skips finished shards
    entirely (neither re-reads nor re-writes them). At 10^12-file
    scale the input is millions of shards, so this is the difference
    between restarting a day of work and restarting one shard."""
    import glob as _glob

    import ray.data
    from graphscope_ray.pipelines.curation import curate
    t0 = time.perf_counter()
    shards = sorted(_glob.glob(f"{a.sf_dir}/documents*.parquet"))
    if not shards:
        raise FileNotFoundError(f"no documents*.parquet in {a.sf_dir}")
    kept_total, skipped = 0, 0
    for i, path in enumerate(shards):
        sdir = os.path.join(a.out, f"shard={i:05d}")
        marker = os.path.join(sdir, "_SUCCESS")
        if a.resume and os.path.exists(marker):
            skipped += 1
            continue
        # a shard without its marker is incomplete: wipe any partial
        # files so the rewrite can't double rows
        import shutil
        shutil.rmtree(sdir, ignore_errors=True)
        docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
        kept = curate(docs, lang=a.lang, min_quality=a.min_quality)
        kept.write_parquet(sdir)
        with open(marker, "w") as f:
            f.write("")
    import ray.data as rd
    kept_total = rd.read_parquet(
        a.out, file_extensions=["parquet"]).count()
    return {"kept_docs": kept_total, "n_shards": len(shards),
            "shards_skipped": skipped,
            "total_sec": round(time.perf_counter() - t0, 3)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pa = sub.add_parser("analytics", help="partgraph + graph apps")
    pa.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pa.add_argument("--apps", default="pagerank,wcc,cdlp,triangles")
    pa.add_argument("--tol", type=float, default=1e-6)
    pa.add_argument("--checkpoint-dir", default=None)
    pa.add_argument("--resume", action="store_true")
    pa.add_argument("--out", default="/tmp/gsr-job-analytics")

    pf = sub.add_parser("flagship", help="corpus -> sha256 -> pagerank")
    pf.add_argument("--n-files", type=int, default=2000)
    pf.add_argument("--out", default="/tmp/gsr-job-flagship")

    pc = sub.add_parser("curate", help="fused curation pipeline")
    pc.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pc.add_argument("--lang", default="en")
    pc.add_argument("--min-quality", type=float, default=0.1)
    pc.add_argument("--out", default="/tmp/gsr-job-curate")
    pc.add_argument("--resume", action="store_true",
                    help="skip shards whose _SUCCESS marker exists")

    a = p.parse_args()
    _init_ray()
    import ray
    try:
        metrics = {"analytics": cmd_analytics, "flagship": cmd_flagship,
                   "curate": cmd_curate}[a.cmd](a)
        print(json.dumps({"job": a.cmd, "out": a.out, **metrics}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
