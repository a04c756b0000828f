"""Poll the page-fault sentinel; record a SEQUENCE of clean-window
bench artifacts on recovery (full bench + both scaling pairs).

Generalizes tools/bench_watch.py: each job re-checks the sentinel
immediately before it starts (a window can close mid-sequence) and
its own end-sentinel after (bench.py embeds both for the default
record; scaling records get a wrapper sentinel pair). Jobs that
already produced their output file are skipped, so the watcher is
resumable across restarts.

Usage:  python tools/clean_watch.py [--poll-sec 240] [--max-hours 8]
"""
import argparse
import datetime
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _page_fault_sentinel  # noqa: E402

HEALTHY = 0.5

JOBS = [
    # (output path, argv tail, env overrides)
    ("/root/repo/BENCH_clean_r03b.json", [], {}),
    ("/root/repo/BENCH_clean_r03c.json", [], {}),
    ("/root/repo/BENCH_scaling_r03b.json", ["--scaling"],
     {"GRAFT_SCALE_CPUS_LO": "2", "GRAFT_SCALE_CPUS_HI": "8"}),
    ("/root/repo/BENCH_s2_r03b.json", ["--scaling"],
     {"GRAFT_SCALE_CPUS_LO": "8", "GRAFT_SCALE_CPUS_HI": "32"}),
    ("/root/repo/BENCH_flagship_scaling_r03.json",
     ["--scaling-flagship"],
     {"GRAFT_SCALE_CPUS_LO": "2", "GRAFT_SCALE_CPUS_HI": "8"}),
]


def log(msg: str) -> None:
    now = datetime.datetime.now().strftime("%H:%M:%S")
    print(f"[{now}] {msg}", flush=True)


def run_job(out: str, tail: list, env_over: dict) -> bool:
    env = dict(os.environ, **env_over)
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py", *tail],
        capture_output=True, text=True, cwd="/root/repo",
        timeout=5400, env=env)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
        else ""
    try:
        rec = json.loads(line)
    except (json.JSONDecodeError, IndexError):
        log(f"{out}: no JSON; stderr tail: {proc.stderr[-1500:]}")
        return False
    end_s = _page_fault_sentinel()
    if end_s >= HEALTHY:
        log(f"{out}: window degraded mid-run (end sentinel "
            f"{end_s:.3f}); discarding")
        return False
    rec.setdefault("page_fault_sentinel_sec", rec.get(
        "page_fault_sentinel_sec"))
    rec["page_fault_sentinel_end_sec"] = round(end_s, 3)
    with open(out, "w") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"{out}: clean record written (end sentinel {end_s:.3f})")
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll-sec", type=float, default=240.0)
    ap.add_argument("--max-hours", type=float, default=8.0)
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    pending = [j for j in JOBS if not os.path.exists(j[0])]
    while time.time() < deadline and pending:
        s = _page_fault_sentinel()
        log(f"sentinel {s:.3f}s; pending: "
            f"{[os.path.basename(p) for p, _, _ in pending]}")
        if s < HEALTHY:
            out, tail, env_over = pending[0]
            log(f"healthy window — running {os.path.basename(out)} "
                f"{tail}")
            try:
                if run_job(out, tail, env_over):
                    pending = [j for j in pending
                               if not os.path.exists(j[0])]
                    continue  # window still open: go straight on
            except subprocess.TimeoutExpired:
                log(f"{out}: job timed out")
        time.sleep(args.poll_sec)
    log("done" if not pending else "deadline reached with jobs pending")


if __name__ == "__main__":
    main()
