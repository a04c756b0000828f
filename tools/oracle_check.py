"""Local replica of the driver's correctness harness.

Runs every queries() entry at --sf against its oracle_sql() twin in
DuckDB and reports rows / column-name / value match — plus a DTYPE
check the driver may or may not apply (int64 vs float64 mismatches,
e.g. an uncast DuckDB HUGEINT sum, show up here before they can trip
the round gate).

Usage:  python tools/oracle_check.py [--sf /root/testdata/sf0.01] [keys...]
"""
import argparse
import glob
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import duckdb
    import numpy as np
    import pandas as pd

    import importlib
    m = importlib.import_module("__ray_entry__")

    con = duckdb.connect()
    for f in glob.glob(os.path.join(args.sf, "*.parquet")):
        t = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

    qs, osql = m.queries(), m.oracle_sql()
    keys = args.keys or sorted(qs)
    bad = []
    for k in keys:
        try:
            a = qs[k](args.sf)
            if not isinstance(a, pd.DataFrame):
                a = a.to_pandas()
            if k not in osql:
                print(f"{k:24s} rows={len(a):7d}  (no oracle)")
                continue
            b = con.execute(osql[k]).df()
            cols = sorted(a.columns)
            notes = []
            if sorted(b.columns) != cols:
                notes.append(f"SCHEMA {sorted(b.columns)} vs {cols}")
                bad.append(k)
            elif len(a) != len(b):
                notes.append(f"ROWS {len(a)} vs {len(b)}")
                bad.append(k)
            else:
                a2 = a[cols].sort_values(cols).reset_index(drop=True)
                b2 = b[cols].sort_values(cols).reset_index(drop=True)
                for c in cols:
                    if a2[c].dtype != b2[c].dtype:
                        notes.append(f"DTYPE[{c}] {a2[c].dtype} vs {b2[c].dtype}")
                    if np.issubdtype(a2[c].dtype, np.number):
                        d = (a2[c].astype(float) - b2[c].astype(float)).abs().max()
                        if not (np.isnan(d) and a2[c].isna().equals(b2[c].isna())) \
                                and d > 0:
                            notes.append(f"VAL[{c}] maxdiff={d}")
                    else:
                        if not a2[c].astype(str).equals(b2[c].astype(str)):
                            notes.append(f"VAL[{c}] differs")
                if any(n.startswith("VAL") or n.startswith("DTYPE")
                       for n in notes):
                    bad.append(k)
            print(f"{k:24s} rows={len(a):7d}  "
                  + ("OK" if not notes else "; ".join(notes)), flush=True)
        except Exception:
            bad.append(k)
            print(f"{k:24s} EXCEPTION", flush=True)
            traceback.print_exc()
    print(f"\n{len(keys) - len(set(bad))}/{len(keys)} clean; flagged: {sorted(set(bad))}")


if __name__ == "__main__":
    main()
