"""Campaign 15: edge_link_features / khop_sample — random graphs
(dense, sparse, self-loops, duplicate edges, stars/hubs) vs DuckDB
twins and brute-force python oracles, across partitionings, fanouts
and hop counts."""
import sys

sys.path.insert(0, "/root/repo")
import collections

import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.hashing import walk_hash  # noqa: E402
from graphscope_ray.graph.api import (edge_link_features,  # noqa: E402
                                      khop_sample)


def rand_edges(rng, n, m, star=False):
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    if star:  # hub: vertex 0 connects to many
        e[: m // 2, 0] = 0
    if rng.random() < 0.3:  # duplicates + self-loops
        e = np.r_[e, e[: m // 4], np.array([[1, 1], [2, 2]])]
    return e


fails, trial = [], 0
rng = np.random.default_rng(15)
for trial in range(1, 41):
    tag = f"t{trial}"
    try:
        n = int(rng.integers(5, 80))
        m = int(rng.integers(3, 400))
        par = int(rng.integers(1, 7))
        e = rand_edges(rng, n, m, star=bool(rng.random() < 0.25))
        eds = ray.data.from_pandas(
            pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})).repartition(par)

        adj = collections.defaultdict(set)
        und = set()
        for a, b in e:
            if a != b:
                und.add((min(a, b), max(a, b)))
                adj[a].add(b)
                adj[b].add(a)

        # --- edge_link_features vs brute force AND DuckDB
        got = (edge_link_features(eds).to_pandas()
               .sort_values(["src", "dst"]).reset_index(drop=True))
        if len(got) != len(und):
            fails.append((tag, f"lf rows {len(got)} != {len(und)}")); continue
        ok = True
        for _, row in got.iterrows():
            u, v = int(row["src"]), int(row["dst"])
            c = len(adj[u] & adj[v])
            j = round(c / len(adj[u] | adj[v]), 6)
            if row["common_nbrs"] != c or abs(row["jaccard"] - j) > 5e-7:
                fails.append((tag, f"lf value at {(u, v)}")); ok = False
                break
        if not ok:
            continue
        con = duckdb.connect()
        con.register("raw", pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]}))
        w = con.execute("""
WITH e0 AS (SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst
            FROM raw WHERE src <> dst),
e AS (SELECT src s, dst t FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT s v, count(*) d FROM e GROUP BY s),
cm AS (SELECT a.t x, b.t y, count(*) c FROM e a JOIN e b
       ON a.s = b.s AND a.t < b.t GROUP BY a.t, b.t)
SELECT e0.src, e0.dst, COALESCE(cm.c,0)::BIGINT common_nbrs,
       round(COALESCE(cm.c,0)::DOUBLE/(du.d+dv.d-COALESCE(cm.c,0)),6) jaccard
FROM e0 LEFT JOIN cm ON cm.x=e0.src AND cm.y=e0.dst
JOIN deg du ON du.v=e0.src JOIN deg dv ON dv.v=e0.dst
ORDER BY src, dst""").df()
        if not ((got["common_nbrs"].to_numpy() == w["common_nbrs"].to_numpy()).all()
                and np.allclose(got["jaccard"], w["jaccard"], atol=0)):
            fails.append((tag, "lf vs sql")); continue

        # --- khop_sample vs python oracle
        hops = int(rng.integers(1, 4))
        fanout = int(rng.integers(1, 5))
        seed = int(rng.integers(0, 100))
        seeds = sorted(rng.choice(n, size=int(rng.integers(1, 4)),
                                  replace=False).tolist())
        got_k = khop_sample(eds, seeds, hops=hops, fanout=fanout,
                            seed=seed).to_pandas()
        frontier = set(int(s) for s in seeds)
        want = []
        for h in range(1, hops + 1):
            nxt = set()
            for u in sorted(frontier):
                nbrs = np.array(sorted(adj[u]), dtype=np.int64)
                if not len(nbrs):
                    continue
                sc = walk_hash(nbrs, np.full(len(nbrs), u, np.int64),
                               h, seed)
                for v in nbrs[np.lexsort((nbrs, sc))[:fanout]]:
                    want.append((h, u, int(v)))
                    nxt.add(int(v))
            frontier = nxt
            if not frontier:
                break
        if list(map(tuple, got_k[["hop", "src", "dst"]].to_numpy())) \
                != sorted(want):
            fails.append((tag, "khop vs python")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
