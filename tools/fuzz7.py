"""Campaign 7: dedup family on random near-duplicate corpora —
minhash_lsh_dedup vs full SQL replay, exact_dedup vs SQL, union-find
vs WCC handoff equality."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, duckdb
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray.data import exact_dedup
from graphscope_ray.data.dedup import minhash_lsh_dedup, cluster_pairs
from graphscope_ray.oracle_sql import minhash_dedup_sql
import __ray_entry__ as entry

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
rng = np.random.default_rng(43)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 360:
    trial += 1
    n = int(rng.integers(2, 40))
    base_docs = []
    for _ in range(max(1, n // 3)):
        L = int(rng.integers(5, 40))
        base_docs.append(" ".join(rng.choice(WORDS, size=L)))
    texts = []
    for _ in range(n):
        b = base_docs[int(rng.integers(0, len(base_docs)))]
        r = rng.random()
        if r < 0.4:
            texts.append(b)                      # exact dup
        elif r < 0.7:
            toks = b.split()
            i = int(rng.integers(0, len(toks)))
            toks[i] = str(rng.choice(WORDS))     # near dup
            texts.append(" ".join(toks))
        else:
            L = int(rng.integers(5, 40))
            texts.append(" ".join(rng.choice(WORDS, size=L)))
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df)
    con = duckdb.connect(); con.register("documents", df)
    tag = f"t{trial} n={n}"
    try:
        got = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(entry.oracle_sql()["doc_exact_dedup"]).df()
        if not (np.array_equal(got["doc_id"], want["doc_id"])):
            fails.append((tag, "exact_dedup")); continue
        got = minhash_lsh_dedup(ds, threshold=0.9)
        got = (got.sort_values("doc_id").reset_index(drop=True)
               if hasattr(got, "sort_values") else got.to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = con.execute(minhash_dedup_sql(threshold=0.9)).df()
        if not (np.array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
                and np.array_equal(got["dup_group"].to_numpy(), want["dup_group"].to_numpy())):
            fails.append((tag, "minhash"))
        # union-find vs WCC handoff on random pair sets
        npair = int(rng.integers(1, 60))
        pr = pd.DataFrame({"a": rng.integers(0, 40, npair).astype(np.int64),
                           "b": rng.integers(0, 40, npair).astype(np.int64)})
        pr = pr[pr["a"] != pr["b"]].drop_duplicates().reset_index(drop=True)
        if len(pr):
            uf = cluster_pairs(pr).sort_values("doc_id").reset_index(drop=True)
            wc = cluster_pairs(pr, max_driver_pairs=0).sort_values("doc_id").reset_index(drop=True)
            if not uf.equals(wc): fails.append((tag, "uf_vs_wcc"))
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]: print(" ", f)
ray.shutdown()
