"""Campaign 12: duplicated_spans / domain_mixture / training_order —
randomized corpora (small vocabularies to force cross-doc span
collisions, duplicated and prefix-shared docs, pathological whitespace)
vs BOTH the DuckDB SQL twins and an independent pure-Python-int oracle
for the span counts, across k, seeds, rates and partition counts."""
import re
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray import oracle_sql as osql  # noqa: E402
from graphscope_ray.data.curate import domain_mixture, training_order  # noqa: E402
from graphscope_ray.data.dedup import duplicated_spans  # noqa: E402

M64 = 1 << 64
B = 1099511628211
F = 14695981039346656037
_WS = re.compile(r"[\t\n\f\r ]+")


def fmix(h):
    h ^= h >> 31
    h = (h * 0x2545F4914F6CDD1D) % M64
    h ^= h >> 29
    h = (h * 0x5851F42D4C957F2D) % M64
    return h ^ (h >> 32)


def spans_of(text, k):
    hs = []
    for tok in _WS.split(text):
        if not tok:
            continue
        h = F
        for ch in tok:
            h = (h * B + ord(ch) + 1) % M64
        hs.append(fmix(h))
    if not hs:
        return {0}
    keff = min(k, len(hs))
    out = set()
    for i in range(len(hs) - keff + 1):
        acc = 0
        for h in hs[i:i + keff]:
            acc = (acc * B + h) % M64
        out.add(acc)
    return out


def brute_spans(texts, k):
    ss = [spans_of(t, k) for t in texts]
    holders = Counter(h for s in ss for h in s)
    return pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "spans": [len(s) for s in ss],
        "dup_spans": [sum(1 for h in s if holders[h] >= 2) for s in ss]})


WORDS = ["a", "b", "cc", "dd", "token", "Ü-ß", "42", "x,y"]
FILLERS = [" ", "  ", "\t", "\n", "\r", "\f", " \t\n"]


def rand_doc(rng):
    parts = []
    for _ in range(int(rng.integers(0, 30))):
        parts.append(str(rng.choice(WORDS)))
        parts.append(str(rng.choice(FILLERS)))
    return "".join(parts)


rng = np.random.default_rng(1212)
fails, trial, t0 = [], 0, time.time()
while time.time() - t0 < 300:
    trial += 1
    n = int(rng.integers(2, 100))
    texts = [rand_doc(rng) for _ in range(n)]
    for _ in range(int(rng.integers(0, 5))):  # force exact/prefix dups
        i, j = rng.integers(n, size=2)
        texts[int(i)] = texts[int(j)] + str(rng.choice([""] + WORDS))
    doms = [f"d{int(x)}" for x in rng.integers(0, 5, size=n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts, "source": doms})
    ds = ray.data.from_pandas(df).repartition(int(rng.choice([1, 3, 8])))
    con = duckdb.connect()
    con.register("documents", df)

    k = int(rng.choice([1, 2, 5, 8, 16]))
    seed = int(rng.integers(1, 10_000))
    rates = {f"d{i}": float(rng.choice([0.0, 0.3, 0.7, 1.0]))
             for i in range(int(rng.integers(0, 5)))}
    dflt = float(rng.choice([0.0, 0.5, 1.0]))
    tag = f"t{trial} n={n} k={k} seed={seed}"

    # 1. duplicated_spans vs int oracle AND SQL twin
    got = duplicated_spans(ds, k=k).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = brute_spans(texts, k)
    if not (got[["doc_id", "spans", "dup_spans"]].to_numpy()
            == want.to_numpy()).all():
        fails.append(f"{tag} spans-vs-int")
        print("FAIL", fails[-1], flush=True)
    sqlw = con.execute(osql.span_dedup_sql(k=k)).df()
    if not ((got["spans"].to_numpy() == sqlw["spans"].to_numpy()).all()
            and (got["dup_spans"].to_numpy()
                 == sqlw["dup_spans"].to_numpy()).all()):
        fails.append(f"{tag} spans-vs-sql")
        print("FAIL", fails[-1], flush=True)

    # 2. domain_mixture vs int oracle and SQL twin
    gm = domain_mixture(ds.select_columns(["doc_id", "source"]), rates,
                        default_rate=dflt, seed=seed).to_pandas()
    gm_ids = sorted(gm["doc_id"]) if "doc_id" in gm.columns else []
    keep = [i for i, d in zip(df.doc_id, df.source)
            if fmix((int(i) * B + seed) % M64) % 1_000_000
            < int(round(rates.get(d, dflt) * 1_000_000))]
    if gm_ids != keep:
        fails.append(f"{tag} mix-vs-int")
        print("FAIL", fails[-1], flush=True)
    wm = con.execute(osql.domain_mixture_sql(
        rates, default_rate=dflt, seed=seed)).df()
    if sorted(wm["doc_id"]) != keep:
        fails.append(f"{tag} mix-sql-vs-int")
        print("FAIL", fails[-1], flush=True)

    # 3. training_order vs int oracle
    go = training_order(ds.select_columns(["doc_id"]), seed=seed) \
        .to_pandas()
    stamps = np.array([fmix((i * B + seed) % M64) for i in range(n)],
                      dtype=np.uint64).astype(np.int64)
    if not (go["doc_id"].to_numpy()
            == np.argsort(stamps, kind="stable")).all():
        fails.append(f"{tag} order-vs-int")
        print("FAIL", fails[-1], flush=True)
    con.close()

print(f"trials={trial} fails={len(fails)}")
ray.shutdown()
sys.exit(1 if fails else 0)
