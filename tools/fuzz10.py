"""Campaign 10: corpus-curation family (data/curate.py) — randomized
documents (multi-script text, pathological whitespace, emails/numbers,
duplicated lines, near-identical prefixes) vs the DuckDB SQL twins in
oracle_sql, across random rates/seeds/budgets/window sizes and
partition counts."""
import string
import sys
import time

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
from graphscope_ray.data import curate  # noqa: E402

WORDS = ["the", "quick", "brown", "fox", "le", "chat", "der", "hund",
         "tokens", "data", "42", "x1", "email", "call", "line"]
# ASCII + RE2-\s whitespace + some unicode (NOT \x0b: RE2 \s excludes
# it and the twins tokenize with \s — documented input requirement)
FILLERS = [" ", "  ", "\t", "\n", "\n\n", "\r", "\f", " \t "]


def rand_doc(rng) -> str:
    parts = []
    for _ in range(int(rng.integers(0, 40))):
        r = rng.random()
        if r < 0.55:
            parts.append(str(rng.choice(WORDS)))
        elif r < 0.65:
            parts.append("u%d@ex%d.com" % (rng.integers(9), rng.integers(9)))
        elif r < 0.75:
            parts.append("".join(rng.choice(list(string.digits),
                                            size=int(rng.integers(1, 12)))))
        elif r < 0.85:
            parts.append("Ünïcode-Äß")
        else:
            parts.append("".join(rng.choice(
                list(string.ascii_letters + ".,!?<>@%-"),
                size=int(rng.integers(1, 8)))))
        parts.append(str(rng.choice(FILLERS)))
    return "".join(parts)


def canon(df, sort_cols):
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df.reindex(sorted(df.columns), axis=1)


def cmp(tag, got, want, sort_cols):
    got, want = canon(got, sort_cols), canon(want, sort_cols)
    if got.shape != want.shape or list(got.columns) != list(want.columns):
        return f"{tag}: shape {got.shape} vs {want.shape}"
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            if not np.allclose(a, b.astype(float), atol=0, rtol=0):
                return f"{tag}.{c}: value mismatch"
        elif not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all():
            return f"{tag}.{c}: value mismatch"
    return None


rng = np.random.default_rng(1010)
fails, trial, t0 = [], 0, time.time()
while time.time() - t0 < 360:
    trial += 1
    n_docs = int(rng.integers(2, 120))
    # duplicate/prefix-share some docs to stress dedup-ish paths
    texts = [rand_doc(rng) for _ in range(n_docs)]
    for _ in range(int(rng.integers(0, 4))):
        i, j = rng.integers(n_docs, size=2)
        texts[int(i)] = texts[int(j)] + str(rng.choice([""] + WORDS))
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(int(rng.choice([1, 3, 7])))
    con = duckdb.connect()
    con.register("documents", df)

    rate = float(rng.choice([0.0, 0.1, 0.5, 0.9, 1.0]))
    seed = int(rng.integers(1, 10_000))
    budget = int(rng.choice([1, 7, 64, 1000]))
    nwin = int(rng.choice([2, 3, 8, 20]))
    mod = int(rng.choice([2, 5, 20]))
    tag = f"t{trial} n={n_docs} rate={rate} seed={seed} b={budget} k={nwin}"

    checks = [
        ("sample",
         curate.hash_sample(ds, rate, seed=seed).to_pandas().drop(
             columns=["text"], errors="ignore"),
         f"SELECT doc_id FROM documents WHERE "
         f"({osql._row_hash_sql(seed)}) % 1000000 "
         f"< {int(round(rate * 1e6))} ORDER BY doc_id",
         ["doc_id"]),
        ("split", curate.split_assign(ds, seed=seed).to_pandas().drop(
            columns=["text"], errors="ignore"),
         osql.split_assign_sql(seed=seed), ["doc_id"]),
        ("normalize", curate.normalize_text(ds).to_pandas(),
         osql.NORMALIZE_SQL, ["doc_id"]),
        ("pii", curate.pii_scrub(ds).to_pandas(),
         osql.pii_scrub_sql(curate.EMAIL_PATTERN, curate.LONGNUM_PATTERN),
         ["doc_id"]),
        ("repetition", curate.repetition_stats(ds).to_pandas(),
         osql.REPETITION_SQL, ["doc_id"]),
        ("vocab", curate.vocab_topk(ds, k=20).to_pandas(),
         osql.vocab_topk_sql(20, curate.VOCAB_TOKEN_PATTERN),
         ["cnt", "token"]),
        ("packing", curate.pack_sequences(ds, budget).to_pandas(),
         osql.pack_sequences_sql(budget), ["doc_id"]),
    ]
    # decontaminate: bench = doc_id % mod == 0

    def bf(t):
        import pyarrow as pa
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % mod == 0))

    bench = ds.map_batches(bf, batch_format="pyarrow")
    checks.append(("decon",
                   curate.decontaminate(ds, bench, n=nwin).to_pandas(),
                   osql.decontaminate_sql(n=nwin, bench_mod=mod),
                   ["doc_id"]))

    for name, got, sql, sort_cols in checks:
        want = con.sql(sql).df()
        if got.empty and want.empty:
            continue
        if got.empty != want.empty:
            fails.append(f"{tag} {name}: one side empty "
                         f"({len(got)} vs {len(want)})")
            print("FAIL", fails[-1], flush=True)
            continue
        err = cmp(f"{tag} {name}", got, want, sort_cols)
        if err:
            fails.append(err)
            print("FAIL", err, flush=True)
    con.close()

print(f"trials={trial} fails={len(fails)}")
ray.shutdown()
sys.exit(1 if fails else 0)
