"""Campaign 13: tfidf_rows / tfidf_vectors / topk_per_group /
column_profile — randomized corpora and tables (tie storms, empty and
whitespace-only docs, null columns, singleton groups, adversarial
duplicate scores) vs DuckDB twins and an independent pure-Python
TF-IDF oracle, across dims, k, quantile sets and partition counts."""
import re
import sys
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

from graphscope_ray.oracle_sql import tfidf_sql  # noqa: E402
from graphscope_ray.data.text import tfidf_rows, tfidf_vectors  # noqa: E402
from graphscope_ray.data.curate import topk_per_group  # noqa: E402
from graphscope_ray.data.profile import column_profile  # noqa: E402
from graphscope_ray.util import round_half_away  # noqa: E402

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


def py_tf(text, dim):
    c = Counter()
    for tok in _WS.split(text):
        if tok:
            h = F
            for ch in tok:
                h = (h * B + ord(ch) + 1) % M64
            c[fmix(h) % dim] += 1
    return c


def rand_docs(rng, n):
    vocab = [f"w{i}" for i in range(int(rng.integers(3, 60)))]
    texts = []
    for _ in range(n):
        kind = rng.integers(0, 10)
        if kind == 0:
            texts.append("")
        elif kind == 1:
            texts.append(" \t \n ")
        else:
            texts.append(" ".join(
                rng.choice(vocab, size=int(rng.integers(1, 40)))))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


fails, trial = [], 0
rng = np.random.default_rng(13)
for trial in range(1, 61):
    tag = f"t{trial}"
    try:
        n = int(rng.integers(2, 120))
        dim = int(rng.choice([8, 16, 64, 256]))
        par = int(rng.integers(1, 9))
        docs = rand_docs(rng, n)
        ds = ray.data.from_pandas(docs).repartition(par)

        # --- tfidf_rows vs DuckDB twin AND pure-python oracle
        got = (tfidf_rows(ds, dim=dim).to_pandas()
               .sort_values(["doc_id", "slot"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(tfidf_sql(dim)).df()
        if not (len(got) == len(want)
                and (got["doc_id"].to_numpy()
                     == want["doc_id"].to_numpy()).all()
                and (got["slot"].to_numpy()
                     == want["slot"].to_numpy()).all()
                and (got["tf"].to_numpy() == want["tf"].to_numpy()).all()
                and (got["tfidf"].to_numpy()
                     == want["tfidf"].to_numpy()).all()):
            fails.append((tag, "tfidf_rows vs sql")); continue
        tfs = [py_tf(t, dim) for t in docs["text"]]
        dfv = Counter()
        for c in tfs:
            dfv.update(c.keys())
        exp = {(i, s): c for i, cc in enumerate(tfs)
               for s, c in cc.items()}
        got_map = {(d, s): t for d, s, t in
                   zip(got["doc_id"], got["slot"], got["tf"])}
        if exp != got_map:
            fails.append((tag, "tfidf_rows vs python")); continue

        # --- dense vectors vs the sparse rows
        m = np.zeros((n, dim))
        idf = np.log((n + 1.0) / (np.array(
            [dfv.get(s, 0) for s in range(dim)]) + 1.0)) + 1.0
        for (i, s), c in exp.items():
            m[i, s] = c * idf[s]
        vec = (tfidf_vectors(ds, dim=dim, l2_normalize=False)
               .to_pandas().sort_values("doc_id"))
        mv = np.stack(vec["embedding"].to_numpy())
        if not np.allclose(mv, m):
            fails.append((tag, "tfidf_vectors")); continue

        # --- topk_per_group vs row_number()
        gn = int(rng.integers(1, 20))
        k = int(rng.integers(1, 6))
        tbl = pd.DataFrame({
            "grp": rng.choice([f"g{i}" for i in range(gn)], size=n),
            "score": rng.choice(
                np.round(rng.random(max(1, n // 4)), 2), size=n),
            "id": rng.permutation(n).astype(np.int64)})
        tk = topk_per_group(
            ray.data.from_pandas(tbl).repartition(par),
            group="grp", score="score", key="id", k=k).to_pandas()
        tk = tk[["grp", "score", "id", "rn"]].sort_values(
            ["grp", "rn"]).reset_index(drop=True)
        con2 = duckdb.connect()
        con2.register("t", tbl)
        wt = con2.execute(f"""
          SELECT grp, score, id, rn FROM (
            SELECT grp, score, id, row_number() OVER (
              PARTITION BY grp ORDER BY score DESC, id) AS rn FROM t)
          WHERE rn <= {k} ORDER BY grp, rn""").df()
        if not tk.astype(wt.dtypes.to_dict()).equals(wt):
            fails.append((tag, "topk_per_group")); continue

        # --- column_profile vs quantile_disc (with nulls)
        x = rng.integers(-50, 50, size=n).astype(np.float64)
        nulls = rng.random(n) < 0.15
        xs = pd.array(np.where(nulls, np.nan, x))
        pdf = pd.DataFrame({"x": xs})
        prof = column_profile(
            ray.data.from_pandas(pdf).repartition(par), "x").to_pandas()
        con3 = duckdb.connect()
        con3.register("p", pdf)
        wp = con3.execute("""
          SELECT count(*)::BIGINT AS n,
                 (count(*) - count(x))::BIGINT AS nulls,
                 min(x) AS min, max(x) AS max, round(avg(x), 6) AS mean,
                 quantile_disc(x, 0.25) AS q25,
                 quantile_disc(x, 0.50) AS q50,
                 quantile_disc(x, 0.75) AS q75,
                 quantile_disc(x, 0.90) AS q90,
                 quantile_disc(x, 0.99) AS q99
          FROM p""").df()
        if nulls.all():
            if int(prof["nulls"][0]) != n:
                fails.append((tag, "profile all-null")); continue
        elif not prof.astype(wp.dtypes.to_dict()).equals(wp):
            fails.append((tag, "column_profile")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
