"""Campaign 14: chunk_text / bigram_topk / kmeans_assign / funnel —
randomized corpora (unicode, empty/whitespace docs, size/overlap
grids), gaussian + degenerate embeddings (duplicate points, k > n
clusters hit), and adversarial event streams (ties, reversed order,
horizon edges) vs DuckDB twins and independent numpy oracles."""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.curate import (VOCAB_TOKEN_PATTERN, bigram_topk,
                                        chunk_text)  # noqa: E402
from graphscope_ray.data.similarity import kmeans_assign  # noqa: E402
from graphscope_ray.data.temporal import funnel  # noqa: E402
from graphscope_ray.oracle_sql import (bigram_topk_sql, chunk_text_sql,
                                       funnel_sql, kmeans_sql)  # noqa: E402
from graphscope_ray.util import round_half_away  # noqa: E402

ALPH = list("ab xy01 \n\t") + ["ü", "é", "中", " "]


def rand_docs(rng, n):
    texts = []
    for _ in range(n):
        kind = rng.integers(0, 8)
        if kind == 0:
            texts.append("")
        elif kind == 1:
            texts.append("   \t\n")
        else:
            texts.append("".join(
                rng.choice(ALPH, size=int(rng.integers(1, 200)))))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


fails, trial = [], 0
rng = np.random.default_rng(14)
for trial in range(1, 61):
    tag = f"t{trial}"
    try:
        n = int(rng.integers(2, 80))
        par = int(rng.integers(1, 7))
        docs = rand_docs(rng, n)
        ds = ray.data.from_pandas(docs).repartition(par)
        con = duckdb.connect()
        con.register("documents", docs)

        # --- chunk_text vs substr twin + python reassembly oracle
        step_sz = int(rng.integers(2, 40))
        ov = int(rng.integers(0, step_sz))
        got = (chunk_text(ds, size=step_sz, overlap=ov).to_pandas()
               .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        want = con.execute(chunk_text_sql(step_sz, ov)).df()
        if not (len(got) == len(want)
                and (got["doc_id"].to_numpy()
                     == want["doc_id"].to_numpy()).all()
                and (got["pos"].to_numpy() == want["pos"].to_numpy()).all()
                and (got["chunk"] == want["chunk"]).all()):
            fails.append((tag, "chunk vs sql")); continue
        st = step_sz - ov
        for did, grp in got.groupby("doc_id"):
            grp = grp.sort_values("chunk_id")
            full = "".join([grp["chunk"].iloc[0]]
                           + [c[ov:] for c in grp["chunk"].iloc[1:]])
            if full != docs["text"][did]:
                fails.append((tag, f"chunk reassembly doc {did}")); break
        else:
            pass

        # --- bigram_topk vs twin (ordered)
        k = int(rng.integers(1, 30))
        bg = bigram_topk(ds, k=k).to_pandas().reset_index(drop=True)
        wb = con.execute(bigram_topk_sql(k, VOCAB_TOKEN_PATTERN)).df()
        if not (len(bg) == len(wb)
                and (bg["bigram"] == wb["bigram"]).all()
                and (bg["cnt"].to_numpy() == wb["cnt"].to_numpy()).all()):
            fails.append((tag, "bigram vs sql")); continue

        # --- kmeans vs unrolled twin AND numpy Lloyd's
        nv = int(rng.integers(4, 120))
        dim = int(rng.choice([2, 8, 32]))
        kk = int(rng.integers(2, min(9, nv)))
        iters = int(rng.integers(1, 4))
        X = rng.normal(size=(nv, dim)).astype(np.float32)
        if rng.random() < 0.3:  # duplicate points → distance ties
            X[: nv // 2] = X[0]
        emb = pd.DataFrame({"vec_id": np.arange(nv, dtype=np.int64),
                            "embedding": list(X)})
        km = (kmeans_assign(
            ray.data.from_pandas(emb).repartition(par),
            k=kk, iters=iters).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
        cone = duckdb.connect()
        cone.register("embeddings", emb)
        wk = cone.execute(kmeans_sql(kk, iters, dim)).df()
        if not (km["cluster"].to_numpy() == wk["cluster"].to_numpy()).all():
            fails.append((tag, "kmeans vs sql")); continue
        X64 = X.astype(np.float64)
        cents = X64[:kk].copy()
        assign = None
        for it in range(iters):
            d = round_half_away(np.sqrt(
                ((X64[:, None, :] - cents[None]) ** 2).sum(-1)), 6)
            assign = np.argmin(d, axis=1)
            if it == iters - 1:
                break
            for c in range(kk):
                if (assign == c).any():
                    cents[c] = X64[assign == c].mean(axis=0)
        if not (km["cluster"].to_numpy() == assign).all():
            fails.append((tag, "kmeans vs numpy")); continue

        # --- funnel vs chained-CTE twin
        ne = int(rng.integers(4, 200))
        nu = int(rng.integers(1, 12))
        nsteps = int(rng.integers(1, 4))
        steps = [f"s{i}" for i in range(nsteps)]
        types = steps + ["zz"]
        base = np.datetime64("2024-01-01", "us")
        ev = pd.DataFrame({
            "user_id": rng.integers(0, nu, size=ne).astype(np.int64),
            "ts": base + rng.integers(0, 3 * 72 * 3600,
                                      size=ne).astype("timedelta64[s]"),
            "event_type": rng.choice(types, size=ne)})
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        fn = (funnel(ray.data.from_pandas(ev).repartition(par), steps)
              .to_pandas().sort_values("user_id").reset_index(drop=True))
        conf = duckdb.connect()
        conf.register("events", ev)
        wf = conf.execute(funnel_sql(steps, 72)).df()
        if not (len(fn) == len(wf)
                and (fn["user_id"].to_numpy()
                     == wf["user_id"].to_numpy()).all()
                and (fn["steps_completed"].to_numpy()
                     == wf["steps_completed"].to_numpy()).all()):
            fails.append((tag, "funnel vs sql")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
