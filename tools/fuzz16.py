"""Campaign 16: ppr / cluster_sample / quality_classifier — random
graphs (incl. hub-split stores and disconnected seeds), degenerate
embeddings, adversarial unicode texts vs numpy power iteration and
DuckDB twins."""
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.similarity import cluster_sample  # noqa: E402
from graphscope_ray.data.text import quality_classifier  # noqa: E402
from graphscope_ray.graph.build import build_graph  # noqa: E402
from graphscope_ray.graph.engine import BSPEngine  # noqa: E402
from graphscope_ray.oracle_sql import (cluster_sample_sql,  # noqa: E402
                                       quality_classifier_sql)

ALPH = list("ab xy01 \n\t.,!?") + ["ü", "é", "中", "9", "Z"]


def edges_ds(e):
    return ray.data.from_pandas(pd.DataFrame(
        {"src": e[:, 0].astype(np.int64),
         "dst": e[:, 1].astype(np.int64)}))


fails, trial = [], 0
rng = np.random.default_rng(16)
for trial in range(1, 31):
    tag = f"t{trial}"
    try:
        # --- ppr vs numpy power iteration (plain + hub store)
        n = int(rng.integers(8, 60))
        m = int(rng.integers(n, n * 4))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        e = e[e[:, 0] != e[:, 1]]
        if not len(e):
            continue
        P = int(rng.integers(1, 5))
        hub = int(rng.choice([0, 3])) or None
        seeds = sorted(rng.choice(n, size=int(rng.integers(1, 4)),
                                  replace=False).tolist())
        rounds = int(rng.integers(1, 6))
        with tempfile.TemporaryDirectory() as td:
            store = build_graph(edges_ds(e), td + "/s", num_parts=P,
                                num_vertices=n, symmetrize=True,
                                hub_threshold=hub)
            eng = BSPEngine(store)
            out = eng.ppr(seeds, delta=0.85, max_round=rounds).to_pandas()
            got = np.zeros(n)
            got[out["vid"].to_numpy()] = out["rank"].to_numpy()
            eng.shutdown()
        und = set()
        for a, b in e:
            und.add((a, b)); und.add((b, a))
        A = np.zeros((n, n))
        for a, b in und:
            A[a, b] = 1.0
        outdeg = A.sum(axis=1)
        Pm = np.divide(A, outdeg[:, None], out=np.zeros_like(A),
                       where=outdeg[:, None] > 0)
        base = np.zeros(n)
        base[seeds] = 1.0 / len(seeds)
        r = base.copy()
        for _ in range(rounds):
            r = 0.15 * base + 0.85 * (Pm.T @ r)
        if not np.allclose(got, r, atol=1e-12):
            fails.append((tag, f"ppr P={P} hub={hub}")); continue

        # --- cluster_sample vs SQL twin
        nv = int(rng.integers(6, 120))
        dim = int(rng.choice([4, 16]))
        kk = int(rng.integers(2, min(7, nv)))
        mm = int(rng.integers(1, 6))
        X = rng.normal(size=(nv, dim)).astype(np.float32)
        if rng.random() < 0.3:
            X[: nv // 2] = X[0]
        emb = pd.DataFrame({"vec_id": np.arange(nv, dtype=np.int64),
                            "embedding": list(X)})
        cs = (cluster_sample(
            ray.data.from_pandas(emb).repartition(
                int(rng.integers(1, 5))),
            k=kk, iters=2, m=mm, seed=3).to_pandas()
            [["cluster", "coin", "vec_id", "rn"]]
            .sort_values(["cluster", "rn"]).reset_index(drop=True))
        cone = duckdb.connect()
        cone.register("embeddings", emb)
        wcs = cone.execute(cluster_sample_sql(kk, 2, mm, 3, dim)).df()
        if not (len(cs) == len(wcs) and all(
                (cs[c].to_numpy() == wcs[c].to_numpy()).all()
                for c in cs.columns)):
            fails.append((tag, "cluster_sample vs sql")); continue

        # --- quality_classifier vs SQL twin on adversarial texts
        nd = int(rng.integers(2, 60))
        texts = []
        for _ in range(nd):
            kind = rng.integers(0, 6)
            if kind == 0:
                texts.append("")
            elif kind == 1:
                texts.append("123456 7890 00" * int(rng.integers(1, 9)))
            else:
                texts.append("".join(
                    rng.choice(ALPH, size=int(rng.integers(1, 300)))))
        docs = pd.DataFrame({"doc_id": np.arange(nd, dtype=np.int64),
                             "text": texts})
        qc = (quality_classifier(
            ray.data.from_pandas(docs).repartition(3)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
        cond = duckdb.connect()
        cond.register("documents", docs)
        wq = cond.execute(quality_classifier_sql()).df()
        if not ((qc["score"].to_numpy() == wq["score"].to_numpy()).all()
                and (qc["keep"].to_numpy() == wq["keep"].to_numpy()).all()):
            fails.append((tag, "classifier vs sql")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
