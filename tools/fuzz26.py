"""Campaign 26: session-8 operators — node2vec walks vs a sequential
single-walker replay of the ES-argmax rule; bm25_scores vs a pure
numpy replay; degree_assortativity vs networkx; coarsening (matching
contraction) vs a pandas replay — across graph/corpus shapes, p/q,
k1/b, partition counts."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

import networkx as nx  # noqa: E402

from graphscope_ray.data.hashing import walk_hash  # noqa: E402
from graphscope_ray.data.text import bm25_scores  # noqa: E402
from graphscope_ray.graph.api import (Graph, contract_edges,  # noqa: E402
                                      degree_assortativity)
from graphscope_ray.graph.node2vec import node2vec_walks  # noqa: E402
from graphscope_ray.util import round_half_away  # noqa: E402

fails = []
rng = np.random.default_rng(26)
TWO_M53 = 2.0 ** -53


def rand_edges(tr, weighted=False):
    n = int(tr.integers(5, 120))
    m = int(tr.integers(4, max(5, n * 3)))
    src = tr.integers(0, n, m)
    dst = tr.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if not len(src):
        return None
    df = pd.DataFrame({"src": np.minimum(src, dst),
                       "dst": np.maximum(src, dst)})
    df = df.drop_duplicates()
    if weighted:
        df["weight"] = tr.integers(1, 6, len(df)).astype(np.float64)
    return df.reset_index(drop=True)


def replay_walks(df, seeds, length, p, q, seed):
    adj = {}
    for s, d in zip(df["src"], df["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    out, wid = [], 0
    for sv in sorted(set(int(x) for x in seeds)):
        prev, cur = None, sv
        out.append((wid, 0, cur))
        for hop in range(1, length + 1):
            cands = sorted(adj.get(cur, ()))
            if not cands:
                break
            best = None
            for c in cands:
                alpha = (1.0 if prev is None else
                         1.0 / p if c == prev else
                         1.0 if c in adj.get(prev, ()) else 1.0 / q)
                h = walk_hash(np.array([c], np.int64),
                              np.array([wid], np.int64), hop, seed)[0]
                u = max(float(int(h) >> 11) * TWO_M53, TWO_M53)
                es = float(round_half_away(np.log(u) / alpha, 9))
                k = (-es, c)
                if best is None or k < best[0]:
                    best = (k, c)
            prev, cur = cur, best[1]
            out.append((wid, hop, cur))
        wid += 1
    return out


def trial_node2vec(i, tr):
    df = rand_edges(tr)
    if df is None or not len(df):
        return
    P = int(tr.choice([1, 2, 4]))
    pq = tr.choice([0, 1, 2])
    p, q = [(2.0, 0.5), (0.5, 2.0), (1.0, 1.0)][pq]
    L = int(tr.integers(1, 7))
    sd = int(tr.integers(1, 100))
    verts = np.unique(np.r_[df["src"], df["dst"]])
    seeds = tr.choice(verts, size=min(4, len(verts)), replace=False)
    ds = ray.data.from_pandas(df).repartition(P)
    got = node2vec_walks(ds, seeds, length=L, p=p, q=q,
                         seed=sd).to_pandas()
    want = replay_walks(df, seeds, L, p, q, sd)
    gl = list(zip(got["walk_id"].astype(int), got["hop"].astype(int),
                  got["vid"].astype(int)))
    if gl != want:
        fails.append((i, "node2vec", P, (p, q), L, sd))


def trial_bm25(i, tr):
    vocab = int(tr.integers(5, 200))
    n_docs = int(tr.integers(3, 120))
    wpd = int(tr.integers(1, 40))
    ids = tr.integers(0, vocab, size=(n_docs, wpd))
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    if n_docs > 2:
        texts[1] = ""
    df = pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})
    terms = [f"w{int(t)}" for t in
             tr.choice(vocab + 2, size=int(tr.integers(1, 5)),
                       replace=False)]
    k1 = float(tr.choice([0.8, 1.2, 1.6]))
    b = float(tr.choice([0.0, 0.4, 0.75]))
    blocks = int(tr.choice([1, 2, 5]))
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = bm25_scores(ds, terms, k1=k1, b=b).to_pandas()
    # all-empty pandas blocks drop their schema (documented Ray wart)
    got_map = ({} if not len(got) else
               dict(zip(got["doc_id"].astype(int), got["score"])))
    # numpy replay
    toks = df["text"].str.findall(r"[a-z0-9]+")
    n = len(df)
    avgdl = float(int(toks.str.len().sum())) / float(n)
    dfv = {t: int(toks.apply(lambda L: t in L).sum()) for t in terms}
    want = {}
    for doc, L in zip(df["doc_id"], toks):
        dl, s, hit = float(len(L)), 0, False
        for t in sorted(set(terms)):
            tf = float(L.count(t))
            if tf == 0:
                continue
            hit = True
            idf = np.log(1.0 + (n - dfv[t] + 0.5) / (dfv[t] + 0.5))
            term = (idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            s += int(round_half_away(term * 1e6, 0))
        if hit:
            want[int(doc)] = s / 1e6
    if got_map != want:
        fails.append((i, "bm25", terms, k1, b))


def trial_assort(i, tr):
    df = rand_edges(tr)
    if df is None or len(df) < 2:
        return
    ds = ray.data.from_pandas(df).repartition(int(tr.choice([1, 3])))
    got = degree_assortativity(ds)["assortativity"].iloc[0]
    G = nx.Graph()
    G.add_edges_from(zip(df["src"], df["dst"]))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = nx.degree_assortativity_coefficient(G)
    if np.isnan(want):
        if not np.isnan(got):
            fails.append((i, "assort_nan", got))
    elif abs(got - want) > 1e-6:
        fails.append((i, "assort", got, want))


def trial_coarsen(i, tr):
    df = rand_edges(tr, weighted=True)
    if df is None or not len(df):
        return
    P = int(tr.choice([1, 2, 4]))
    g = Graph.from_edges(ray.data.from_pandas(df),
                         workdir=f"/tmp/fz26-{i}", num_parts=P,
                         weight_col="weight", symmetrize=True)
    try:
        mp = g.to_oid(g.coarsen_mapping(),
                      vid_cols=("vid", "super")).to_pandas()
        ce = contract_edges(ray.data.from_pandas(df),
                            ray.data.from_pandas(mp),
                            map_count=len(mp)).to_pandas()
    finally:
        g.close()
    sup = dict(zip(mp["vid"].astype(int), mp["super"].astype(int)))
    rep = df.copy()
    rep["a"] = rep["src"].map(sup)
    rep["b"] = rep["dst"].map(sup)
    rep = rep[rep["a"] != rep["b"]]
    want = (pd.DataFrame({"src": np.minimum(rep["a"], rep["b"]),
                          "dst": np.maximum(rep["a"], rep["b"]),
                          "weight": rep["weight"]})
            .groupby(["src", "dst"], as_index=False)["weight"].sum()
            .sort_values(["src", "dst"]).reset_index(drop=True))
    got = ce.sort_values(["src", "dst"]).reset_index(drop=True)
    if not (len(got) == len(want)
            and (got["src"].to_numpy() == want["src"].to_numpy()).all()
            and (got["dst"].to_numpy() == want["dst"].to_numpy()).all()
            and np.allclose(got["weight"], want["weight"])):
        fails.append((i, "coarsen", P, len(got), len(want)))


t0 = time.perf_counter()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 25
for i in range(N):
    tr = np.random.default_rng(rng.integers(0, 2**63))
    trial_node2vec(i, tr)
    trial_bm25(i, tr)
    trial_assort(i, tr)
    trial_coarsen(i, tr)
    if fails:
        break
print(f"fuzz26: {N} trials (node2vec+bm25+assort+coarsen each), "
      f"{len(fails)} failures in {time.perf_counter() - t0:.1f}s")
for f in fails:
    print("FAIL", f)
ray.shutdown()
sys.exit(1 if fails else 0)
