"""Campaign 25: the session-8 operators — msf (distributed Boruvka)
vs networkx Kruskal total weight AND vs a driver Kruskal under the
engine's total order; matching (locally-dominant) vs sequential
greedy under (w, fmix64(pack(ra, rb)), a, b); mg_topk (Misra-Gries
two-pass) vs brute-force top-k when guaranteed, and error-bound
containment always — across graph shapes, weights, partition counts,
capacities and block layouts."""
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

from graphscope_ray.data.hashing import fmix64  # noqa: E402
from graphscope_ray.data.heavyhitters import mg_summary, mg_topk  # noqa: E402
from graphscope_ray.graph.api import Graph  # noqa: E402

fails = []
rng = np.random.default_rng(25)


def rand_edges(tr):
    n = int(tr.integers(4, 150))
    m = int(tr.integers(3, max(4, n * 3)))
    shape = tr.choice(["gnm", "path", "star", "islands"])
    if shape == "gnm":
        src = tr.integers(0, n, m)
        dst = tr.integers(0, n, m)
    elif shape == "path":
        src = np.arange(n - 1)
        dst = np.arange(1, n)
    elif shape == "star":
        src = np.zeros(n - 1, np.int64)
        dst = np.arange(1, n)
    else:  # disconnected islands
        src = tr.integers(0, n, m)
        dst = np.minimum(src + tr.integers(1, 4, m), n - 1)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if not len(src):
        return None
    tie = tr.choice(["distinct", "fewvals", "allsame"])
    if tie == "distinct":
        w = tr.permutation(len(src)).astype(np.float64) + 1
    elif tie == "fewvals":
        w = tr.integers(1, 4, len(src)).astype(np.float64)
    else:
        w = np.ones(len(src))
    df = pd.DataFrame({"src": np.minimum(src, dst),
                       "dst": np.maximum(src, dst), "weight": w})
    return df.groupby(["src", "dst"], as_index=False)["weight"].min()


def kruskal(df):
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    w = df["weight"].to_numpy()
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    order = np.lexsort((b, a, w))
    oids = np.unique(np.r_[src, dst])
    remap = {o: i for i, o in enumerate(oids)}
    par = np.arange(len(oids))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    out = []
    for i in order:
        u, v = find(remap[a[i]]), find(remap[b[i]])
        if u != v:
            par[u] = v
            out.append((int(a[i]), int(b[i]), float(w[i])))
    return sorted(out)


def greedy_matching(df):
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    w = df["weight"].to_numpy()
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    oids = np.unique(np.r_[src, dst])
    ra = np.searchsorted(oids, a).astype(np.uint64)
    rb = np.searchsorted(oids, b).astype(np.uint64)
    h = fmix64((ra << np.uint64(32)) | rb)
    order = np.lexsort((b, a, h, w))
    used, out = set(), []
    for i in order:
        if a[i] not in used and b[i] not in used:
            used.update((a[i], b[i]))
            out.append((int(a[i]), int(b[i]), float(w[i])))
    return sorted(out)


def trial_graph(i, tr):
    df = rand_edges(tr)
    if df is None or not len(df):
        return
    P = int(tr.choice([1, 2, 3, 5]))
    g = Graph.from_edges(ray.data.from_pandas(df),
                         workdir=f"/tmp/fz25-{i}", num_parts=P,
                         weight_col="weight", symmetrize=True)
    try:
        msf = g.to_oid(g.msf(), vid_cols=("src", "dst")).to_pandas()
        mm = g.to_oid(g.matching(), vid_cols=("src", "dst")).to_pandas()
    finally:
        g.close()
    got_msf = sorted(zip(msf["src"].astype(int), msf["dst"].astype(int),
                         msf["weight"].astype(float)))
    want_msf = kruskal(df)
    if got_msf != want_msf:
        fails.append((i, "msf", len(got_msf), len(want_msf)))
        return
    # cross-check total weight vs networkx (tie-break-independent)
    H = nx.Graph()
    for s, d, w in df.itertuples(index=False):
        H.add_edge(int(s), int(d), weight=float(w))
    nx_w = sum(d["weight"] for *_, d in
               nx.minimum_spanning_edges(H, data=True))
    if abs(sum(w for *_, w in got_msf) - nx_w) > 1e-9:
        fails.append((i, "msf_weight_vs_nx", nx_w))
        return
    got_mm = sorted(zip(mm["src"].astype(int), mm["dst"].astype(int),
                        mm["weight"].astype(float)))
    if got_mm != greedy_matching(df):
        fails.append((i, "matching", len(got_mm)))
        return
    # maximality
    matched = {v for e in got_mm for v in e[:2]}
    for s, d, _ in df.itertuples(index=False):
        if int(s) not in matched and int(d) not in matched:
            fails.append((i, "matching_not_maximal", (s, d)))
            return


def trial_mg(i, tr):
    vocab = int(tr.integers(10, 3000))
    n_docs = int(tr.integers(5, 300))
    wpd = int(tr.integers(3, 60))
    zipf = bool(tr.integers(0, 2))
    if zipf:
        probs = 1.0 / np.arange(1, vocab + 1)
        probs /= probs.sum()
        ids = tr.choice(vocab, size=(n_docs, wpd), p=probs)
    else:
        ids = tr.integers(0, vocab, size=(n_docs, wpd))
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    df = pd.DataFrame({"text": texts})
    blocks = int(tr.choice([1, 2, 4, 8]))
    cap = int(tr.choice([16, 64, 256, 4096]))
    k = int(tr.choice([5, 20, 100]))
    ds = ray.data.from_pandas(df).repartition(blocks)
    got, info = mg_topk(ds, k=k, capacity=cap)
    toks = (df["text"].str.findall(r"[a-z0-9]+").explode().dropna())
    true = toks.value_counts()
    want = (true.reset_index().set_axis(["token", "cnt"], axis=1)
            .sort_values(["cnt", "token"], ascending=[False, True],
                         kind="mergesort").head(k))
    if info["guaranteed"]:
        if (list(got["token"]) != list(want["token"])
                or list(got["cnt"]) != list(want["cnt"].astype(int))):
            fails.append((i, "mg_guaranteed_mismatch", cap, k))
            return
    # bound containment always holds
    summary, dec = mg_summary(ds, capacity=cap)
    m = summary.set_index("token")["mg_cnt"]
    for tok, mg in m.items():
        t = int(true.get(tok, 0))
        if not (mg <= t <= mg + dec):
            fails.append((i, "mg_bound", tok, mg, t, dec))
            return
    absent = true[~true.index.isin(m.index)]
    if len(absent) and int(absent.max()) > dec:
        fails.append((i, "mg_absent_bound", int(absent.max()), dec))


t0 = time.perf_counter()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
for i in range(N):
    tr = np.random.default_rng(rng.integers(0, 2**63))
    trial_graph(i, tr)
    trial_mg(i, tr)
    if fails:
        break
print(f"fuzz25: {N} trials (msf+matching+mg each), "
      f"{len(fails)} failures in {time.perf_counter() - t0:.1f}s")
for f in fails:
    print("FAIL", f)
ray.shutdown()
sys.exit(1 if fails else 0)
