"""Campaign 22: session-6 operators vs pure-python/pandas oracles.

- lm_score (data/text.py): random token-soup corpora (skewed Zipf-ish
  vocab, empty/None/1-token docs, unicode noise) vs a dict-based
  bigram-LM oracle with add-one smoothing.
- fold_by_key / unfold (gie/traversal.py): random labeled graphs, both
  adjacency routes, vs pandas groupby-apply folds (sorted lists, local
  limit) and a flatten round-trip.
- PropertyGraph.program('wcc'): random graphs + isolated vertices vs a
  union-find oracle.
"""
import math
import re
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.text import lm_score  # noqa: E402
from graphscope_ray.gie import PropertyGraph, unfold  # noqa: E402

fails = []
rng = np.random.default_rng(22)
PAT = re.compile(r"[a-z0-9]+")


def lm_oracle(docs: pd.DataFrame) -> pd.DataFrame:
    toks = {r.doc_id: PAT.findall((r.text or "").lower())
            for r in docs.itertuples()}
    uni, bg = {}, {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for p in zip(ts, ts[1:]):
            bg[p] = bg.get(p, 0) + 1
    V = len(uni)
    rows = []
    for d, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if pairs:
            nll = -sum(math.log((bg[p] + 1) / (uni[p[0]] + V))
                       for p in pairs) / len(pairs)
        else:
            nll = 0.0
        rows.append((d, len(pairs), nll))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "lm_nll"])


VOCAB = (["the", "cat", "dog", "a", "x1", "data", "graph", "zz9"]
         + [f"w{i}" for i in range(40)])

for trial in range(1, 16):
    n_docs = int(rng.integers(3, 40))
    texts = []
    for _ in range(n_docs):
        kind = rng.integers(0, 10)
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        elif kind == 2:
            texts.append("solo")
        else:
            k = int(rng.integers(1, 60))
            # Zipf-ish skew: low indices much more likely
            idx = np.minimum(
                rng.zipf(1.6, size=k) - 1, len(VOCAB) - 1)
            words = [VOCAB[i] for i in idx]
            if rng.integers(0, 4) == 0:
                words.insert(int(rng.integers(0, len(words) + 1)),
                             "Émile—«quoted»")  # unicode noise
            texts.append(" ".join(words))
    docs = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})
    got = (lm_score(ray.data.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = lm_oracle(docs).sort_values("doc_id").reset_index(drop=True)
    if not (got["n_bigrams"].to_numpy()
            == want["n_bigrams"].to_numpy()).all():
        fails.append(f"lm{trial}: n_bigrams mismatch")
    elif not np.allclose(got["lm_nll"], want["lm_nll"], atol=2e-6):
        d = np.abs(got["lm_nll"] - want["lm_nll"]).max()
        fails.append(f"lm{trial}: nll off by {d}")
    print(f"lm trial {trial}: ok ({n_docs} docs)", flush=True)


def rand_graph(rng, bl):
    n = int(rng.integers(5, 40))
    m = int(rng.integers(3, n * 3))
    verts = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "label": rng.choice(["a", "b"], size=n),
        "p": rng.integers(0, 5, size=n).astype(np.int64)})
    edges = pd.DataFrame({
        "src": rng.integers(0, n, size=m).astype(np.int64),
        "dst": rng.integers(0, n, size=m).astype(np.int64),
        "label": rng.choice(["e", "f"], size=m),
        "w": rng.random(size=m)})
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    return verts, edges, PropertyGraph(
        ray.data.from_pandas(verts), ray.data.from_pandas(edges),
        broadcast_limit=bl)


for trial in range(1, 16):
    seed_state = rng.integers(0, 2**31)
    for bl in (10**9, 0):
        r2 = np.random.default_rng(seed_state)
        verts, edges, g = rand_graph(r2, bl)
        lim = int(r2.integers(1, 4))
        t = g.V("a").as_("s").out("e")
        got = (t.fold_by_key("tag_s", "t", limit=lim, name="l")
               .to_pandas())
        got_map = ({} if len(got) == 0 else
                   {r.tag_s: list(r.l) for r in got.itertuples()})
        # pandas oracle: out-'e' hops from label-a vertices
        av = set(verts[verts.label == "a"]["id"])
        ee = edges[edges.label == "e"]
        want_map = {}
        for s, d in zip(ee.src, ee.dst):
            if s in av:
                want_map.setdefault(int(s), []).append(int(d))
        want_map = {k: sorted(v)[:lim] for k, v in want_map.items()}
        if got_map != want_map:
            fails.append(f"fold{trial}/bl={bl}: {got_map} != {want_map}")
            continue
        flat = unfold(
            t.fold_by_key("tag_s", "t", limit=lim, name="l"), "l"
        ).to_pandas()
        pairs = ([] if len(flat) == 0 else
                 sorted(map(tuple, flat[["tag_s", "l"]].itertuples(
                     index=False))))
        want_pairs = sorted((k, v) for k, vs in want_map.items()
                            for v in vs)
        if pairs != want_pairs:
            fails.append(f"unfold{trial}/bl={bl}")
    print(f"fold trial {trial}: ok", flush=True)


def wcc_oracle(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(edges.src, edges.dst):
        a, b = find(int(s)), find(int(d))
        if a != b:
            parent[max(a, b)] = min(a, b)
    # path-compress to the component MIN (min-oid labels)
    out = {}
    for i in n_ids:
        r = find(i)
        out[i] = min(out.get(r, r), r)
    # second pass: label = min id in component
    comp_min = {}
    for i in n_ids:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[find(i)] for i in n_ids}


for trial in range(1, 9):
    verts, edges, g = rand_graph(rng, 10**9)
    got = g.program("wcc").to_pandas()
    got_map = dict(zip(got["id"].astype(int), got["comp"].astype(int)))
    want = wcc_oracle(list(verts["id"]), edges)
    if got_map != want:
        bad = {k: (got_map.get(k), want[k]) for k in want
               if got_map.get(k) != want[k]}
        fails.append(f"wcc{trial}: {list(bad.items())[:5]}")
    print(f"program-wcc trial {trial}: ok", flush=True)

print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
