"""Campaign 21: GIE-lite traversals (graphscope_ray/gie/) vs pandas
bag-semantics oracles over random labeled property graphs.

Each trial builds one random multigraph (2 vertex labels with an int
property, 2 edge labels with a float property, parallel edges and
self-loop-free random wiring), runs every check on BOTH adjacency
routes (broadcast CSR and the cogroup_join shuffle), and compares
multisets/frames against a direct pandas evaluation. Invariant pairs
(``bothE().otherV() == both()``, ``inE().outV() == in_()``) double as
cross-step consistency checks."""
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.gie import P, PropertyGraph  # noqa: E402


def bag(df_or_series):
    if isinstance(df_or_series, pd.DataFrame):
        if len(df_or_series) == 0:
            return Counter()
        df_or_series = df_or_series["t"]
    return Counter(df_or_series.tolist())


fails = []
rng = np.random.default_rng(21)
for trial in range(1, 26):
    tag = f"t{trial}"
    n = int(rng.integers(6, 60))
    m = int(rng.integers(4, n * 4))
    verts = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "label": np.where(rng.integers(0, 2, n) == 0, "a", "b"),
        "score": rng.integers(0, 50, n).astype(np.int64)})
    e = rng.integers(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    if len(e) < 2:
        continue
    edges = pd.DataFrame({
        "src": e[:, 0].astype(np.int64),
        "dst": e[:, 1].astype(np.int64),
        "label": np.where(rng.integers(0, 2, len(e)) == 0, "x", "y"),
        "w": rng.random(len(e)).round(6)})
    vl = str(rng.choice(["a", "b"]))
    el = str(rng.choice(["x", "y"]))
    thr = int(rng.integers(5, 45))
    score = dict(zip(verts["id"], verts["score"]))
    vstart = verts[verts.label == vl]["id"]
    eall, exl = edges, edges[edges.label == el]

    try:
        for bl in (10**9, 0):
            g = PropertyGraph(
                ray.data.from_pandas(
                    np.array_split(verts, int(rng.integers(1, 4)))),
                ray.data.from_pandas(
                    np.array_split(edges, int(rng.integers(1, 4)))),
                broadcast_limit=bl)
            rt = f"{tag}/bl{bl}"

            # 1. bothE().otherV() == both() (bag equality)
            got = bag(g.V(vl).bothE(el).otherV().id_values())
            outs = exl[exl.src.isin(vstart)]["dst"]
            ins = exl[exl.dst.isin(vstart)]["src"]
            if got != Counter(outs.tolist()) + Counter(ins.tolist()):
                fails.append((rt, "bothE.otherV")); continue
            if got != bag(g.V(vl).both(el).id_values()):
                fails.append((rt, "bothE.otherV vs both")); continue

            # 2. inE().outV() == in_()
            got = bag(g.V(vl).inE(el).outV().id_values())
            if got != Counter(ins.tolist()):
                fails.append((rt, "inE.outV")); continue

            # 3. degree_local + filter_col vs pandas value_counts
            k = int(rng.integers(1, 4))
            dl = (g.V().degree_local("out", el, name="d")
                  .filter_col("d", P.gte(k)).to_pandas())
            dcnt = exl.groupby("src").size()
            want = {v: int(c) for v, c in dcnt.items() if c >= k}
            gotd = (dict(zip(dl["t"], dl["d"])) if len(dl) else {})
            if gotd != want:
                fails.append((rt, f"degree_local k={k}")); continue

            # 4. where_exists / where_not_exists vs isin
            he = g.V(vl).where_exists(
                lambda t: t.out(el).has("score", P.gte(thr)))
            hi_dst = exl[exl.dst.map(score) >= thr]
            want_set = set(vstart) & set(hi_dst["src"])
            if set(he.id_values()["t"]) != want_set:
                fails.append((rt, "where_exists")); continue
            hn = g.V(vl).where_not_exists(
                lambda t: t.out(el).has("score", P.gte(thr)))
            if set(hn.id_values()["t"]) != set(vstart) - want_set:
                fails.append((rt, "where_not_exists")); continue

            # 5. group_agg over edge bag vs pandas groupby
            agg = str(rng.choice(["sum", "min", "max", "mean"]))
            ga = (g.V(vl).outE(el)
                  .group_agg("e_dst", "e_w", agg, name="v")
                  .to_pandas())
            pw = (exl[exl.src.isin(vstart)]
                  .groupby("dst")["w"].agg(agg))
            gotm = dict(zip(ga["e_dst"], ga["v"])) if len(ga) else {}
            if set(gotm) != set(pw.index) or any(
                    abs(gotm[d] - pw[d]) > 1e-9 for d in gotm):
                fails.append((rt, f"group_agg {agg}")); continue

            # 6. scalar aggregates vs pandas
            sub = verts[verts.label == vl]
            if len(sub):
                if g.V(vl).sum_("score") != sub["score"].sum():
                    fails.append((rt, "sum_")); continue
                if g.V(vl).max_("score") != sub["score"].max():
                    fails.append((rt, "max_")); continue

            # 7. sample: deterministic subset of the right size
            sn = int(rng.integers(1, n + 3))
            s1 = sorted(g.V(vl).sample(sn, seed=trial).id_values()["t"])
            s2 = sorted(g.V(vl).sample(sn, seed=trial).id_values()["t"])
            if s1 != s2 or len(s1) != min(sn, len(sub)) or \
                    not set(s1) <= set(sub["id"]):
                fails.append((rt, "sample")); continue

            # 8. subgraph round-trip: edges and endpoints survive
            sg = g.V(vl).outE(el).subgraph()
            keep = exl[exl.src.isin(vstart)]
            dkeep = keep.drop_duplicates(["src", "dst", "label", "w"])
            if sg.edges.count() != len(dkeep):
                fails.append((rt, "subgraph edges")); continue
            vin = set(dkeep["src"]) | set(dkeep["dst"])
            if set(sg.vertices.to_pandas()["id"] if vin else []) != vin:
                fails.append((rt, "subgraph verts")); continue
    except Exception as exc:  # noqa: BLE001
        fails.append((tag, f"EXC {type(exc).__name__}: {exc}"))

print("fuzz21 trials=25 routes=2 fails:", fails if fails else "NONE")
ray.shutdown()
