"""Campaign 30: round-5 GIE step family — and/or/optional/choose/
coalesce/group_by/is/hasNot/constant/math — vs direct pandas oracles
over random labeled property graphs (both adjacency routes).

Oracle semantics per trial:
- and/or: vertex v survives iff (has out-x-edge) AND/OR (score pred);
- optional: v with ≥1 out-x neighbor is replaced by the neighbor bag,
  else passes through;
- choose: predicate side walks branch A (out-x), other side branch B
  (out-y);
- coalesce: first of (out-x, out-y, identity) with results;
- group_by: per-label sum/mean/max of score vs pandas groupby;
- is/constant/math: value-bag arithmetic replays.
"""
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


def bag(x):
    if isinstance(x, pd.DataFrame):
        if len(x) == 0:
            return Counter()
        x = x["t"]
    return Counter(x.tolist())


fails = []
rng = np.random.default_rng(30)
for trial in range(1, 21):
    n = int(rng.integers(6, 50))
    m = int(rng.integers(4, n * 3))
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
        "label": np.where(rng.integers(0, 2, len(e)) == 0, "x", "y")})
    thr = int(rng.integers(5, 45))
    score = dict(zip(verts["id"], verts["score"]))
    ex = edges[edges.label == "x"]
    ey = edges[edges.label == "y"]
    has_x = set(ex.src)
    has_y = set(ey.src)
    pred_ids = {v for v in verts["id"] if score[v] > thr}

    for bl in (10**9, 0):
        g = PropertyGraph(ray.data.from_pandas(verts),
                          ray.data.from_pandas(edges),
                          broadcast_limit=bl)
        rt = f"t{trial}/bl{bl}"
        try:
            # 1. and/or
            want_and = {v for v in verts["id"]
                        if v in has_x and v in pred_ids}
            got = set(g.V().and_where(
                lambda s: s.out("x"),
                lambda s: s.has("score", P.gt(thr))).id_values()["t"])
            if got != want_and:
                fails.append((rt, "and")); continue
            want_or = {v for v in verts["id"]
                       if v in has_x or v in pred_ids}
            got = set(g.V().or_where(
                lambda s: s.out("x"),
                lambda s: s.has("score", P.gt(thr))).id_values()["t"])
            if got != want_or:
                fails.append((rt, "or")); continue

            # 2. optional
            exp = Counter()
            for v in verts["id"]:
                nb = ex[ex.src == v]["dst"]
                if len(nb):
                    exp.update(nb.tolist())
                else:
                    exp[v] += 1
            got = bag(g.V().optional(lambda s: s.out("x")).id_values())
            if got != exp:
                fails.append((rt, "optional")); continue

            # 3. choose(score-pred, out-x, out-y)
            exp = Counter()
            for v in verts["id"]:
                nb = (ex if v in pred_ids else ey)
                exp.update(nb[nb.src == v]["dst"].tolist())
            got = bag(g.V().choose(
                lambda s: s.has("score", P.gt(thr)),
                lambda s: s.out("x"),
                lambda s: s.out("y")).id_values())
            if got != exp:
                fails.append((rt, "choose")); continue

            # 4. coalesce(out-x, out-y, identity)
            exp = Counter()
            for v in verts["id"]:
                if v in has_x:
                    exp.update(ex[ex.src == v]["dst"].tolist())
                elif v in has_y:
                    exp.update(ey[ey.src == v]["dst"].tolist())
                else:
                    exp[v] += 1
            got = bag(g.V().coalesce(
                lambda s: s.out("x"), lambda s: s.out("y"),
                lambda s: s.identity()).id_values())
            if got != exp:
                fails.append((rt, "coalesce")); continue

            # 5. group_by label -> sum/mean/max of score
            for agg in ("sum", "mean", "max"):
                got_df = g.V().group_by("label", "score", agg) \
                    .to_pandas().set_index("label").iloc[:, 0]
                exp_s = getattr(verts.groupby("label")["score"], agg)()
                if not np.allclose(got_df.sort_index().to_numpy(),
                                   exp_s.sort_index().to_numpy()):
                    fails.append((rt, f"group_{agg}"))
                    raise StopIteration

            # 6. is / constant / math
            k = int(g.V().values("score").is_(P.gte(thr)).count())
            if k != sum(1 for v in score.values() if v >= thr):
                fails.append((rt, "is")); continue
            tot = g.V().constant(2.0).sum_()
            if abs(tot - 2.0 * n) > 1e-9:
                fails.append((rt, "constant")); continue
            msum = g.V().values("score").math("(_ + 1) * 2").sum_()
            if abs(msum - sum((s + 1) * 2 for s in score.values())) \
                    > 1e-6:
                fails.append((rt, "math")); continue
        except StopIteration:
            continue

print(f"fuzz30 trials={trial} routes=2 fails: "
      f"{fails if fails else 'NONE'}")
ray.shutdown()
sys.exit(1 if fails else 0)
