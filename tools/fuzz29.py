"""Campaign 29: the Arrow-kernel dense-id path (pc.unique +
pc.index_in replacing numpy object-dtype ops) — string/int oids at
random shapes × partition counts: vid = rank of sorted oid (numpy
oracle), attach round-trip, to_oid inverse, WCC min-oid labels,
missing-oid KeyError."""
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

from graphscope_ray.graph.api import Graph  # noqa: E402
from graphscope_ray.graph.ids import assign_dense_ids, attach_vids  # noqa: E402

fails = []
rng = np.random.default_rng(29)


def rand_oids(tr, n, kind):
    if kind == "int":
        return tr.choice(10 ** 9, size=n, replace=False)
    if kind == "str":
        return np.array([f"org{int(a)}/repo{int(b)}::src/f{int(c)}.py"
                         for a, b, c in tr.integers(0, 10 ** 6, (n, 3))],
                        dtype=object)
    # unicode + mixed-length strings (byte order == codepoint order)
    pool = ["α", "beta", "Ω", "z", "A", "~", "0", "日本", "a/b::c"]
    return np.unique(np.array(
        [f"{tr.choice(pool)}{int(x)}" for x in
         tr.integers(0, 10 ** 7, n * 2)], dtype=object))[:n]


def trial(i, tr):
    kind = tr.choice(["int", "str", "uni"])
    n = int(tr.integers(4, 300))
    oids = np.unique(rand_oids(tr, n, kind))
    if len(oids) < 4:
        return
    m = int(tr.integers(3, len(oids) * 3))
    si = tr.integers(0, len(oids), m)
    di = tr.integers(0, len(oids), m)
    keep = si != di
    if not keep.any():
        return
    df = pd.DataFrame({"src": oids[si[keep]], "dst": oids[di[keep]]})
    P = int(tr.choice([1, 2, 5]))
    blocks = int(tr.choice([1, 3, 8]))
    ds = ray.data.from_pandas(df).repartition(blocks)

    # 1. dense ids = rank of sorted oid (numpy oracle)
    import pyarrow as pa

    def endpoints(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        both = pa.chunked_array([t["src"].combine_chunks(),
                                 t["dst"].combine_chunks()])
        return pa.table({"oid": pc.unique(both)})

    idmap = assign_dense_ids(
        ds.map_batches(endpoints, batch_format="pyarrow")).materialize()
    mp = idmap.to_pandas().sort_values("vid")
    used = np.unique(np.r_[df["src"].to_numpy(), df["dst"].to_numpy()])
    if not (mp["oid"].to_numpy() == used).all():
        fails.append((i, "rank", kind, len(used)))
        return
    if not (mp["vid"].to_numpy() == np.arange(len(used))).all():
        fails.append((i, "vid_seq", kind))
        return

    # 2. attach round-trip: vids translate back to the original oids
    ev = attach_vids(ds, idmap, ["src", "dst"],
                     idmap_count=len(mp)).to_pandas()
    dec_s = mp["oid"].to_numpy()[ev["src"].to_numpy()]
    dec_d = mp["oid"].to_numpy()[ev["dst"].to_numpy()]
    a = sorted(zip(df["src"], df["dst"]))
    b = sorted(zip(dec_s, dec_d))
    if a != b:
        fails.append((i, "roundtrip", kind))
        return

    # 3. engine WCC: labels are true min-oids per component
    g = Graph.from_edges(ds, workdir=f"/tmp/fz29-{i}", num_parts=P,
                         symmetrize=True)
    try:
        wc = g.to_oid(g.wcc(), vid_cols=("vid", "comp")).to_pandas()
    finally:
        g.close()
    # union-find oracle
    remap = {o: j for j, o in enumerate(used)}
    par = np.arange(len(used))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for s, d in zip(df["src"], df["dst"]):
        a_, b_ = find(remap[s]), find(remap[d])
        if a_ != b_:
            par[a_] = b_
    roots = {}
    for j, o in enumerate(used):
        r = find(j)
        roots.setdefault(r, o)  # used sorted → first seen = min oid
    want = {o: roots[find(j)] for j, o in enumerate(used)}
    got = dict(zip(wc["vid"], wc["comp"]))
    if got != want:
        fails.append((i, "wcc", kind, P))
        return

    # 4. a missing oid raises KeyError
    bad = pd.DataFrame({"src": [df["src"].iloc[0]],
                        "dst": ["@@missing@@" if kind != "int" else
                                -987654321]})
    try:
        attach_vids(ray.data.from_pandas(bad), idmap, ["src", "dst"],
                    idmap_count=len(mp)).to_pandas()
        fails.append((i, "missing_not_raised", kind))
    except Exception:
        pass


t0 = time.perf_counter()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
for i in range(N):
    tr = np.random.default_rng(rng.integers(0, 2**63))
    trial(i, tr)
    if fails:
        break
print(f"fuzz29: {N} trials (id-path), {len(fails)} failures "
      f"in {time.perf_counter() - t0:.1f}s")
for f in fails:
    print("FAIL", f)
ray.shutdown()
sys.exit(1 if fails else 0)
