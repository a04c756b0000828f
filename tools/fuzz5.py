"""Campaign 5: relational ops vs DuckDB on random frames; eigenvector/
katz/hits vs numpy oracles; ann_topk/ivf vs brute force."""
import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, duckdb
import pyarrow as pa
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray.pipelines.relational import (pricing_summary, pricing_summary_sql,
                                                 nation_revenue, NATION_REVENUE_SQL)
from graphscope_ray.data.similarity import ann_topk, ivf_ann_topk
from graphscope_ray import oracle
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine

def edges_ds(e, weights=None):
    cols = {"src": pa.array(e[:,0].astype("int64")), "dst": pa.array(e[:,1].astype("int64"))}
    if weights is not None: cols["weight"] = pa.array(np.asarray(weights, "float64"))
    return ray.data.from_arrow(pa.table(cols))

def collect(ds, col, n):
    pdf = ds.to_pandas().sort_values("vid")
    assert len(pdf) == n
    return pdf[col].to_numpy()

rng = np.random.default_rng(21)
fails = []
t0 = time.time(); trial = 0
TMP = tempfile.mkdtemp(prefix="fz5-")
while time.time() - t0 < 360:
    trial += 1
    tag = f"t{trial}"
    try:
        # --- relational on random frames written as parquet dir ---
        nl = int(rng.integers(1, 500))
        li = pd.DataFrame({
            "l_quantity": rng.integers(1, 50, nl).astype(float),
            "l_extendedprice": np.round(rng.uniform(1, 1e5, nl), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, nl), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, nl), 2),
            "l_returnflag": rng.choice(list("ANR"), nl),
            "l_linestatus": rng.choice(list("FO"), nl),
            "l_shipdate": (np.datetime64("1995-01-01","us")
                           + rng.integers(0, 2500, nl).astype("timedelta64[D]").astype("timedelta64[us]")),
        })
        no = int(rng.integers(1, 300)); nc = int(rng.integers(1, 50)); nn_ = int(rng.integers(1, 10))
        orders = pd.DataFrame({
            "o_custkey": rng.integers(0, nc + 3, no).astype(np.int64),  # some orphans
            "o_totalprice": np.round(rng.uniform(1, 5e5, no), 2)})
        cust = pd.DataFrame({"c_custkey": np.arange(nc, dtype=np.int64),
                             "c_nationkey": rng.integers(0, nn_, nc).astype(np.int64)})
        nat = pd.DataFrame({"n_nationkey": np.arange(nn_, dtype=np.int64),
                            "n_name": [f"NATION_{i}" for i in range(nn_)]})
        d = TMP + f"/r{trial}"
        import os; os.makedirs(d, exist_ok=True)
        for name, df_ in [("lineitem", li), ("orders", orders), ("customer", cust), ("nation", nat)]:
            df_.to_parquet(f"{d}/{name}.parquet")
        con = duckdb.connect()
        for name in ["lineitem","orders","customer","nation"]:
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{d}/{name}.parquet')")
        def canon(df_):
            df_ = df_[sorted(df_.columns)]
            return df_.sort_values(list(df_.columns)).reset_index(drop=True)
        a = canon(pricing_summary(d).to_pandas())
        b = canon(con.execute(pricing_summary_sql()).df())
        try: pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
        except AssertionError: fails.append((tag, "pricing"))
        a = canon(nation_revenue(d).to_pandas())
        b = canon(con.execute(NATION_REVENUE_SQL).df())
        try: pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
        except AssertionError: fails.append((tag, "nation_rev"))
        # --- centralities ---
        n = int(rng.integers(5, 80))
        m = int(rng.integers(1, n * 3))
        e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
        e = np.unique(e[e[:,0] != e[:,1]], axis=0)
        if len(e):
            st = build_graph(edges_ds(e), d+"/g", num_parts=int(rng.choice([1,3])), num_vertices=n)
            eng = BSPEngine(st)
            got = collect(eng.eigenvector_centrality(max_round=30), "centrality", n)
            want = oracle.eigenvector(e, n, max_round=30)
            if not np.allclose(got, want, atol=1e-8): fails.append((tag, "eigen"))
            got = collect(eng.katz_centrality(max_round=30), "centrality", n)
            want = oracle.katz(e, n, max_round=30)
            if not np.allclose(got, want, atol=1e-8): fails.append((tag, "katz"))
            eng.shutdown()
        # --- ANN vs brute force ---
        nv = int(rng.integers(3, 300)); dim = int(rng.integers(2, 24)); Q = int(rng.integers(1, 4))
        mat = rng.normal(0, 1, (nv, dim))
        emb = ray.data.from_pandas(pd.DataFrame({
            "vec_id": np.arange(nv, dtype=np.int64), "embedding": list(mat)}))
        qs = rng.normal(0, 1, (Q, dim))
        k = int(rng.integers(1, 8))
        got = ann_topk(emb, qs, k=k)
        qn = qs / np.maximum(np.linalg.norm(qs, axis=1, keepdims=True), 1e-12)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mn @ qn.T
        for qi in range(Q):
            order = np.lexsort((np.arange(nv), -sims[:, qi]))[:k]
            gqi = got[got["query_id"] == qi].sort_values("rank")["vec_id"].to_numpy()
            if not np.array_equal(gqi, order):
                # ties on rounded cosine allowed to permute: verify cosines match
                if not np.allclose(np.sort(sims[gqi, qi]), np.sort(sims[order, qi]), atol=2e-6):
                    fails.append((tag, f"ann q{qi}")); break
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4: break
shutil.rmtree(TMP, ignore_errors=True)
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]: print(" ", f)
ray.shutdown()
