"""Campaign 17: mergeable sketches — HLL (global + per-key) and
count-min vs exact numpy counters and the DuckDB register/count-table
twins, over adversarial corpora (unicode, empty/null docs, heavy skew,
high cardinality, tiny registers)."""
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

from graphscope_ray.data.hashing import batch_token_hashes  # noqa: E402
from graphscope_ray.data.sketch import (bloom_build,  # noqa: E402
                                        bloom_contains, bloom_fold,
                                        bloom_probe, cms_counts, cms_fold,
                                        cms_lookup, hll_estimate, hll_fold,
                                        hll_register_rows,
                                        hll_register_rows_by_key,
                                        hll_registers)
from graphscope_ray.oracle_sql import (bloom_probe_sql,  # noqa: E402
                                       cms_rows_sql,
                                       hll_registers_by_key_sql,
                                       hll_registers_sql)

ALPH = list("ab xy01 \n\t.,!?") + ["ü", "é", "中", "9", "Z"]

fails, trial = [], 0
rng = np.random.default_rng(17)
for trial in range(1, 41):
    tag = f"t{trial}"
    try:
        nd = int(rng.integers(1, 120))
        texts, keys = [], []
        for i in range(nd):
            kind = int(rng.integers(0, 4))
            if kind == 0:
                texts.append("")
            elif kind == 1:  # heavy skew: one token repeated
                texts.append(("hot " * int(rng.integers(1, 50))).strip())
            elif kind == 2:  # high cardinality: unique tokens
                texts.append(" ".join(
                    f"u{trial}_{i}_{j}" for j in range(int(rng.integers(1, 40)))))
            else:
                texts.append("".join(
                    rng.choice(ALPH, size=int(rng.integers(1, 200)))))
            keys.append(f"s{int(rng.integers(0, 4))}")
        docs = pd.DataFrame({"doc_id": np.arange(nd, dtype=np.int64),
                             "text": texts, "source": keys})
        nblocks = int(rng.integers(1, 5))
        ds = ray.data.from_pandas(
            np.array_split(docs, nblocks) if nd >= nblocks else [docs])
        p = int(rng.choice([4, 6, 10]))

        # --- global HLL: dataset fold == single fold == SQL twin
        regs = hll_registers(ds, p=p)
        _, th = batch_token_hashes(texts)
        if not (regs == hll_fold(th, p)).all():
            fails.append((tag, "hll dataset vs single fold")); continue
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(hll_registers_sql(p)).df()
        got = hll_register_rows(ds, p=p)
        if not (got["reg"].to_numpy() == want["reg"].to_numpy()).all():
            fails.append((tag, "hll vs sql")); continue
        # estimator sane at this cardinality (loose 5-sigma bound,
        # skip degenerate tiny-m/tiny-n combinations)
        exact = len(np.unique(th)) if len(th) else 0
        if exact >= 100 and p >= 6:
            est = hll_estimate(regs)
            se = 1.04 / np.sqrt(1 << p)
            if abs(est - exact) > 6 * se * exact:
                fails.append((tag, f"hll est {est} vs {exact}")); continue

        # --- per-key HLL vs SQL twin
        gk = hll_register_rows_by_key(ds, key="source", p=p)
        wk = con.execute(hll_registers_by_key_sql(p, "source")).df()
        if not ((gk["reg"].to_numpy() == wk["reg"].to_numpy()).all()
                and (gk["source"].to_numpy() == wk["source"].to_numpy()).all()):
            fails.append((tag, "hll by key vs sql")); continue

        # --- CMS: dataset fold == single fold == SQL twin; bounds
        d = int(rng.integers(1, 5))
        w = int(rng.choice([16, 64, 512]))
        c = cms_counts(ds, d=d, w=w)
        if not (c == cms_fold(th, d, w)).all():
            fails.append((tag, "cms dataset vs single fold")); continue
        wantc = con.execute(cms_rows_sql(d, w)).df()
        if not (c.reshape(-1) == wantc["cnt"].to_numpy()).all():
            fails.append((tag, "cms vs sql")); continue
        if len(th):
            uniq, tc = np.unique(th, return_counts=True)
            est = cms_lookup(c, uniq)
            if not (est >= tc).all():
                fails.append((tag, "cms undercounts")); continue
            if not (c.sum(axis=1) == len(th)).all():
                fails.append((tag, "cms row mass")); continue
        # --- Bloom: dataset build == single fold == SQL twin; bounds
        bk = int(rng.integers(1, 5))
        bm = int(rng.choice([1 << 8, 1 << 12, 1 << 16]))
        bmod = int(rng.choice([2, 5, 20]))
        import pyarrow as pa

        def carve(t: pa.Table, _m=bmod) -> pa.Table:
            return t.filter(pa.array((t["doc_id"].to_numpy() % _m) == 0))

        words = bloom_build(ds.map_batches(carve, batch_format="pyarrow"),
                            k=bk, m_bits=bm)
        mask = (docs["doc_id"].to_numpy() % bmod) == 0
        _, ch = batch_token_hashes([t for t, km in zip(texts, mask) if km])
        if not (words == bloom_fold(ch, bk, bm)).all():
            fails.append((tag, "bloom dataset vs single fold")); continue
        got_b = (bloom_probe(ds, words, k=bk, m_bits=bm).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
        want_b = con.execute(bloom_probe_sql(bk, bm, bmod)).df()
        if not all((got_b[c].to_numpy() == want_b[c].to_numpy()).all()
                   for c in ["doc_id", "n_tokens", "n_hits"]):
            fails.append((tag, "bloom vs sql")); continue
        # no false negatives: every carve token is a member
        if len(ch) and not bloom_contains(words, ch, k=bk, m_bits=bm).all():
            fails.append((tag, "bloom false negative")); continue
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4:
        break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]:
    print(" ", f)
ray.shutdown()
