"""Campaign 4: text/hash family on random unicode text vs SQL twins."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, duckdb
import ray, ray.data
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False
from graphscope_ray.data.text import token_count, lang_id, fingerprint, bpe_token_count
from graphscope_ray.data.dedup import simhash_dedup
from graphscope_ray import oracle_sql as osql
import __ray_entry__ as entry

ALPH = list("abcdefghij XYZ\t\n.,!?'\"()[]{}0123456789") + \
       ["ä","ö","ü","é","è","ñ","中","文","🙂","𝄞"," "," "]
rng = np.random.default_rng(13)
fails = []
t0 = time.time(); trial = 0
while time.time() - t0 < 360:
    trial += 1
    n = int(rng.integers(1, 60))
    texts = []
    for _ in range(n):
        L = int(rng.integers(0, 120))
        texts.append("".join(rng.choice(ALPH, size=L)))
    # sprinkle known-language text so langid exercises real votes
    if n > 3:
        texts[0] = "the quick brown fox and the lazy dog were here"
        texts[1] = "der schnelle braune fuchs und der faule hund"
        texts[2] = ""
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df)
    con = duckdb.connect(); con.register("documents", df)
    tag = f"t{trial} n={n}"
    try:
        got = token_count(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(entry.oracle_sql()["doc_token_count"]).df()
        if not np.array_equal(got["n_tokens"].to_numpy(), want["n_tokens"].to_numpy()):
            fails.append((tag, "token_count"))
        got = bpe_token_count(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(entry.oracle_sql()["doc_bpe_tokens"]).df()
        if not np.array_equal(got["n_bpe_tokens"].to_numpy(), want["n_bpe_tokens"].to_numpy()):
            fails.append((tag, "bpe"))
        got = lang_id(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(osql.langid_sql()).df()
        if not np.array_equal(got["lang_pred"].to_numpy(), want["lang_pred"].to_numpy()):
            bad = np.flatnonzero(got["lang_pred"].to_numpy() != want["lang_pred"].to_numpy())[:2]
            fails.append((tag, f"langid {[(got['lang_pred'][b], want['lang_pred'][b], repr(texts[b])[:40]) for b in bad]}"))
        got = fingerprint(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(osql.fingerprint_sql()).df()
        if not np.array_equal(got["fingerprint"].to_numpy(), want["fingerprint"].to_numpy()):
            fails.append((tag, "fingerprint"))
        got = simhash_dedup(ds, max_hamming=0)
        want = con.execute(osql.simhash_pairs_sql()).df()
        # compare as SETS of pairs: bucket emission order is
        # layout-dependent (t461/t470 at seed 13 were order-only diffs)
        ga = (got[["a","b"]].sort_values(["a","b"]).to_numpy()
              if len(got) else np.empty((0,2)))
        wa = (want[["a","b"]].sort_values(["a","b"]).to_numpy()
              if len(want) else np.empty((0,2)))
        if not np.array_equal(ga, wa): fails.append((tag, "simhash"))
    except Exception as ex:
        fails.append((tag, f"EXC {type(ex).__name__}: {ex}"))
    if len(fails) > 4: break
print("trials:", trial, "failures:", len(fails))
for f in fails[:6]: print(" ", f)
ray.shutdown()
