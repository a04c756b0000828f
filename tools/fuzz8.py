"""Campaign 8: distributed n-gram Jaccard verify at 50k docs.

r02 VERDICT #6 done-criterion: the verify stage must run with NO
driver-side text LUT (candidate pairs arrive as a Dataset, texts are
co-grouped to the pairs), and its jaccard values must equal the direct
Python-set computation on a sampled subset.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

import ray
import ray.data

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
ray.data.DataContext.get_current().enable_progress_bars = False

from graphscope_ray.data.dedup import ngram_jaccard_pairs
from graphscope_ray.util import round_half_away

N_DOCS = 50_000
N_PAIRS = 4_000
SAMPLE = 300

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
words = [f"w{i}" for i in range(500)]
texts = [" ".join(rng.choice(words, size=rng.integers(5, 40)))
         for _ in range(N_DOCS)]
# half the candidate pairs are near-dups (shared prefix), half random
a = rng.integers(0, N_DOCS, N_PAIRS).astype(np.int64)
b = (a + 1) % N_DOCS
b[N_PAIRS // 2:] = rng.integers(0, N_DOCS, N_PAIRS // 2)
keep = a != b
cand = pd.DataFrame({"a": np.minimum(a, b)[keep],
                     "b": np.maximum(a, b)[keep]}).drop_duplicates()

docs = ray.data.from_pandas(pd.DataFrame({
    "doc_id": np.arange(N_DOCS, dtype=np.int64), "text": texts}))
cand_ds = ray.data.from_pandas(cand.reset_index(drop=True))

t0 = time.perf_counter()
got = ngram_jaccard_pairs(docs, cand_ds, n=3, threshold=0.0)
sec = time.perf_counter() - t0
got = got.sort_values(["a", "b"]).reset_index(drop=True)
assert len(got) == len(cand), (len(got), len(cand))

idx = rng.choice(len(got), size=min(SAMPLE, len(got)), replace=False)
fails = 0
for i in idx:
    ra, rb, rj = (int(got["a"].iloc[i]), int(got["b"].iloc[i]),
                  float(got["jaccard"].iloc[i]))

    def grams(s):
        return {s[k:k + 3] for k in range(max(1, len(s) - 2))}

    ga, gb = grams(texts[ra]), grams(texts[rb])
    want = float(round_half_away(
        np.float64(len(ga & gb) / max(1, len(ga | gb))), 6))
    if rj != want:
        fails += 1
        print("MISMATCH", ra, rb, rj, want)
print(f"trials: {len(idx)} failures: {fails} "
      f"pairs: {len(got)} docs: {N_DOCS} sec: {sec:.1f}")
ray.shutdown()
sys.exit(1 if fails else 0)
