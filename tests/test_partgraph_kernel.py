"""Property test for the fused partgraph pair-expansion kernel.

`pairs_in_bucket` replaced a distinct-groupby + hash self-join with
one vectorized dedup+expand pass; this cross-checks it against an
itertools brute force on arbitrary (order, part) multisets. Pure
numpy/pandas — no Ray session needed.
"""

import itertools
from collections import Counter

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from graphscope_ray.pipelines.partgraph import pairs_in_bucket, _unpack_key


def brute_force(rows):
    distinct = set(rows)
    cnt = Counter()
    for order in {o for o, _ in distinct}:
        parts = sorted(p for o, p in distinct if o == order)
        for a, b in itertools.combinations(parts, 2):
            cnt[(a, b)] += 1
    return cnt


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 15)),
                max_size=120))
def test_pairs_in_bucket_matches_brute_force(rows):
    g = pd.DataFrame({
        "l_orderkey": np.array([o for o, _ in rows], dtype=np.int64),
        "l_partkey": np.array([p for _, p in rows], dtype=np.int64),
    })
    out = pairs_in_bucket(g)
    src, dst = _unpack_key(out["key"].to_numpy())
    got = dict(zip(zip(src.tolist(), dst.tolist()),
                   out["_w"].to_numpy().tolist()))
    assert got == dict(brute_force(rows))
    assert (src < dst).all()
