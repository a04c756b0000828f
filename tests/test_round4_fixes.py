"""Round-4 regressions: the matmul-form distance kernel must replay the
old subtraction-tensor kernel bit-for-bit under the round-6 + argmin
protocol, and the round-4 ADVICE hardening (seed validation, null oids,
mixed endpoint types) must fail loudly / cast cleanly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.data.similarity import _sq_dists
from graphscope_ray.util import round_half_away


def _old_kernel(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The pre-round-4 batch×k×d subtraction form (kept here only as
    the equivalence oracle)."""
    return ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)


class TestSqDistsEquivalence:
    def test_rounded_distances_and_argmin_match(self):
        rng = np.random.default_rng(42)
        for trial in range(20):
            n, k, d = rng.integers(1, 60), rng.integers(1, 17), \
                rng.integers(1, 33)
            m = rng.standard_normal((n, d))
            c = rng.standard_normal((k, d))
            old = round_half_away(np.sqrt(_old_kernel(m, c)), 6)
            new = round_half_away(np.sqrt(_sq_dists(m, c)), 6)
            np.testing.assert_array_equal(old, new)
            np.testing.assert_array_equal(
                np.argmin(old, axis=1), np.argmin(new, axis=1))

    def test_exact_coincidence_clamps_to_zero(self):
        # x == c: the expansion can go fractionally negative; the old
        # form is exactly 0.  The clamp must keep sqrt() NaN-free.
        c = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        d = _sq_dists(c.copy(), c)
        assert np.all(d >= 0.0)
        assert round_half_away(np.sqrt(d), 6)[0, 0] == 0.0
        assert round_half_away(np.sqrt(d), 6)[1, 1] == 0.0


class TestNode2vecSeedValidation:
    def test_missing_seed_raises_keyerror(self):
        from graphscope_ray.graph.node2vec import node2vec_walks
        edges = ray.data.from_pandas(pd.DataFrame(
            {"src": [0, 2, 4], "dst": [2, 4, 0]}))
        # 3 is BETWEEN existing oids (silent-wrong-walk case pre-fix),
        # 99 is past the max oid (IndexError case pre-fix)
        for bad in ([3], [99], [0, 3]):
            with pytest.raises(KeyError, match="seed oids"):
                node2vec_walks(edges, bad, length=2)

    def test_valid_seeds_still_walk(self):
        from graphscope_ray.graph.node2vec import node2vec_walks
        edges = ray.data.from_pandas(pd.DataFrame(
            {"src": [0, 2, 4], "dst": [2, 4, 0]}))
        out = node2vec_walks(edges, [0, 4], length=2).to_pandas()
        assert set(out["hop"]) == {0, 1, 2}


class TestAssignDenseIdsNulls:
    def test_null_oid_raises(self):
        from graphscope_ray.graph.ids import assign_dense_ids
        ds = ray.data.from_arrow(pa.table(
            {"oid": pa.array(["a", None, "b"])}))
        with pytest.raises(TypeError, match="null oid"):
            assign_dense_ids(ds, "oid").materialize()

    def test_clean_oids_pass(self):
        from graphscope_ray.graph.ids import assign_dense_ids
        ds = ray.data.from_arrow(pa.table(
            {"oid": pa.array(["b", "a", "b", "c"])}))
        out = assign_dense_ids(ds, "oid").to_pandas()
        assert dict(zip(out["oid"], out["vid"])) == {
            "a": 0, "b": 1, "c": 2}


class TestMixedEndpointTypes:
    def test_string_vs_large_string_builds(self, tmp_path):
        from graphscope_ray.graph.api import Graph
        t = pa.table({
            "src": pa.array(["a", "b", "c"], pa.string()),
            "dst": pa.array(["b", "c", "a"], pa.large_string()),
        })
        g = Graph.from_edges(ray.data.from_arrow(t),
                             workdir=str(tmp_path), oid_space=True)
        wcc = g.wcc().to_pandas()
        assert len(wcc) == 3
        g.close()


class TestAnnMergeKernel:
    def test_topk_merge_ties_break_by_key(self):
        from graphscope_ray.data.similarity import _merge_topk_per_query
        part = ray.data.from_pandas(pd.DataFrame({
            "query_id": [0, 0, 0, 1, 1],
            "vec_id": [5, 3, 9, 1, 2],
            "cosine": [0.5, 0.5, 0.9, 0.7, 0.7],
        }))
        df = _merge_topk_per_query(part, key="vec_id", k=2,
                                   score="cosine", descending=True)
        assert df[df.query_id == 0]["vec_id"].tolist() == [9, 3]
        assert df[df.query_id == 1]["vec_id"].tolist() == [1, 2]
        assert df["rank"].tolist() == [1, 2, 1, 2]


class TestDeriveExchangeEdgeCases:
    """Review findings r04: empty corpus, single-partition exchange."""

    def test_empty_corpus_typed_empty_edges(self):
        from graphscope_ray.ingest import derive_edges
        empty = pa.table({"repo": pa.array([], pa.string()),
                          "path": pa.array([], pa.string()),
                          "commit": pa.array([], pa.string())})
        out = derive_edges(ray.data.from_arrow(empty))
        assert out.count() == 0
        assert [str(t) for t in out.schema().types] == \
            ["string", "string", "int64"]

    def test_single_partition_exchange(self):
        from graphscope_ray.ingest import derive_edges
        small = pa.table({"repo": pa.array(["r", "r", "r"]),
                          "path": pa.array(["a", "b", "c"]),
                          "commit": pa.array(["c1", "c1", "c1"])})
        o1 = (derive_edges(ray.data.from_arrow(small), num_partitions=1)
              .to_pandas().sort_values(["src", "dst"])
              .reset_index(drop=True))
        assert o1["weight"].tolist() == [1, 1, 1]
        assert o1["src"].tolist() == ["r::a", "r::a", "r::b"]


def test_avi_with_audio_stream_decodes_video():
    """Review finding r04: an 'auds' strl's WAVEFORMATEX strf must not
    trip the video-format validation."""
    import numpy as np

    from graphscope_ray.data.codecs import (_u16, _u32, decode_avi,
                                            encode_avi)
    fr = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    avi = encode_avi(fr, fps=4)
    strh_a = b"auds" + b"\x00" * 52
    strf_a = (_u16(1) + _u16(1) + _u32(16000) + _u32(32000)
              + _u16(2) + _u16(16))
    strl_a = (b"strh" + _u32(len(strh_a)) + strh_a
              + b"strf" + _u32(len(strf_a)) + strf_a)
    lst = b"LIST" + _u32(4 + len(strl_a)) + b"strl" + strl_a
    j = avi.find(b"movi") - 8
    spliced = avi[:j] + lst + avi[j:]
    spliced = spliced[:4] + _u32(len(spliced) - 8) + spliced[8:]
    dec, fps = decode_avi(spliced)
    assert fps == 4
    np.testing.assert_array_equal(dec, fr)
