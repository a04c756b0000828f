"""Round-5 ADVICE regressions: pandas-backed blocks through the derive
exchange, cross-family endpoint type mismatch failing loudly,
numpy-2.0-proof SQL literal embedding, nested path-step detection in
the Gremlin frontend, and the silenced (intended) uint64 wraparound."""

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


class TestDerivePandasBlocks:
    def test_from_pandas_corpus_matches_arrow(self):
        """ADVICE r04 (medium): _split_by_hash must accept pandas-backed
        blocks (ray.data.from_pandas), not just Arrow Tables."""
        from graphscope_ray.ingest import derive_edges
        df = pd.DataFrame({
            "repo": ["r1", "r1", "r1", "r2", "r2"],
            "path": ["a", "b", "c", "a", "b"],
            "commit": ["c1", "c1", "c2", "c9", "c9"],
        })
        out_pd = (derive_edges(ray.data.from_pandas(df))
                  .to_pandas().sort_values(["src", "dst"])
                  .reset_index(drop=True))
        out_pa = (derive_edges(
            ray.data.from_arrow(pa.Table.from_pandas(df)))
            .to_pandas().sort_values(["src", "dst"])
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(out_pd, out_pa)
        assert len(out_pd) > 0


class TestEndpointTypeFamilies:
    def test_cross_family_mismatch_raises(self):
        """ADVICE r04: string src + int64 dst must fail loudly, not
        silently stringify ids into the oid set."""
        from graphscope_ray.graph.api import Graph
        edges = pa.table({"src": pa.array(["a", "b"]),
                          "dst": pa.array([1, 2], pa.int64())})
        with pytest.raises(Exception) as ei:
            Graph.from_edges(ray.data.from_arrow(edges)).store.num_vertices
        assert "families" in str(ei.value) or "families" in repr(ei)

    def test_same_family_widths_still_cast(self):
        from graphscope_ray.graph.api import Graph
        edges = pa.table({"src": pa.array([10, 20], pa.int64()),
                          "dst": pa.array([20, 30], pa.int32())})
        g = Graph.from_edges(ray.data.from_arrow(edges))
        try:
            assert g.store.num_vertices == 3
        finally:
            g.close()

    def test_string_large_string_cast(self):
        from graphscope_ray.graph.api import Graph
        edges = pa.table({"src": pa.array(["a", "b"], pa.string()),
                          "dst": pa.array(["b", "c"], pa.large_string())})
        g = Graph.from_edges(ray.data.from_arrow(edges))
        try:
            assert g.store.num_vertices == 3
        finally:
            g.close()


def test_stratified_split_sql_plain_float_literals():
    """ADVICE r04: cumulative-fraction literals must be plain Python
    float reprs (numpy>=2.0 would repr np.float64 as 'np.float64(0.8)'
    — invalid SQL)."""
    from graphscope_ray.oracle_sql import stratified_split_sql
    sql = stratified_split_sql()
    assert "np.float64" not in sql
    assert "0.8" in sql


@pytest.fixture(scope="module")
def pg_tiny():
    from graphscope_ray.gie import PropertyGraph
    verts = pd.DataFrame({"id": [0, 1, 2, 3],
                          "label": ["n"] * 4,
                          "x": [1.0, 2.0, 3.0, 4.0]})
    edges = pd.DataFrame({"src": [0, 1, 2, 0],
                          "dst": [1, 2, 3, 2],
                          "label": ["e"] * 4})
    return PropertyGraph(ray.data.from_pandas(verts),
                         ray.data.from_pandas(edges))


class TestGremlinNestedPath:
    def test_simple_path_inside_repeat(self):
        """ADVICE r04: path steps nested in repeat(__...) must still
        switch V() into track_path mode."""
        from graphscope_ray.gie.gremlin import _needs_path, parse
        steps = parse("g.V().repeat(__.out().simplePath()).times(2)"
                      ".count()")
        # the V step's downstream contains simplePath only inside the
        # repeat Chain argument
        assert _needs_path(steps[1:])

    def test_no_path_steps_stays_untracked(self):
        from graphscope_ray.gie.gremlin import _needs_path, parse
        steps = parse("g.V().repeat(__.out()).times(2).count()")
        assert not _needs_path(steps[1:])

    def test_nested_simple_path_executes(self, pg_tiny):
        """End-to-end: the query must run (pre-fix it raised
        ValueError: needs V(track_path=True))."""
        from graphscope_ray.gie import run_gremlin
        out = run_gremlin(pg_tiny,
                          "g.V().repeat(__.out().simplePath()).times(2)"
                          ".count()")
        assert int(_scalar(out)) >= 0


def _scalar(out):
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    if hasattr(out, "iloc"):
        return out.iloc[0, 0] if out.shape[1] else 0
    return out


def test_bloom_positions_no_overflow_warning():
    """VERDICT r04 ask #7: the intended i*C2 wraparound must not emit a
    RuntimeWarning."""
    from graphscope_ray.data.hashing import fmix64
    from graphscope_ray.data.sketch import bloom_positions
    h = fmix64(np.arange(1000, dtype=np.uint64)
               * np.uint64(0x9E3779B97F4A7C15))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pos = bloom_positions(h, 7, 1 << 20)
    assert pos.shape == (7, 1000)
    assert pos.min() >= 0 and pos.max() < (1 << 20)
