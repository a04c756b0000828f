"""@pregel decorator compat shim (VERDICT r04 ask #6): the reference's
SSSP-Pregel UDF example (python/tests/test_udf_app.py:100-128) must run
UNMODIFIED and match the engine's vectorized SSSPPregelProgram
(pg_sssp_pregel's kernel). Plus decorator validation, the combiner
path, aggregators and id/selector plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.graph.pregel_udf import (AppAssets,
                                             PregelAggregatorType,
                                             pregel, run_pregel)


# ---- the reference example, verbatim (test_udf_app.py:99-120) --------
@pregel(vd_type="double", md_type="double")
class SSSP_Pregel(AppAssets):
    @staticmethod
    def Init(v, context):
        v.set_value(1000000000.0)

    @staticmethod
    def Compute(messages, v, context):
        src_id = context.get_config(b"src")
        cur_dist = v.value()
        new_dist = 1000000000.0
        if v.id() == src_id:
            new_dist = 0
        for message in messages:
            new_dist = min(message, new_dist)
        if new_dist < cur_dist:
            v.set_value(new_dist)
            for e_label_id in range(context.edge_label_num()):
                edges = v.outgoing_edges(e_label_id)
                for e in edges:
                    v.send(e.vertex(), new_dist + e.get_int(2))
        v.vote_to_halt()


# the Combine variant (test_udf_app.py:338-367), verbatim body
@pregel(vd_type="double", md_type="double")
class SSSP_Pregel_Combine(AppAssets):
    @staticmethod
    def Init(v, context):
        v.set_value(1000000000.0)

    @staticmethod
    def Compute(messages, v, context):
        src_id = context.get_config(b"src")
        cur_dist = v.value()
        new_dist = 1000000000.0
        if v.id() == src_id:
            new_dist = 0
        for message in messages:
            new_dist = min(message, new_dist)
        if new_dist < cur_dist:
            v.set_value(new_dist)
            for e_label_id in range(context.edge_label_num()):
                edges = v.outgoing_edges(e_label_id)
                for e in edges:
                    v.send(e.vertex(), new_dist + e.get_int(2))
        v.vote_to_halt()

    @staticmethod
    def Combine(messages):
        ret = 1000000000.0
        for m in messages:
            ret = min(ret, m)
        return ret


def _rand_edges(rng, n=60, m=300):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return pd.DataFrame({"src": src[keep], "dst": dst[keep],
                         "w": rng.integers(1, 10, keep.sum())})


def _engine_sssp_pregel(edges: pd.DataFrame, src: int) -> dict:
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.graph.program import SSSPPregelProgram
    g = Graph.from_edges(ray.data.from_pandas(edges), weight_col="w")
    try:
        out = g.to_oid(
            g.engine.run_program(SSSPPregelProgram(g.vid_of_oid(src)),
                                 max_round=200, stop_when_zero=True),
            vid_cols=("vid",)).to_pandas()
    finally:
        g.close()
    return dict(zip(out["vid"], out["dist"]))


class TestReferenceSSSPUnmodified:
    def test_matches_engine_sssp_pregel(self):
        rng = np.random.default_rng(5)
        edges = _rand_edges(rng)
        src = int(edges["src"].iloc[0])
        app = SSSP_Pregel()
        df = app(edges, src=src).to_dataframe()
        got = dict(zip(df["id"], df["value"]))
        exp = _engine_sssp_pregel(edges, src)
        assert set(got) == set(exp)
        for k, d in exp.items():
            g = got[k]
            if np.isinf(d):
                assert g == 1000000000.0, k  # reference's MAX sentinel
            else:
                assert g == pytest.approx(d), k

    def test_combine_variant_identical(self):
        rng = np.random.default_rng(6)
        edges = _rand_edges(rng)
        src = int(edges["src"].iloc[0])
        a = SSSP_Pregel()(edges, src=src).to_dataframe()
        b = SSSP_Pregel_Combine()(edges, src=src).to_dataframe()
        pd.testing.assert_frame_equal(a, b)

    def test_selector_dict(self):
        edges = pd.DataFrame({"src": [0, 1], "dst": [1, 2],
                              "w": [3, 4]})
        ctx = SSSP_Pregel()(edges, src=0)
        df = ctx.to_dataframe({"node": "v:person.id",
                               "r": "r:person"})
        assert list(df.columns) == ["node", "r"]
        assert dict(zip(df["node"], df["r"])) == \
            {0: 0.0, 1: 3.0, 2: 7.0}

    def test_num_parts_invariance(self):
        rng = np.random.default_rng(7)
        edges = _rand_edges(rng, n=40, m=150)
        src = int(edges["src"].iloc[0])
        a = run_pregel(SSSP_Pregel, edges, num_parts=1,
                       src=src).to_dataframe()
        b = run_pregel(SSSP_Pregel, edges, num_parts=5,
                       src=src).to_dataframe()
        pd.testing.assert_frame_equal(a, b)


class TestDecoratorValidation:
    def test_requires_class(self):
        with pytest.raises(ValueError):
            pregel(vd_type="double", md_type="double")(lambda: None)

    def test_requires_methods(self):
        with pytest.raises(ValueError, match="Init"):
            @pregel(vd_type="double", md_type="double")
            class Missing:
                @staticmethod
                def Compute(messages, v, context):
                    pass

    def test_requires_staticmethod(self):
        with pytest.raises(ValueError, match="staticmethod"):
            @pregel(vd_type="double", md_type="double")
            class NotStatic:
                def Init(self, v, context):
                    pass

                @staticmethod
                def Compute(messages, v, context):
                    pass

    def test_double_decorate_raises(self):
        with pytest.raises(RuntimeError):
            pregel(vd_type="double", md_type="double")(SSSP_Pregel)


class TestAggregators:
    def test_sum_max_min_visible_next_superstep(self):
        # asserts run INSIDE Compute (the reference pattern,
        # test_udf_app.py:425-460); a failure surfaces as a
        # RayTaskError. The sentinel value proves the assert path ran.
        @pregel(vd_type="double", md_type="double")
        class AggApp(AppAssets):
            @staticmethod
            def Init(v, context):
                v.set_value(0.0)
                context.register_aggregator(
                    b"s", PregelAggregatorType.kInt64SumAggregator)
                context.register_aggregator(
                    b"mx", PregelAggregatorType.kInt64MaxAggregator)
                context.register_aggregator(
                    b"bo", PregelAggregatorType.kBoolOrAggregator)

            @staticmethod
            def Compute(messages, v, context):
                if context.superstep() == 0:
                    context.aggregate(b"s", 1)
                    context.aggregate(b"mx", int(v.id()))
                    context.aggregate(b"bo", False)
                    # keep everyone awake for one more superstep
                    v.send(v.id(), 0.0)
                else:
                    assert context.get_aggregated_value(b"s") == 4
                    assert context.get_aggregated_value(b"mx") == 3
                    assert context.get_aggregated_value(b"bo") is \
                        False
                    v.set_value(42.0)
                    v.vote_to_halt()

            @staticmethod
            def Combine(messages):
                return 0.0

        edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3],
                              "w": [1, 1, 1]})
        df = run_pregel(AggApp, edges, num_parts=3).to_dataframe()
        assert (df["value"] == 42.0).all()  # the assert branch ran


def test_run_pregel_rejects_undecorated():
    class Nope:
        pass

    with pytest.raises(ValueError, match="decorated"):
        run_pregel(Nope, pd.DataFrame({"src": [0], "dst": [1]}))
