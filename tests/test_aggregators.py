"""Pregel aggregator zoo on the vertex-program surface (reference:
core/app/pregel/aggregators/, python/tests/test_udf_app.py:374-420)."""

import numpy as np

from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.engine import BSPEngine
from graphscope_ray.graph.program import GlobalStatsProgram

from conftest import edges_ds, random_graph


def test_aggregator_zoo(tmp_path):
    e, n, P = random_graph(), 60, 3
    store = build_graph(edges_ds(e), str(tmp_path / "agg"), num_parts=P,
                        num_vertices=n)
    eng = BSPEngine(store)
    out = eng.run_program(GlobalStatsProgram(), max_round=2)
    pdf = out.to_pandas().sort_values("vid")
    locals_ = [float(np.arange(p, n, P, dtype=np.int64).sum())
               for p in range(P)]
    assert (pdf["gmin"] == min(locals_)).all()
    assert (pdf["gmax"] == max(locals_)).all()
    assert (pdf["gsum"] == sum(locals_)).all()
    # and over [True, False, True] = False; or over [True, False, False]
    assert (pdf["gand"] == 0.0).all()
    assert (pdf["gor"] == 1.0).all()
    eng.shutdown()


def test_text_append_aggregator(tmp_path):
    """TextAppendAggregator analogue (text_aggregator.h:29-40):
    empty-delimiter concat of per-partition contributions, delivered
    back as the round's global aggregate."""
    from graphscope_ray.graph.program import VertexProgram

    class TextProg(VertexProgram):
        combine = "sum"
        result_columns = ("seen",)
        aggregators = {"txt": "text_append"}

        def init(self, ctx):
            return {"seen": np.zeros(ctx.nlocal)}

        def message(self, ctx, state):
            return None

        def apply(self, ctx, state, incoming, agg):
            if ctx.round == 2 and agg:
                state["seen"][:] = float(len(agg["txt"]))
            return 1, {"txt": f"p{ctx.part_id}"}

    e, n, P = random_graph(seed=9), 60, 3
    store = build_graph(edges_ds(e), str(tmp_path / "txt"), num_parts=P,
                       num_vertices=n)
    eng = BSPEngine(store)
    out = eng.run_program(TextProg(), max_round=2)
    pdf = out.to_pandas()
    # round-1 aggregate = "p0p1p2" (partition order), length 6
    assert (pdf["seen"] == 6.0).all()
    eng.shutdown()
