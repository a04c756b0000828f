"""Selector-language contexts (reference context.py:275-393): labeled
and unlabeled selection over app results."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.graph.api import Graph
from graphscope_ray.graph.context import Context

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gctx():
    import duckdb
    e0 = duckdb.sql(f"""
WITH occ AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM read_parquet('{SF}/lineitem.parquet'))
SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*)::BIGINT AS weight
FROM occ a JOIN occ b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2""").df()
    g = Graph.from_edges(ray.data.from_pandas(e0), weight_col="weight",
                         symmetrize=True)
    pr = g.pagerank(max_round=5)  # (vid, rank)
    import pyarrow as pa
    import pyarrow.compute as pc

    def lab(t: pa.Table) -> pa.Table:
        even = pc.equal(pc.bit_wise_and(t["oid"], 1), 0)
        return pa.table({
            "vid": t["vid"],
            "label": pc.if_else(even, "even", "odd"),
            "parity": pc.bit_wise_and(t["oid"], 1),
        })

    verts = g.idmap.map_batches(lab, batch_format="pyarrow")
    ctx = Context(g, pr, vertices=verts)
    yield g, ctx
    g.close()


def test_unlabeled_id_and_result(gctx):
    g, ctx = gctx
    df = ctx.to_dataframe({"id": "v.id", "rank": "r"})
    assert set(df.columns) == {"id", "rank"}
    assert len(df) == g.store.num_vertices
    # r == r.rank
    r2 = ctx.to_numpy("r.rank")
    assert np.allclose(np.sort(r2), np.sort(df["rank"].to_numpy()))


def test_labeled_selection_filters_rows(gctx):
    g, ctx = gctx
    df = ctx.to_dataframe({"id": "v:even.id", "rank": "r:even"})
    assert (df["id"].to_numpy() % 2 == 0).all()
    odd = ctx.to_dataframe({"id": "v:odd.id"})
    assert len(df) + len(odd) == g.store.num_vertices
    assert (odd["id"].to_numpy() % 2 == 1).all()


def test_vertex_property_selector(gctx):
    g, ctx = gctx
    df = ctx.to_dataframe({"id": "v.id", "p": "v.parity"})
    assert (df["p"].to_numpy() == df["id"].to_numpy() % 2).all()


def test_vertex_range(gctx):
    g, ctx = gctx
    oids = np.sort(g.oid_array)
    lo, hi = int(oids[3]), int(oids[10])
    df = ctx.to_dataframe({"id": "v.id"}, vertex_range={"begin": lo,
                                                        "end": hi})
    want = oids[(oids >= lo) & (oids < hi)]
    assert sorted(df["id"].tolist()) == sorted(want.tolist())


def test_mixed_labels_rejected(gctx):
    _, ctx = gctx
    with pytest.raises(ValueError, match="mix labels"):
        ctx.select({"a": "v:even.id", "b": "r:odd"})


def test_r_ambiguity_and_missing_column(gctx):
    g, ctx = gctx
    import pyarrow as pa

    def two(t: pa.Table) -> pa.Table:
        return t.append_column("rank2", t["rank"])

    ctx2 = Context(g, ctx.result.map_batches(two, batch_format="pyarrow"),
                   vertices=ctx.vertices)
    with pytest.raises(ValueError, match="ambiguous"):
        ctx2.select({"x": "r"})
    with pytest.raises(KeyError):
        ctx.select({"x": "r.nope"})


def test_select_by_label_one_run():
    """Round-5 (VERDICT ask #8): one app result feeding BOTH labels'
    selections (reference property_pagerank.h /
    LabeledVertexPropertyContext)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from graphscope_ray.graph.api import Graph
    from graphscope_ray.graph.context import Context

    edges = pd.DataFrame({"src": [10, 11, 12, 13],
                          "dst": [11, 12, 13, 10]})
    g = Graph.from_edges(ray.data.from_pandas(edges), symmetrize=True)
    try:
        res = g.wcc().materialize()

        def lab(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            even = pc.equal(pc.bit_wise_and(t["oid"], 1), 0)
            return pa.table({"vid": t["vid"],
                             "label": pc.if_else(even, "even", "odd")})

        ctx = Context(g, res, vertices=g.idmap.map_batches(
            lab, batch_format="pyarrow"))
        out = ctx.select_by_label(
            ["even", "odd"],
            {"id": "v:{label}.id", "comp": "r:{label}"}).to_pandas()
        out = out.sort_values("id").reset_index(drop=True)
        assert out["id"].tolist() == [10, 11, 12, 13]
        assert out["label"].tolist() == ["even", "odd", "even", "odd"]
        assert out["comp"].nunique() == 1  # one 4-cycle component
        assert set(out.columns) == {"id", "comp", "label"}
    finally:
        g.close()
