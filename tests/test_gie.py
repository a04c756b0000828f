"""GIE-lite traversal core (graphscope_ray/gie/) vs pandas oracles.

Every trial runs BOTH adjacency routes (broadcast CSR and the
cogroup_join shuffle) and demands identical results; fixed fixtures
pin bag (multiplicity) semantics, path tracking, and the predicate
surface. Reference scope: query_flow.proto:65-116 operator enum.
"""
import numpy as np
import pandas as pd
import pytest

import ray.data

from graphscope_ray.gie import P, PropertyGraph


def _fixture_graph(broadcast_limit):
    verts = pd.DataFrame({
        "id": [1, 2, 3, 10, 11, 12, 20],
        "label": ["person", "person", "person", "post", "post",
                  "post", "tag"],
        "age": [29, 35, 41, 0, 0, 0, 0],
    })
    edges = pd.DataFrame({
        "src": [1, 1, 2, 3, 10, 10, 11, 12, 1],
        "dst": [10, 11, 11, 12, 20, 20, 20, 20, 2],
        "label": ["wrote", "wrote", "wrote", "wrote", "tagged",
                  "tagged", "tagged", "tagged", "knows"],
        "w": [1.0, 2.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5, 9.0],
    })
    return PropertyGraph(ray.data.from_pandas(verts),
                         ray.data.from_pandas(edges),
                         broadcast_limit=broadcast_limit)


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_core_steps(bl):
    g = _fixture_graph(bl)
    assert g.V().count() == 7
    assert g.V("person").count() == 3
    assert g.E("wrote").count() == 4
    assert g.V("person").has("age", P.gt(30)).count() == 2
    assert g.V("person").has("age", 35).count() == 1
    # bag semantics: post 10 has TWO parallel 'tagged' edges to 20
    assert g.V("post").out("tagged").count() == 4
    assert g.V("post").out("tagged").dedup().count() == 1
    assert sorted(g.V().has_id(11).in_("wrote").id_values()["t"]) == [1, 2]
    assert g.V().has_id(1).both("knows").id_values()["t"].tolist() == [2]
    assert sorted(
        g.V("person").out("wrote").out("tagged").dedup()
        .id_values()["t"]) == [20]
    # edge traversers carry properties
    assert g.V("person").outE("wrote").has("w", P.gte(2.0)).inV() \
        .id_values()["t"].tolist() == [11]
    assert sorted(g.E("knows").outV().id_values()["t"]) == [1]
    assert sorted(g.V("person").values("age").to_pandas()["age"]) == \
        [29, 35, 41]
    # tags + where: the only knows-cycle-free pair
    assert g.V("person").as_("a").out("knows").as_("b") \
        .where("a", "!=", "b").count() == 1
    # union preserves bags
    u = g.V("person").union(g.V("person"))
    assert u.count() == 6
    # repeat == manual unroll
    assert g.V().has_id(1).repeat(lambda t: t.out(), times=2).count() == \
        g.V().has_id(1).out().out().count()


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_path_and_order(bl):
    g = _fixture_graph(bl)
    t = g.V("person", track_path=True).out("wrote").out("tagged")
    paths = t.path().to_pandas().sort_values(["p0", "p1", "p2"])
    assert paths.values.tolist() == [
        [1, 10, 20], [1, 10, 20], [1, 11, 20],
        [2, 11, 20], [3, 12, 20]]
    assert t.simple_path().count() == t.count()
    # a cyclic walk is pruned by simple_path
    c = g.V(track_path=True).has_id(1).out("knows").in_("knows")
    assert c.count() == 1 and c.simple_path().count() == 0
    top = g.V("person").order_by("age", ascending=False,
                                 limit=2).to_pandas()
    assert top["t"].tolist() == [3, 2]
    gc = (g.V("person").out("wrote").in_("wrote")
          .group_count(by="age").to_pandas().sort_values("age"))
    assert gc.values.tolist() == [[29, 3], [35, 2], [41, 1]]
    gc2 = g.V("post").out("tagged").group_count().to_pandas()
    assert gc2.values.tolist() == [[20, 4]]


def test_randomized_routes_agree_and_match_pandas():
    rng = np.random.default_rng(42)
    for trial in range(4):
        n = int(rng.integers(20, 80))
        m = int(rng.integers(n, n * 5))
        verts = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "label": np.where(np.arange(n) % 3 == 0, "a", "b"),
            "score": rng.integers(0, 100, n).astype(np.int64)})
        edges = pd.DataFrame({
            "src": rng.integers(0, n, m).astype(np.int64),
            "dst": rng.integers(0, n, m).astype(np.int64),
            "label": np.where(rng.integers(0, 2, m) == 0, "x", "y"),
            "w": rng.random(m).round(6)})
        out = {}
        for bl in (10**9, 0):
            g = PropertyGraph(ray.data.from_pandas(verts),
                              ray.data.from_pandas(edges),
                              broadcast_limit=bl)
            t = g.V("a").has("score", P.gte(30)).out("x").out().dedup()
            out[bl] = sorted(t.id_values()["t"])
            out[(bl, "cnt")] = g.V().out().in_().count()
            gc = g.V("b").out("y").group_count(by="score").to_pandas()
            out[(bl, "gc")] = gc.sort_values("score").reset_index(
                drop=True)
        assert out[10**9] == out[0]
        assert out[(10**9, "cnt")] == out[(0, "cnt")]
        pd.testing.assert_frame_equal(out[(10**9, "gc")], out[(0, "gc")])
        # pandas bag oracle for the dedup pipeline
        ga = verts[(verts.label == "a") & (verts.score >= 30)]["id"]
        h1 = edges[(edges.label == "x") & edges.src.isin(ga)]
        merged = h1.merge(edges, left_on="dst", right_on="src")
        assert out[0] == sorted(set(merged["dst_y"]))
        # pandas oracle for out().in_() bag size
        cnt = edges.merge(edges, left_on="dst", right_on="dst")
        assert out[(0, "cnt")] == len(cnt)


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_edge_moves_and_other_v(bl):
    g = _fixture_graph(bl)
    # inE mirrors outE
    assert sorted(g.V().has_id(11).inE("wrote").outV()
                  .id_values()["t"]) == [1, 2]
    # bothE = incident either way (vertex 2: knows-in from 1,
    # wrote-out to 11)
    assert g.V().has_id(2).bothE().count() == 2
    # otherV always steps AWAY from the anchor
    assert sorted(g.V().has_id(2).bothE().otherV()
                  .id_values()["t"]) == [1, 11]
    assert sorted(g.V().has_id(11).inE("wrote").otherV()
                  .id_values()["t"]) == [1, 2]
    # bothV: two traversers per edge
    assert sorted(g.E("knows").bothV().id_values()["t"]) == [1, 2]
    # edge traversers expose their label now
    assert g.V("person").outE().has("label", "knows").inV() \
        .id_values()["t"].tolist() == [2]
    with pytest.raises(ValueError):
        g.E("knows").otherV()


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_degree_sample_filters(bl):
    g = _fixture_graph(bl)
    d = (g.V("person").degree_local("out", name="deg")
         .to_pandas().sort_values("t"))
    assert d[["t", "deg"]].values.tolist() == [[1, 3], [2, 1], [3, 1]]
    din = (g.V("post").degree_local("in", "wrote", name="k")
           .filter_col("k", P.gte(2)).id_values())
    assert din["t"].tolist() == [11]
    db = (g.V().has_id(2).degree_local("both", name="b").to_pandas())
    assert db["b"].tolist() == [2]  # out 2→11 plus in 1→2
    # sample: deterministic, size-capped, subset of the bag
    s1 = sorted(g.V().sample(3, seed=7).id_values()["t"])
    s2 = sorted(g.V().sample(3, seed=7).id_values()["t"])
    assert s1 == s2 and len(s1) == 3
    assert set(s1) <= set(range(1, 21))
    full = sorted(g.V().sample(100).id_values()["t"])
    assert full == [1, 2, 3, 10, 11, 12, 20]
    # coin: deterministic; p=1 keeps all, p=0 drops all
    assert g.V().coin(1.0).count() == 7
    assert g.V().coin(0.0).count() == 0


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_where_exists(bl):
    g = _fixture_graph(bl)
    # persons who wrote a post that got tagged = 1, 2, 3 minus none;
    # narrow: persons whose post has >= 2 taggings → post 20's parents
    has_post = g.V("person").where_exists(lambda t: t.out("wrote"))
    assert sorted(has_post.id_values()["t"]) == [1, 2, 3]
    # vertices with NO outgoing edge at all: the tag vertex 20
    sinks = g.V().where_not_exists(lambda t: t.out())
    assert sorted(sinks.id_values()["t"]) == [20]
    # nested predicate inside the sub-traversal
    heavy = g.V("person").where_exists(
        lambda t: t.outE("wrote").has("w", P.gte(2.0)))
    assert heavy.id_values()["t"].tolist() == [1]


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_repeat_until(bl):
    g = _fixture_graph(bl)
    # persons walk out until they stand on a tag vertex: mixed exit
    # depths (person-(knows)->person adds a 3-hop route), bag semantics
    t = g.V("person").repeat_until(lambda s: s.out(),
                                   lambda s: s.has_label("tag"),
                                   max_times=5)
    # pandas oracle: BFS-expand, exit on label == tag
    got = sorted(t.id_values()["t"])
    verts = {1: "person", 2: "person", 3: "person", 10: "post",
             11: "post", 12: "post", 20: "tag"}
    adj = {1: [10, 11, 2], 2: [11], 3: [12], 10: [20, 20],
           11: [20], 12: [20], 20: []}
    frontier = [1, 2, 3]
    out = []
    for _ in range(5):
        nxt = [d for v in frontier for d in adj[v]]
        out += [v for v in nxt if verts[v] == "tag"]
        frontier = [v for v in nxt if verts[v] != "tag"]
        if not frontier:
            break
    assert got == sorted(out)
    # until satisfied immediately after one step for direct tag parents
    one = g.V("post").repeat_until(lambda s: s.out(),
                                   lambda s: s.has_label("tag"))
    assert one.id_values()["t"].tolist() == [20, 20, 20, 20]


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_range_and_select_map(bl):
    g = _fixture_graph(bl)
    # ordered paging: persons by age desc → [35] is the [1, 2) slice
    page = g.V("person").order_by("age", ascending=False).range_(1, 2)
    assert page.dataset().to_pandas()["age"].tolist() == [35]
    with pytest.raises(ValueError):
        g.V().range_(3, 3)
    # n-ary select: (person, post) pairs for each wrote->tagged walk
    proj = (g.V("person").as_("a").out("wrote").as_("b")
            .out("tagged").select_map("a", "b", current="c")
            .to_pandas().sort_values(["a", "b", "c"]))
    assert proj.columns.tolist() == ["a", "b", "c"]
    # post 10 double-tags 20 → person 1 contributes (1,10,20)x2,(1,11,20)
    assert proj.values.tolist() == [
        [1, 10, 20], [1, 10, 20], [1, 11, 20],
        [2, 11, 20], [3, 12, 20]]
    with pytest.raises(KeyError):
        g.V("person").select_map("missing")


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_aggregates_and_value_map(bl):
    g = _fixture_graph(bl)
    assert g.V("person").sum_("age") == 105
    assert g.V("person").max_("age") == 41
    assert g.V("person").min_("age") == 29
    assert g.V("person").mean_("age") == pytest.approx(35.0)
    assert g.E("wrote").sum_("w") == pytest.approx(5.0)
    # grouped aggregates (SUM_BY_KEY family): per-destination tag
    # weight over the 'tagged' edges
    gs = (g.E("tagged").group_agg("e_dst", "e_w", "sum", name="tw")
          .to_pandas())
    assert gs.values.tolist() == [[20, 2.0]]
    gm = (g.V("person").group_agg("label", "age", "max", name="m")
          .to_pandas())
    assert gm.values.tolist() == [["person", 41]]
    ga = (g.V().group_agg("label", "age", "mean", name="avg_age")
          .to_pandas().sort_values("label"))
    assert ga[ga.label == "person"]["avg_age"].tolist() == [35.0]
    vm = (g.V("person").value_map("age", "label").to_pandas()
          .sort_values("t"))
    assert vm["age"].tolist() == [29, 35, 41]


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_subgraph(bl):
    g = _fixture_graph(bl)
    sg = g.V("person").outE("wrote").subgraph()
    assert sg.edges.count() == 4
    assert sorted(sg.vertices.to_pandas()["id"]) == [1, 2, 3, 10, 11, 12]
    # the subgraph is itself traversable, labels/props intact
    assert sg.V("post").count() == 3
    assert sg.E("wrote").sum_("w") == pytest.approx(5.0)
    assert sg.V().has_id(1).out("wrote").count() == 2


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_fold_by_key_and_unfold(bl):
    from graphscope_ray.gie import unfold
    g = _fixture_graph(bl)
    t = g.V("person").as_("p").out("wrote")
    # fold: sorted post lists per person (10,10 duplicate kept? no —
    # person 1 wrote 10 and 11; bag has one row per edge)
    pdf = (t.fold_by_key("tag_p", "t").to_pandas()
           .sort_values("tag_p").reset_index(drop=True))
    assert pdf["tag_p"].tolist() == [1, 2, 3]
    assert [list(x) for x in pdf["fold_t"]] == [[10, 11], [11], [12]]
    # RANGE_LOCAL: limit=1 keeps the smallest per key
    lim = (t.fold_by_key("tag_p", "t", limit=1, name="first")
           .to_pandas().sort_values("tag_p"))
    assert [list(x) for x in lim["first"]] == [[10], [11], [12]]
    # duplicate traverser rows stay in the fold (bag semantics):
    # both(..) reaches 20 twice from post 10
    bag = g.V().has_id(10).both("tagged").as_("a").select("a")
    fb = bag.fold_by_key("tag_a", "t").to_pandas()
    assert [list(x) for x in fb["fold_t"]] == [[20, 20]]
    # unfold round-trips the fold (minus order within equal rows)
    flat = (unfold(t.fold_by_key("tag_p", "t"), "fold_t")
            .to_pandas().sort_values(["tag_p", "fold_t"]))
    assert list(map(tuple, flat.itertuples(index=False))) == \
        [(1, 10), (1, 11), (2, 11), (3, 12)]
    # property-valued fold via attach
    ages = g.V("person").fold_by_key("label", "age").to_pandas()
    assert [list(x) for x in ages["fold_age"]] == [[29, 35, 41]]
    # empty bag → typed empty fold, unfold of it stays empty
    e = g.V("nope").as_("p").out("wrote").fold_by_key("tag_p", "t")
    assert e.count() == 0
    assert unfold(e, "fold_t").count() == 0


def test_program_bridge():
    g = _fixture_graph(10**9)
    # wcc: {1,2,3,10,11,12,20} all connect (posts→tag 20 bridges the
    # wrote components; 1-knows-2 too); no singleton in the fixture
    wcc = g.program("wcc").to_pandas().sort_values("id")
    assert wcc["comp"].tolist() == [1] * 7
    # add an isolated vertex → singleton component
    import pandas as pd
    iso = PropertyGraph(
        g.vertices.union(ray.data.from_pandas(pd.DataFrame(
            {"id": [99], "label": ["tag"], "age": [0]}))),
        g.edges)
    wcc2 = iso.program("wcc").to_pandas().sort_values("id")
    assert wcc2[wcc2["id"] == 99]["comp"].tolist() == [99]
    # pagerank/cdlp run over edge-endpoint vertices and sum sensibly
    pr = g.program("pagerank", delta=0.85, max_round=5).to_pandas()
    assert len(pr) == 7 and (pr["rank"] > 0).all()
    cd = g.program("cdlp", max_round=4).to_pandas()
    assert len(cd) == 7
    ht = g.program("hits", tolerance=0.0, max_round=10).to_pandas()
    assert {"auth", "hub"} <= set(ht.columns)
    with pytest.raises(ValueError):
        g.program("nope")


def test_errors():
    g = _fixture_graph(10**9)
    with pytest.raises(TypeError):
        g.V().inV()
    with pytest.raises(TypeError):
        g.E("wrote").out()
    with pytest.raises(ValueError):
        g.V().out().simple_path()


def test_count_limit_and_estimate_count():
    import numpy as np
    n = 3000
    verts = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                          "label": ["v"] * n, "age": [0] * n})
    edges = pd.DataFrame({"src": [0], "dst": [1],
                          "label": ["e"], "w": [1.0]})
    g = PropertyGraph(ray.data.from_pandas(verts),
                      ray.data.from_pandas(edges))
    t = g.V("v")
    assert t.count_limit(50) == 50
    assert t.count_limit(10**9) == n
    est = t.estimate_count(p=12)
    assert abs(est - n) / n < 0.1
    # bag duplicates don't inflate the DISTINCT estimate
    est2 = t.union(t).estimate_count(p=12)
    assert est2 == pytest.approx(est)
    # deterministic: same seed → identical estimate
    assert t.estimate_count(p=12) == est


@pytest.mark.parametrize("bl", [10**9, 0], ids=["broadcast", "shuffle"])
def test_lambda_steps(bl):
    g = _fixture_graph(bl)
    # LAMBDA_FILTER: even-id persons
    ev = (g.V("person").lambda_filter(lambda df: df["t"].to_numpy() % 2 == 0)
          .id_values()["t"].tolist())
    assert ev == [2]
    # LAMBDA_MAP: computed column feeds filter_col
    sq = (g.V("person")
          .lambda_map("sq", lambda df: df["t"].to_numpy() ** 2)
          .filter_col("sq", P.gte(4)).to_pandas().sort_values("t"))
    assert sq["sq"].tolist() == [4, 9]
    # LAMBDA_FLATMAP: duplicate every traverser (bag doubles)
    import pandas as pd
    dup = g.V("person").lambda_flatmap(
        lambda df: pd.concat([df, df], ignore_index=True))
    assert dup.count() == 6
    # empty bag survives all three
    e = g.V("nope")
    assert e.lambda_filter(lambda df: df["t"].to_numpy() > 0).count() == 0
    assert e.lambda_map("z", lambda df: df["t"].to_numpy()).count() == 0
    assert e.lambda_flatmap(lambda df: df).count() == 0


def test_program_bridge_sssp_lpa():
    """Round-5: the program() bridge exposes sssp and lpa (reference
    ShortestPathVertexProgramTreeNode.java /
    LpaVertexProgramTreeNode.java)."""
    import numpy as np
    g = _fixture_graph(10**9)
    # unit-hop distances from person 1
    ss = g.program("sssp", source=1, unit=True).to_pandas()
    d = dict(zip(ss["id"], ss["dist"]))
    assert d[1] == 0 and d[10] == 1 and d[11] == 1 and d[2] == 1
    assert d[20] == 2
    assert not np.isfinite(d[3])  # 3 unreachable along out-edges
    # weighted distances via the edge property
    sw = g.program("sssp", source=1, weight="w").to_pandas()
    dw = dict(zip(sw["id"], sw["dist"]))
    assert dw[10] == 1.0 and dw[11] == 2.0 and dw[20] == 1.5
    # lpa == the engine's weighted cdlp on the same symmetrized edges
    from graphscope_ray.graph.api import Graph
    lp = g.program("lpa", max_round=4, weight="w").to_pandas()
    gg = Graph.from_edges(
        g.edges.select_columns(["src", "dst", "w"]),
        weight_col="w", symmetrize=True)
    try:
        exp = gg.to_oid(gg.lpa(max_round=4),
                        vid_cols=("vid", "label")).to_pandas()
    finally:
        gg.close()
    lp = lp.sort_values("id").reset_index(drop=True)
    exp = exp.rename(columns={"vid": "id"}).sort_values(
        "id").reset_index(drop=True)
    assert lp["id"].tolist() == exp["id"].tolist()
    assert lp["label"].tolist() == exp["label"].tolist()
