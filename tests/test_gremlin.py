"""Gremlin-string frontend: parser unit tests, string-vs-builder-DSL
differential on a small property graph, and a parser fuzz campaign
(random valid chains parse + execute; unsupported steps raise naming
the op). Reference surface: interactive_engine/src/frontend compiles
Gremlin text into query_flow.proto ops 65-116."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.gie import (GremlinParseError, P, PropertyGraph,
                                run_gremlin as gremlin)
from graphscope_ray.gie.gremlin import Chain, parse


@pytest.fixture(scope="module")
def pg():
    """customer(0,4,8) -[places]-> order(1,5,9,13) -[contains{qty}]->
    part(2,6,10): ids namespaced i*4+code like the driver's gie graph."""
    verts = pd.DataFrame({
        "t": [0, 4, 8, 1, 5, 9, 13, 2, 6, 10],
        "label": ["customer"] * 3 + ["order"] * 4 + ["part"] * 3,
        "bal": [10.0, -5.0, 99.0, 0, 0, 0, 0, 0, 0, 0],
    })
    edges = pd.DataFrame({
        "src": [0, 0, 4, 8, 1, 1, 5, 9, 13, 13],
        "dst": [1, 5, 9, 13, 2, 6, 6, 10, 2, 10],
        "label": ["places"] * 4 + ["contains"] * 6,
        "qty": [0, 0, 0, 0, 5.0, 10.0, 20.0, 30.0, 40.0, 50.0],
    })
    return PropertyGraph(
        ray.data.from_pandas(verts.rename(columns={"t": "id"})),
        ray.data.from_pandas(edges))


def _pdf(x):
    if hasattr(x, "dataset"):
        x = x.dataset()
    if hasattr(x, "to_pandas"):
        x = x.to_pandas()
    if isinstance(x, pd.DataFrame):
        return x.sort_values(list(x.columns)).reset_index(drop=True)
    return x


class TestParser:
    def test_basic_chain(self):
        steps = parse("g.V('customer').has('bal', gt(0.0)).out('places')"
                      ".groupCount()")
        assert [s[0] for s in steps] == ["V", "has", "out", "groupCount"]
        assert steps[0][1] == ["customer"]
        pred = steps[1][1][1]
        assert bool(pred(np.array([1.0]))[0]) is True
        assert bool(pred(np.array([-1.0]))[0]) is False

    def test_predicates(self):
        for text, val, expect in [
                ("eq(3)", 3, True), ("neq(3)", 3, False),
                ("gte(2)", 2, True), ("lt(2)", 2, False),
                ("lte(2)", 2, True),
                ("within(1, 2, 3)", 2, True),
                ("between(1, 3)", 2, True), ("between(1, 3)", 1, True),
                ("inside(1, 3)", 2, True),
                # Gremlin inside is EXCLUSIVE on both ends
                ("inside(1, 3)", 1, False), ("inside(1, 3)", 3, False)]:
            pred = parse(f"g.V().has('x', {text})")[1][1][1]
            assert bool(pred(np.array([val]))[0]) is expect, text

    def test_string_escapes_and_floats(self):
        steps = parse("g.V().has('name', 'it\\'s').has('w', 1.5e-3)")
        assert steps[1][1][1] == "it's"
        assert steps[2][1][1] == 1.5e-3

    def test_anonymous_traversals(self):
        steps = parse("g.V().not(__.out('places')).where(out('contains'))")
        assert isinstance(steps[1][1][0], Chain)
        assert isinstance(steps[2][1][0], Chain)
        assert steps[1][1][0].steps[0] == ("out", ["places"])

    def test_unsupported_step_names_op(self):
        # syntactically valid unknown steps parse; execution names the op
        steps = parse("g.V().subgraphStep()")
        assert steps[1][0] == "subgraphStep"
        with pytest.raises(GremlinParseError, match="without"):
            parse("g.V().has('x', without(1))")

    def test_syntax_errors(self):
        for bad in ["V().out()", "g.V(", "g.V()out()", "g.V().has('x',)",
                    "g.V().has('x', !)"]:
            with pytest.raises(GremlinParseError):
                parse(bad)


class TestExecution:
    def test_source_and_filter(self, pg):
        out = _pdf(gremlin(pg, "g.V('customer').has('bal', gt(0.0))"))
        assert out["t"].tolist() == [0, 8]

    def test_hops_and_dedup(self, pg):
        s = "g.V('order').outE('contains').has('qty', gte(20.0)).inV().dedup()"
        a = _pdf(gremlin(pg, s))
        b = _pdf(pg.V("order").outE("contains").has("qty", P.gte(20.0))
                 .inV().dedup())
        pd.testing.assert_frame_equal(a, b)
        assert set(a["t"]) == {2, 6, 10}

    def test_tag_select_groupcount(self, pg):
        s = ("g.V('customer').as('c').out('places').out('contains')"
             ".select('c').groupCount()")
        a = _pdf(gremlin(pg, s))
        b = _pdf(pg.V("customer").as_("c").out("places").out("contains")
                 .select("c").group_count())
        pd.testing.assert_frame_equal(a, b)

    def test_order_by_fusion_with_limit(self, pg):
        s = "g.V('order').order().by('t', desc).limit(2)"
        a = _pdf(gremlin(pg, s))
        assert sorted(a["t"].tolist()) == [9, 13]

    def test_repeat_until(self, pg):
        s = ("g.V('customer').has('bal', gt(0.0)).repeat(out())"
             ".until(hasLabel('part')).groupCount()")
        a = _pdf(gremlin(pg, s))
        b = _pdf(pg.V("customer").has("bal", P.gt(0.0))
                 .repeat_until(lambda t: t.out(),
                               lambda t: t.has_label("part"))
                 .group_count())
        pd.testing.assert_frame_equal(a, b)

    def test_repeat_times(self, pg):
        a = _pdf(gremlin(pg, "g.V('customer').repeat(out()).times(2)"))
        b = _pdf(pg.V("customer").repeat(lambda t: t.out(), 2))
        pd.testing.assert_frame_equal(a, b)

    def test_not_semi_join(self, pg):
        s = "g.V('order').not(__.outE('contains').has('qty', gte(30.0)))"
        a = _pdf(gremlin(pg, s))
        assert set(a["t"]) == {1, 5}

    def test_terminal_scalars(self, pg):
        assert gremlin(pg, "g.V('part').count()") == 3
        assert gremlin(pg, "g.E('contains').sum('qty')") == pytest.approx(
            155.0)

    def test_fold_unfold_extension(self, pg):
        s = ("g.V('customer').as('c').out('places')"
             ".foldByKey('tag_c', 't', 1, 'o').unfold('o')")
        a = _pdf(gremlin(pg, s))
        # each customer keeps its smallest order id
        assert dict(zip(a["tag_c"], a["o"])) == {0: 1, 4: 9, 8: 13}

    def test_path_steps_autotrack(self, pg):
        # path()/simplePath() force V(track_path=True) transparently
        p = _pdf(gremlin(pg, "g.V('customer').out('places').path()"))
        assert set(p.columns) >= {"p0", "p1"}
        assert len(p) == 4  # one row per (customer, order) traverser
        sp = gremlin(pg, "g.V('order').both().both().simplePath()")
        assert len(_pdf(sp)) > 0

    def test_unsupported_execution_raises_with_name(self, pg):
        with pytest.raises(GremlinParseError, match="subgraphStep"):
            gremlin(pg, "g.V().subgraphStep()")
        with pytest.raises(GremlinParseError, match="source"):
            gremlin(pg, "g.addV('x')")


class TestParserFuzz:
    def test_random_chains_parse_and_execute(self, pg):
        """Random valid step chains: parse must succeed and execution
        must produce a Traversal whose dataset materializes."""
        rng = np.random.default_rng(404)
        hop_steps = ["out('places')", "out('contains')", "in('places')",
                     "both()", "dedup()", "hasLabel('order', 'part')",
                     "has('bal', gte(0.0))", "limit(5)", "as('x')",
                     "order().by('t', desc)"]
        for trial in range(25):
            n = rng.integers(1, 5)
            chain = ".".join(rng.choice(hop_steps, size=n))
            q = f"g.V().{chain}"
            res = gremlin(pg, q)
            df = _pdf(res)
            assert isinstance(df, pd.DataFrame), q

    def test_random_garbage_raises_parse_error(self):
        rng = np.random.default_rng(7)
        alphabet = list("g.V()'abc,123!@#__")
        for trial in range(50):
            s = "".join(rng.choice(alphabet,
                                   size=int(rng.integers(3, 30))))
            try:
                parse(s)
            except GremlinParseError:
                pass  # expected for almost everything
            except Exception as e:  # pragma: no cover
                raise AssertionError(
                    f"non-GremlinParseError {type(e).__name__} on {s!r}")


class TestUnionAndTagWhere:
    def test_union_branches(self, pg):
        s = "g.V('customer').union(__.out('places'), __.both())"
        a = _pdf(gremlin(pg, s))
        t = pg.V("customer")
        b = _pdf(t.out("places").union(t.both()))
        pd.testing.assert_frame_equal(a, b)

    def test_union_requires_chains(self, pg):
        with pytest.raises(GremlinParseError, match="union"):
            gremlin(pg, "g.V().union(5)")

    def test_tag_compare_where(self, pg):
        # orders whose customer tag differs from a second hop's tag
        s = ("g.V('customer').as('a').out('places').as('b')"
             ".where('a', '!=', 'b')")
        a = _pdf(gremlin(pg, s))
        b = _pdf(pg.V("customer").as_("a").out("places").as_("b")
                 .where("a", "!=", "b"))
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 4  # every (customer, order) pair differs


class TestGroupByRound5:
    """group().by(key).by(value-agg) — reference GroupTreeNode.java
    (non-count group values) routed to the coarse-bucket kernels."""

    def test_group_sum_string_vs_builder(self, pg):
        s = ("g.V('order').as('o').outE('contains')"
             ".group().by('o').by(__.values('qty').sum())")
        a = _pdf(gremlin(pg, s))
        b = _pdf(pg.V("order").as_("o").outE("contains")
                 .group_by("o", "qty", "sum"))
        pd.testing.assert_frame_equal(a, b)
        # oracle: per-order sum of contains-edge qty
        exp = {1: 15.0, 5: 20.0, 9: 30.0, 13: 90.0}
        got = dict(zip(a["o"], a["sum_qty"]))
        assert got == exp

    def test_group_mean_max_min(self, pg):
        for agg, exp13 in (("mean", 45.0), ("max", 50.0),
                           ("min", 40.0)):
            a = _pdf(gremlin(
                pg, f"g.V('order').as('o').outE('contains')"
                    f".group().by('o').by(__.values('qty').{agg}())"))
            got = dict(zip(a["o"], a.iloc[:, 1]))
            assert got[13] == exp13, agg

    def test_group_fold_default(self, pg):
        a = gremlin(pg, "g.V('customer').as('c').out('places')"
                        ".group().by('c')").to_pandas()
        got = {k: list(v) for k, v in zip(a["c"], a["fold_t"])}
        assert got == {0: [1, 5], 4: [9], 8: [13]}

    def test_group_count_modulator(self, pg):
        a = _pdf(gremlin(pg, "g.V('order').group().by(__.values('id'))"
                             ".by(__.count())"))
        assert set(a["id"]) == {1, 5, 9, 13}
        assert (a["count"] == 1).all()

    def test_group_vertex_property_value(self, pg):
        # group on tag, aggregate an attached VERTEX property
        a = _pdf(gremlin(pg, "g.V('customer').as('c').out('places')"
                             ".group().by('c')"
                             ".by(__.values('id').max())"))
        got = dict(zip(a["c"], a["max_id"]))
        assert got == {0: 5, 4: 9, 8: 13}

    def test_bad_group_specs_raise(self, pg):
        with pytest.raises(GremlinParseError):
            gremlin(pg, "g.V().group().by(5)")
        with pytest.raises(GremlinParseError):
            gremlin(pg, "g.V().group().by('id').by(__.out())")


class TestAndOrOptionalRound5:
    """and()/or() (AndTreeNode/OrTreeNode) + optional()
    (OptionalTreeNode) + predicate composition."""

    def test_and_step(self, pg):
        n = gremlin(pg, "g.V().and(__.out('places'), "
                        "__.has('bal', gt(0.0))).count()")
        assert n == 2  # customers 0 (10.0) and 8 (99.0)

    def test_or_step(self, pg):
        n = gremlin(pg, "g.V().or(__.hasLabel('part'), "
                        "__.has('bal', gt(50.0))).count()")
        assert n == 4  # 3 parts + customer 8

    def test_nested_and_inside_or(self, pg):
        n = gremlin(pg, "g.V().or(__.has('bal', lt(0.0)), "
                        "__.and(__.out('places'), "
                        "__.has('bal', gt(50.0)))).count()")
        assert n == 2  # customer 4 (-5) or customer 8 (99 + places)

    def test_where_and_arg_form(self, pg):
        n = gremlin(pg, "g.V().where(and(__.out('places'), "
                        "__.has('bal', gt(0.0)))).count()")
        assert n == 2

    def test_builder_and_or_match_strings(self, pg):
        a = _pdf(gremlin(pg, "g.V().and(__.out('places'), "
                             "__.has('bal', gt(0.0)))").dataset())
        b = _pdf(pg.V().and_where(
            lambda s: s.out("places"),
            lambda s: s.has("bal", P.gt(0.0))).dataset())
        pd.testing.assert_frame_equal(a, b)

    def test_pred_and_or_in_has(self, pg):
        assert gremlin(pg, "g.V().has('bal', and(gt(0.0), lt(50.0)))"
                           ".count()") == 1
        assert gremlin(pg, "g.V().has('bal', or(eq(99.0), eq(-5.0)))"
                           ".count()") == 2

    def test_pred_operators_builder(self, pg):
        t = pg.V().has("bal", P.gt(0.0) & P.lt(50.0))
        assert t.count() == 1
        t = pg.V().has("bal", ~P.eq(0.0))
        assert t.count() == 3

    def test_mixed_pred_traversal_args_raise(self):
        with pytest.raises(GremlinParseError):
            parse("g.V().has('bal', and(gt(0.0), __.out()))")

    def test_optional_replaces_on_hit(self, pg):
        df = _pdf(gremlin(pg, "g.V('customer')"
                              ".optional(__.out('places'))").dataset())
        # matched customers replaced by their orders
        assert sorted(df["t"]) == [1, 5, 9, 13]

    def test_optional_passthrough_on_miss(self, pg):
        df = _pdf(gremlin(pg, "g.V('part')"
                              ".optional(__.out('places'))").dataset())
        assert sorted(df["t"]) == [2, 6, 10]

    def test_optional_mixed(self, pg):
        # only customer 8's order 13 has qty-50 edges downstream:
        # customers WITH a places->13 hop are replaced, others stay
        df = _pdf(gremlin(
            pg, "g.V('customer').optional("
                "__.out('places').hasId(13))").dataset())
        assert sorted(df["t"]) == [0, 4, 13]

    def test_optional_kind_change_raises(self, pg):
        with pytest.raises(TypeError, match="kind"):
            gremlin(pg, "g.V('customer')"
                        ".optional(__.outE('places'))").dataset()

    def test_nested_where_not_preserves_outer_key(self, pg):
        # regression: nested sub-filters must not clobber the outer
        # _wk stamp (where(not(__...)) uses two nesting levels)
        n = gremlin(pg, "g.V().where(not(__.out('places'))).count()")
        assert n == 7  # everything except the 3 customers... 4+3 = 7

    def test_and_or_fuzz_vs_duckdb(self, pg):
        """Random and/or compositions over bal thresholds, checked
        against DuckDB on the same vertex table."""
        import duckdb
        verts = pg.vertices.to_pandas()
        con = duckdb.connect()
        con.register("v", verts)
        rng = np.random.default_rng(99)
        for trial in range(20):
            th1 = float(rng.choice([-5.0, 0.0, 10.0, 50.0, 99.0]))
            th2 = float(rng.choice([-5.0, 0.0, 10.0, 50.0, 99.0]))
            op = rng.choice(["and", "or"])
            q = (f"g.V().has('bal', {op}(gt({th1}), lt({th2})))"
                 f".count()")
            got = gremlin(pg, q)
            sql_op = "AND" if op == "and" else "OR"
            exp = con.execute(
                f"SELECT count(*) FROM v WHERE bal > {th1} "
                f"{sql_op} bal < {th2}").fetchone()[0]
            assert got == exp, q


class TestChooseConstantMathRound5:
    """choose()/constant()/math() (reference BranchTreeNode /
    CaseWhenTreeNode / ConstantTreeNode / MathTreeNode)."""

    def test_choose_branches(self, pg):
        # customers with bal>0 walk to their orders; the rest stay
        df = _pdf(gremlin(
            pg, "g.V('customer').choose(__.has('bal', gt(0.0)), "
                "__.out('places'), __.identity())").dataset()) \
            if False else gremlin(
            pg, "g.V('customer').choose(__.has('bal', gt(0.0)), "
                "__.out('places'))").to_pandas()
        # matched: 0 -> {1,5}, 8 -> {13}; unmatched: 4 stays
        assert sorted(df["t"]) == [1, 4, 5, 13]

    def test_choose_false_branch(self, pg):
        df = gremlin(
            pg, "g.V('customer').choose(__.has('bal', gt(0.0)), "
                "__.out('places'), __.both('places'))").to_pandas()
        # false branch: customer 4 walks both() -> order 9
        assert sorted(df["t"]) == [1, 5, 9, 13]

    def test_choose_kind_mismatch_raises(self, pg):
        with pytest.raises(TypeError, match="kind"):
            gremlin(pg, "g.V('customer').choose(__.has('bal', "
                        "gt(0.0)), __.outE('places'))").dataset()

    def test_constant(self, pg):
        t = gremlin(pg, "g.V('customer').constant(7)")
        vals = t.to_pandas()["constant"].tolist()
        assert vals == [7, 7, 7]
        assert gremlin(pg, "g.V('customer').constant(2.5).sum()") \
            == pytest.approx(7.5)

    def test_math(self, pg):
        got = gremlin(pg, "g.V('customer').values('bal')"
                          ".math('_ * 2 + 1').sum()")
        # bal: 10, -5, 99 -> 21 + -9 + 199 = 211
        assert got == pytest.approx(211.0)

    def test_math_functions_and_precedence(self, pg):
        got = sorted(gremlin(
            pg, "g.V('customer').values('bal')"
                ".math('abs(_) ^ 2 % 7')").to_pandas()["bal"])
        import numpy as np
        exp = sorted(np.mod(np.abs([10.0, -5.0, 99.0]) ** 2, 7))
        assert got == pytest.approx(exp)

    def test_math_rejects_garbage(self, pg):
        with pytest.raises(ValueError):
            gremlin(pg, "g.V().values('bal')"
                        ".math('__import__(1)')").dataset()


class TestCoalesceIdentityIsHasNotRound5:
    def test_coalesce_first_branch_wins(self, pg):
        n = gremlin(pg, "g.V('customer').coalesce(__.out('places'), "
                        "__.identity()).count()")
        assert n == 4  # every customer has orders

    def test_coalesce_fallback_identity(self, pg):
        n = gremlin(pg, "g.V('part').coalesce(__.out('places'), "
                        "__.identity()).count()")
        assert n == 3  # parts pass through

    def test_coalesce_three_branches(self, pg):
        # orders: contains-bag (6); customers: places (4); parts:
        # identity (3)
        n = gremlin(pg, "g.V().coalesce(__.out('contains'), "
                        "__.out('places'), __.identity()).count()")
        assert n == 13

    def test_coalesce_last_branch_drops_misses(self, pg):
        # no identity: parts (no out at all) vanish
        n = gremlin(pg, "g.V().coalesce(__.out('contains'), "
                        "__.out('places')).count()")
        assert n == 10

    def test_is_predicate(self, pg):
        assert gremlin(pg, "g.V('customer').values('bal')"
                           ".is(gt(0.0)).count()") == 2
        assert gremlin(pg, "g.V('customer').values('bal')"
                           ".is(-5.0).count()") == 1

    def test_has_not(self):
        import ray.data
        from graphscope_ray.gie import PropertyGraph
        verts = pd.DataFrame({"id": [0, 1, 2], "label": ["n"] * 3,
                              "x": [1.0, None, 3.0]})
        edges = pd.DataFrame({"src": [0], "dst": [1],
                              "label": ["e"]})
        g2 = PropertyGraph(ray.data.from_pandas(verts),
                           ray.data.from_pandas(edges))
        df = gremlin(g2, "g.V().hasNot('x')").to_pandas()
        assert df["t"].tolist() == [1]


class TestProjectRound5:
    def test_project_three_columns(self, pg):
        df = gremlin(pg, "g.V('customer')"
                         ".project('cid', 'balance', 'n')"
                         ".by(__.id()).by(__.values('bal'))"
                         ".by(__.out('places').count())") \
            .to_pandas().sort_values("cid")
        assert list(map(tuple, df.itertuples(index=False))) == \
            [(0, 10.0, 2), (4, -5.0, 1), (8, 99.0, 1)]

    def test_project_bare_prop_and_default_id(self, pg):
        df = gremlin(pg, "g.V('customer').project('who', 'b')"
                         ".by().by('bal')").to_pandas()
        assert set(df.columns) == {"who", "b"}
        assert sorted(df["who"]) == [0, 4, 8]

    def test_project_arity_mismatch_raises(self, pg):
        with pytest.raises(GremlinParseError, match="one by"):
            gremlin(pg, "g.V().project('a', 'b').by(__.id())")

    def test_project_unsupported_by_raises(self, pg):
        with pytest.raises(GremlinParseError, match="project"):
            gremlin(pg, "g.V().project('a').by(__.out())")
