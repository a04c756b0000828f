"""Upstream networkx test_degree_centrality.py against the
engine-backed facade (reference pattern
`python/graphscope/nx/tests/algorithms/builtin/`).

Engine-graded: degree_centrality / in_degree_centrality /
out_degree_centrality on int/str-node graphs (exact fractions — no
tolerance needed). Fallback: multigraphs only."""
from tests.nx_upstream.harness import engine_wrap, load_upstream


def _plain(G, *a, **k):
    return not a and not k


_OVERRIDES = {
    "degree_centrality": engine_wrap("degree_centrality",
                                     supports=_plain),
    "in_degree_centrality": engine_wrap(
        "in_degree_centrality",
        supports=lambda G, *a, **k: G.is_directed() and not a
        and not k),
    "out_degree_centrality": engine_wrap(
        "out_degree_centrality",
        supports=lambda G, *a, **k: G.is_directed() and not a
        and not k),
}

_mod = load_upstream(
    "networkx.algorithms.centrality.tests.test_degree_centrality",
    _OVERRIDES)
globals().update({k: v for k, v in vars(_mod).items()
                  if not k.startswith("__")})
