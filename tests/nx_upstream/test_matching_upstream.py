"""Upstream networkx test_matching.py (TestMaximalMatching) + 
test_mis.py against the engine-backed facade.

Engine-graded: maximal_matching on simple int-node graphs (upstream
asserts is_maximal_matching + size bounds — implementation-
independent), and the unseeded maximal_independent_set calls
(independence + maximality asserts). Fallback: self-loop graphs (the
facade models simple graphs), seeded MIS draws (upstream pins
networkx's own RNG trajectory), and the max_weight_matching family
(not implemented)."""
import networkx as _nx

from tests.nx_upstream.harness import engine_wrap, load_upstream


def _simple(G, *a, **k):
    return (not G.is_directed() and not a and not k
            and _nx.number_of_selfloops(G) == 0)


_M_OVERRIDES = {
    "maximal_matching": engine_wrap("maximal_matching",
                                    supports=_simple),
}
_MIS_OVERRIDES = {
    "maximal_independent_set": engine_wrap(
        "maximal_independent_set",
        supports=lambda G, *a, **k: (not G.is_directed() and not a
                                     and not k
                                     and _nx.number_of_selfloops(G)
                                     == 0)),
}

_m = load_upstream("networkx.algorithms.tests.test_matching",
                   _M_OVERRIDES)
for _k, _v in vars(_m).items():
    if _k == "TestMaximalMatching":  # only the engine-relevant class
        globals()[_k] = _v

_mis = load_upstream("networkx.algorithms.tests.test_mis",
                     _MIS_OVERRIDES)
for _k, _v in vars(_mis).items():
    if not _k.startswith("__") and _k not in globals():
        globals()[_k] = _v
