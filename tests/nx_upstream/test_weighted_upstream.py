"""Upstream networkx test_weighted.py (TestWeightedPath) against the
engine-backed facade.

Engine-graded: single_source_dijkstra_path_length on graphs whose
edge weights live under the default 'weight' attribute — the upstream
class's fixture graphs (XG/XG2/XG3/XG4, cycles, grids) compare exact
distance dicts, grading the engine's weighted SSSP directly.
Fallback: cutoff kwarg, alternate weight names/callables, calls with
absent sources, and negative-weight graphs (nx's Dijkstra raises
there; the engine's Bellman-Ford fixpoint handles them)."""
from tests.nx_upstream.harness import engine_wrap, load_upstream


def _dj_ok(G, *a, **k):
    return (len(a) == 1 and a[0] in G
            and set(k) <= {"weight"}
            and k.get("weight", "weight") == "weight"
            # nx's Dijkstra raises ValueError on negative weights;
            # the engine's Bellman-Ford fixpoint handles them, so
            # those calls grade networkx against itself
            and all(d.get("weight", 1) >= 0
                    for _, _, d in G.edges(data=True)))


_OVERRIDES = {
    "single_source_dijkstra_path_length": engine_wrap(
        "single_source_dijkstra_path_length", supports=_dj_ok),
}

_mod = load_upstream(
    "networkx.algorithms.shortest_paths.tests.test_weighted",
    _OVERRIDES)
for _k, _v in vars(_mod).items():
    if _k in ("TestWeightedPath",):
        globals()[_k] = _v
