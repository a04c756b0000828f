"""Upstream networkx test_generic.py (TestGenericPath) against the
engine-backed facade.

Engine-graded: the nx.shortest_path / nx.has_path four-form overload
on int/str-node graphs with default method — source+target path
lists, single-source dicts, target-only reversed runs, and the
NetworkXNoPath contract. Fallback: explicit method= variants and
weighted forms beyond a plain edge attribute."""
from tests.nx_upstream.harness import engine_wrap, load_upstream


def _sp_ok(G, *a, **k):
    return (len(a) <= 2 and set(k) <= {"source", "target", "weight"}
            and k.get("weight") in (None, "weight"))


_OVERRIDES = {
    "shortest_path": engine_wrap("shortest_path", supports=_sp_ok),
    "has_path": engine_wrap(
        "has_path",
        supports=lambda G, *a, **k: (len(a) == 2 and not k)
        or (not a and set(k) <= {"source", "target"})),
}

_mod = load_upstream(
    "networkx.algorithms.shortest_paths.tests.test_generic",
    _OVERRIDES)
for _k, _v in vars(_mod).items():
    if _k in ("TestGenericPath",):
        globals()[_k] = _v
