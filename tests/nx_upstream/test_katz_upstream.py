"""Upstream networkx test_katz_centrality.py (power-iteration classes)
against the engine-backed facade.

Engine-graded: katz_centrality with positional/keyword alpha and
scalar beta on int-node graphs — upstream compares against known
eigen-solutions at ~1e-4, grading the engine's power iteration and
L2 normalization directly. Fallback: dict betas, nstart, weighted
variants, and the numpy/scipy solver classes."""
from tests.nx_upstream.harness import engine_wrap, load_upstream


def _katz_ok(G, *a, **k):
    if len(a) > 1:
        return False
    kw = set(k) - {"alpha", "beta", "max_iter", "tol", "normalized"}
    if kw:
        return False
    beta = k.get("beta", 1.0)
    return isinstance(beta, (int, float))


_OVERRIDES = {
    "katz_centrality": engine_wrap("katz_centrality",
                                   supports=_katz_ok),
}

_mod = load_upstream(
    "networkx.algorithms.centrality.tests.test_katz_centrality",
    _OVERRIDES)
for _k, _v in vars(_mod).items():
    if _k in ("TestKatzCentrality",):
        globals()[_k] = _v
