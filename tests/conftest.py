import os

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def edges_ds(edges_np: np.ndarray, weights=None) -> "ray.data.Dataset":
    cols = {
        "src": pa.array(edges_np[:, 0].astype("int64")),
        "dst": pa.array(edges_np[:, 1].astype("int64")),
    }
    if weights is not None:
        cols["weight"] = pa.array(np.asarray(weights, dtype="float64"))
    return ray.data.from_arrow(pa.table(cols))


def collect(ds, value_col, n, fill=None):
    """(vid, value) Dataset → dense numpy array of size n."""
    pdf = ds.to_pandas().sort_values("vid")
    if fill is None:
        assert len(pdf) == n, f"expected {n} rows, got {len(pdf)}"
        return pdf[value_col].to_numpy()
    out = np.full(n, fill, dtype=np.asarray(pdf[value_col]).dtype)
    out[pdf["vid"].to_numpy()] = pdf[value_col].to_numpy()
    return out


# ---- micro fixtures (FIXTURES.md §3) ---------------------------------

TWO_TRIANGLES_BRIDGE = np.array(
    [[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]]
)
STAR_HUB = np.array([[0, i] for i in range(1, 9)])
CHAIN_10 = np.array([[i, i + 1] for i in range(9)])
DANGLING_PAIR = np.array([[0, 1], [2, 1]])  # vertex 1 dangling


def random_graph(n=60, m=300, seed=7, ensure_dangling=True):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    if ensure_dangling:
        # make the last two vertices sinks (dangling) and one isolated
        e = e[(e[:, 0] < n - 3)]
    return np.unique(e, axis=0)
