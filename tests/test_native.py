"""Native C++ searchsorted tests — the port of the reference's
parameterized correctness sweep (d_nerf/torchsearchsorted/test/
test_searchsorted.py:27-43, Ba/Bv x A x V x side vs a numpy oracle)."""

import numpy as np
import pytest

from swnerf_tpu.native import native_available, searchsorted

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def numpy_searchsorted(a, v, side):
    """Row-broadcast oracle (reference src/torchsearchsorted/utils.py)."""
    ba, bv = a.shape[0], v.shape[0]
    rows = max(ba, bv)
    out = np.empty((rows, v.shape[1]), np.int64)
    for r in range(rows):
        out[r] = np.searchsorted(a[0 if ba == 1 else r], v[0 if bv == 1 else r], side=side)
    return out


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("Ba,Bv", [(1, 1), (1, 100), (100, 1), (100, 100), (200, 200)])
@pytest.mark.parametrize("A,V", [(1, 1), (50, 12), (500, 120)])
def test_correctness_sweep(Ba, Bv, A, V, side):
    rng = np.random.default_rng(abs(hash((Ba, Bv, A, V, side))) % 2**31)
    for _ in range(5):
        a = np.sort(rng.standard_normal((Ba, A)).astype(np.float32), -1)
        v = rng.standard_normal((Bv, V)).astype(np.float32)
        got = searchsorted(a, v, side=side)
        want = numpy_searchsorted(a, v, side)
        np.testing.assert_array_equal(got, want)


def test_exact_hits():
    """Values exactly equal to bin edges: left/right differ."""
    a = np.array([[0.0, 1.0, 1.0, 2.0]], np.float32)
    v = np.array([[1.0, 0.0, 2.0, 3.0, -1.0]], np.float32)
    np.testing.assert_array_equal(searchsorted(a, v, "left")[0], [1, 0, 3, 4, 0])
    np.testing.assert_array_equal(searchsorted(a, v, "right")[0], [3, 1, 4, 4, 0])


def test_multithreaded_matches_serial():
    rng = np.random.default_rng(0)
    a = np.sort(rng.standard_normal((500, 300)).astype(np.float32), -1)
    v = rng.standard_normal((500, 100)).astype(np.float32)
    np.testing.assert_array_equal(
        searchsorted(a, v, "right", n_threads=1),
        searchsorted(a, v, "right", n_threads=8),
    )


def test_row_mismatch_raises():
    with pytest.raises(ValueError):
        searchsorted(np.zeros((3, 4), np.float32), np.zeros((2, 4), np.float32))
