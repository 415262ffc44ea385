"""searchsorted micro-benchmark — the port of the reference's
d_nerf/torchsearchsorted/examples/benchmark.py (B=5000, A=300, V=100, best
of repeats): numpy vs the native C++ library vs the Pallas kernel path
(vectorized compare-count inside sample_pdf) on the current backend.

Usage: python benchmarks/searchsorted_bench.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, A, V = 5000, 300, 100
REPEATS = 20


def best_of(fn, repeats=REPEATS):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    a = np.sort(rng.standard_normal((B, A)).astype(np.float32), -1)
    v = rng.standard_normal((B, V)).astype(np.float32)

    t = best_of(lambda: np.stack([np.searchsorted(ar, vr, side="right") for ar, vr in zip(a, v)]))
    print(f"numpy loop:        {t * 1e3:8.2f} ms")

    from swnerf_tpu.native import native_available, searchsorted

    if native_available():
        t = best_of(lambda: searchsorted(a, v, side="right"))
        print(f"native C++:        {t * 1e3:8.2f} ms")

    import jax
    import jax.numpy as jnp

    from swnerf_tpu.ops.sampling import _searchsorted_right

    aj, vj = jnp.asarray(a), jnp.asarray(v)
    f = jax.jit(_searchsorted_right)
    f(aj, vj).block_until_ready()
    t = best_of(lambda: f(aj, vj).block_until_ready())
    print(f"jax ({jax.devices()[0].platform}) compare-count: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
