"""On-chip throughput of the dense mesh-extraction grid sweep.

Reference workload (SURVEY.md §6; nerf/extract_mesh.py:27-80,187):
``res^3 * num_views`` raw MLP queries — 128^3 x 100 ≈ 2.1e8 point evals on
the full-size D=8/W=256 vanilla field — run by the reference as a Python
loop of 1024-point batches x 100 per-view queries. Ours is the product
path itself: ``pipelines/extract_mesh.py sample_grid`` (one jitted
``lax.map`` over [V, C] tiles, views as the batch axis).

Timing notes: call 1 pays tracing + (remote) compile; call 2 re-traces the
closure but hits the persistent compile cache, so it bounds the real sweep
cost (trace + dispatch + the [res^3, 4] device->host pull). Run:

    python benchmarks/tpu_mesh_sweep.py [resolution]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field  # noqa: E402
from swnerf_tpu.pipelines.extract_mesh import sample_grid  # noqa: E402


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    views = 100
    field = make_vanilla_field(VanillaNeRFConfig())  # D=8, W=256 (lego config)
    params = field.init(jax.random.PRNGKey(0))

    times = []
    for _ in range(2):
        t0 = time.time()
        density, colors, _ = sample_grid(field, params, resolution=res, num_views=views)
        times.append(time.time() - t0)
    assert density.shape == (res, res, res) and colors.shape == (res, res, res, 3)

    evals = res**3 * views
    print(
        f"mesh sweep res={res} views={views} ({evals / 1e6:.0f}M point evals, "
        f"D=8/W=256): first {times[0]:.1f}s (incl. compile), "
        f"steady {times[1]:.1f}s = {evals / times[1] / 1e6:.1f}M evals/s "
        f"on {jax.devices()[0].platform}"
    )

    # Device-only decomposition: the same [V, C]-tiled sweep (mirrors
    # sample_grid's inner jit), jitted once, timed as a single lax.map
    # dispatch to block_until_ready — no re-trace, no [res^3, 4] host pull.
    import numpy as np
    import jax.numpy as jnp

    from swnerf_tpu.pipelines.extract_mesh import DEFAULT_BOUNDS

    chunk = 2048
    # Same grid values as the product path (sample_grid's DEFAULT_BOUNDS),
    # not just the same shapes — the compile-cache hit only needs shapes,
    # but value-identity keeps the two timings directly comparable.
    xs, ys, zs = (np.linspace(lo, hi, res) for lo, hi in DEFAULT_BOUNDS)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    pad = (-pts.shape[0]) % chunk
    pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)], 0)
    tiles = jax.device_put(jnp.asarray(pts.reshape(-1, chunk, 3)))
    from swnerf_tpu.pipelines.extract_mesh import fibonacci_sphere

    viewdirs = jax.device_put(jnp.asarray(fibonacci_sphere(views)))

    @jax.jit
    def sweep(tiles):
        def one(tile):
            p = jnp.broadcast_to(tile[None], (views, chunk, 3))
            raw, _ = field.apply(params, p, viewdirs)
            return jnp.mean(raw, axis=0)

        return jax.lax.map(one, tiles)

    sweep(tiles).block_until_ready()  # compile (cached from the call above)
    t0 = time.time()
    sweep(tiles).block_until_ready()
    dt = time.time() - t0
    # Same denominator convention as the product-path print above: USEFUL
    # evals (res^3 * views). The device actually also evaluates the pad
    # points sample_grid tiles in; report that fraction explicitly so the
    # two M-evals/s figures stay comparable at any resolution.
    pad_frac = pad / (res**3 + pad)
    print(
        f"device-only sweep: {dt:.2f}s = {evals / dt / 1e6:.1f}M useful evals/s "
        f"(+{100 * pad_frac:.2f}% pad evals; single dispatch; the "
        f"product-path gap is re-trace + the "
        f"{res**3 * 16 / 1e6:.0f}MB host pull through the tunnel)"
    )


if __name__ == "__main__":
    main()
