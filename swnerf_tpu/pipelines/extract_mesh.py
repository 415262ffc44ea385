"""Mesh extraction CLI: dense TPU density/color grid query -> marching
tetrahedra -> colored ``mesh.obj``.

Usage parity with the reference (`python nerf/extract_mesh.py --config
configs/<scene>.txt --resolution R --threshold T`, README.md:32-41):
fibonacci-sphere view directions (extract_mesh.py:7-25), a dense grid over
the hardcoded bounds [(-1,1), (-1,2), (-4,2)] (extract_mesh.py:157 —
README.md:39 warns to edit them; here SWNERF_MESH_BOUNDS overrides without
code edits), per-point raw (rgb, sigma) averaged over ``num_views=100``
directions (extract_mesh.py:59-80 — note the reference averages the
*pre-activation* network outputs; reproduced), iso-surface at
``--threshold``, nearest-sample vertex colors (extract_mesh.py:115-121),
exported to ``logs/<exp>/mesh.obj``.

TPU-first notes: the reference's 210M MLP evals (res 128) run as a Python
loop of 1024-point batches x 100 view queries; here the whole sweep is one
jitted ``lax.map`` over [V=100, C]-shaped tiles — views become the batch
axis and each tile is a single field evaluation.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.ops.marching import marching_tetrahedra
from swnerf_tpu.utils.config import config_parser
from swnerf_tpu.utils.mesh import save_obj

DEFAULT_BOUNDS = ((-1.0, 1.0), (-1.0, 2.0), (-4.0, 2.0))  # extract_mesh.py:157


def fibonacci_sphere(num_views: int = 100) -> np.ndarray:
    """Evenly distributed unit directions (extract_mesh.py:7-25)."""
    indices = np.arange(0, num_views, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * indices / num_views)
    theta = np.pi * (1 + 5**0.5) * indices
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], 1
    ).astype(np.float32)


def sample_grid(
    field,
    params,
    bounds=DEFAULT_BOUNDS,
    resolution: int = 128,
    num_views: int = 100,
    chunk: int = 2048,
):
    """Mean raw (rgb logits, sigma) over view directions on a dense grid.

    Returns (density [R,R,R], colors [R,R,R,3], axes (x,y,z) 1-D arrays).
    """
    xs = np.linspace(bounds[0][0], bounds[0][1], resolution)
    ys = np.linspace(bounds[1][0], bounds[1][1], resolution)
    zs = np.linspace(bounds[2][0], bounds[2][1], resolution)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    points = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    n = points.shape[0]

    viewdirs = jnp.asarray(fibonacci_sphere(num_views))  # [V, 3]

    pad = (-n) % chunk
    pts = np.concatenate([points, np.zeros((pad, 3), np.float32)], 0)
    tiles = jnp.asarray(pts.reshape(-1, chunk, 3))

    @jax.jit
    def sweep(tiles):
        def one(tile):  # [C, 3]
            p = jnp.broadcast_to(tile[None], (num_views, chunk, 3))
            raw, _ = field.apply(params, p, viewdirs)  # [V, C, 4]
            return jnp.mean(raw, axis=0)  # [C, 4]

        return jax.lax.map(one, tiles)

    out = np.asarray(sweep(tiles)).reshape(-1, 4)[:n]
    density = out[:, 3].reshape(resolution, resolution, resolution)
    colors = out[:, :3].reshape(resolution, resolution, resolution, 3)
    return density, colors, (xs, ys, zs)


def nerf_to_mesh(
    field,
    params,
    bounds=DEFAULT_BOUNDS,
    resolution: int = 128,
    density_threshold: float = 8.0,
    num_views: int = 100,
    chunk: int = 2048,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grid sample + marching tetrahedra + nearest-sample vertex colors.
    Returns (verts, faces, vertex_colors)."""
    density, colors, (xs, ys, zs) = sample_grid(
        field, params, bounds, resolution, num_views, chunk
    )
    spacing = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
    origin = (xs[0], ys[0], zs[0])
    verts, faces = marching_tetrahedra(density, density_threshold, spacing, origin)

    if len(verts):
        idx = np.stack(
            [
                np.clip(np.round((verts[:, i] - origin[i]) / spacing[i]), 0, resolution - 1)
                for i in range(3)
            ],
            -1,
        ).astype(np.int64)
        # Reference colors are pre-sigmoid logits; map through sigmoid for a
        # displayable [0,1] color (export clips anyway).
        vcol = 1.0 / (1.0 + np.exp(-colors[idx[:, 0], idx[:, 1], idx[:, 2]]))
    else:
        vcol = np.zeros((0, 3), np.float32)
    return verts, faces, vcol


def main(argv=None):
    args = config_parser().parse_args(argv)
    from swnerf_tpu.pipelines.run_nerf import create_vanilla

    field, fine_field, rcfg, optimizer, state, start, _cfgs = create_vanilla(args)
    # Query the fine network when present (reference uses model_fine,
    # extract_mesh.py:176) — through the fine FIELD so distinct fine dims
    # query correctly.
    if state.params["fine"] is not None:
        params = state.params["fine"]
        field = fine_field if fine_field is not None else field
    else:
        params = state.params["coarse"]

    bounds = DEFAULT_BOUNDS
    if os.environ.get("SWNERF_MESH_BOUNDS"):
        bounds = tuple(tuple(b) for b in json.loads(os.environ["SWNERF_MESH_BOUNDS"]))
    num_views = int(os.environ.get("SWNERF_MESH_VIEWS", 100))

    verts, faces, vcol = nerf_to_mesh(
        field, params, bounds, resolution=args.resolution,
        density_threshold=args.threshold, num_views=num_views,
    )
    savedir = os.path.join(args.basedir, args.expname, "mesh.obj")
    save_obj(savedir, verts, faces, vcol)
    print(f"Mesh saved to {savedir} ({len(verts)} verts, {len(faces)} faces)")


if __name__ == "__main__":
    main()
