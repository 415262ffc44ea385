"""Ray generation and NDC projection.

Capability parity with /root/reference/ray.py:10-92 (get_rays / get_rays_np /
ndc_rays): pixel grid -> world-space origins/directions under the OpenGL-style
camera convention (x right, y up, camera looks down -z), accepting either a
scalar focal length or a full 3x3 intrinsic matrix K.

TPU-first notes: a single jittable function serves both the torch and numpy
twins of the reference; directions are computed with one broadcasted einsum
against ``c2w[:3, :3]`` (MXU-friendly), and the whole H*W grid stays on
device with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pixel_dirs(i, j, H, W, focal_or_K, xp):
    if xp is jnp:
        asarr = jnp.asarray
    else:
        asarr = np.asarray
    fk = focal_or_K
    if isinstance(fk, (float, int)):
        focal = float(fk)
        return xp.stack(
            [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -xp.ones_like(i)], -1
        )
    K = asarr(fk)
    return xp.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -xp.ones_like(i)], -1
    )


def get_rays(H: int, W: int, focal_or_K, c2w):
    """World-space rays for every pixel of an H x W image (device version).

    Args:
      H, W: image size in pixels (static Python ints).
      focal_or_K: scalar focal length or [3,3] intrinsics.
      c2w: [3,4] or [4,4] camera-to-world matrix.

    Returns:
      rays_o, rays_d: each [H, W, 3].
    """
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    dirs = _pixel_dirs(i, j, H, W, focal_or_K, jnp)
    # Rotate camera-frame directions into the world frame. Written as an
    # elementwise broadcast-sum (not einsum): a 3x3 contraction gains nothing
    # from the MXU and JAX's default matmul precision would demote the fp32
    # rotation to bf16, breaking ray-grid parity with the numpy path.
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, focal_or_K, c2w):
    """Numpy twin of :func:`get_rays` for host-side precompute
    (reference ray.py:42-72)."""
    c2w = np.asarray(c2w)
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = _pixel_dirs(i, j, H, W, focal_or_K, np)
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_at(pixels, H: int, W: int, focal_or_K, c2w):
    """Rays for a *subset* of pixels — TPU-first replacement for the
    reference's generate-all-then-gather pattern (nerf/run.py:660-679, which
    builds the full H x W grid and indexes N_rand rows out of it). Computing
    only the selected pixels' directions avoids materializing the H*W grid
    every training step.

    Args:
      pixels: [N, 2] integer (row, col) = (y, x) pixel coordinates.
      H, W, focal_or_K, c2w: as in :func:`get_rays`.

    Returns:
      rays_o, rays_d: each [N, 3].
    """
    c2w = jnp.asarray(c2w)
    j = pixels[:, 0].astype(jnp.float32)  # row
    i = pixels[:, 1].astype(jnp.float32)  # col
    dirs = _pixel_dirs(i, j, H, W, focal_or_K, jnp)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Shift origins to the near plane and project to NDC
    (LLFF forward-facing; reference ray.py:75-92)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
