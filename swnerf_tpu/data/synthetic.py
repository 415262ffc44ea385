"""Procedural ground-truth scenes for end-to-end tests and benchmarks.

The reference has no synthetic fixtures (its integration tests require the
blender datasets on disk); this module provides an analytic emissive-sphere
field whose images are rendered with the same volume compositor, so training
can be validated end-to-end (PSNR climbs) without any data files.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swnerf_tpu.ops.volume import composite
from swnerf_tpu.render.core import Rays, make_rays_from_camera


def gt_sphere_raw(pts: jnp.ndarray) -> jnp.ndarray:
    """Analytic raw (rgb logits, sigma) for a soft colored sphere at the
    origin with radius 1: density falls off outside the surface, color varies
    smoothly with position."""
    r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    sigma = 20.0 * jax.nn.sigmoid(20.0 * (1.0 - r))
    # Logit-space colors in ~[-2, 2] so sigmoid gives mid-range rgb.
    rgb_logits = 2.0 * jnp.sin(3.0 * pts)
    return jnp.concatenate([rgb_logits, sigma], -1)


def render_gt(rays: Rays, n_samples: int = 64, white_bkgd: bool = True) -> jnp.ndarray:
    """Ground-truth rgb for a ray batch via dense deterministic sampling."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = rays.near[:, None] * (1 - t) + rays.far[:, None] * t
    pts = rays.origins[:, None, :] + rays.directions[:, None, :] * z[..., None]
    raw = gt_sphere_raw(pts)
    return composite(raw, z, rays.directions, white_bkgd=white_bkgd).rgb


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world on a sphere looking at the origin (same convention as
    the blender loaders' spiral path, dataloader/load_blender.py:10-35)."""
    th, ph = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rot_phi = np.eye(4, dtype=np.float32)
    rot_phi[1, 1] = rot_phi[2, 2] = np.cos(ph)
    rot_phi[1, 2], rot_phi[2, 1] = -np.sin(ph), np.sin(ph)
    rot_th = np.eye(4, dtype=np.float32)
    rot_th[0, 0] = rot_th[2, 2] = np.cos(th)
    rot_th[0, 2], rot_th[2, 0] = -np.sin(th), np.sin(th)
    c2w = rot_th @ rot_phi @ trans
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ c2w


def make_scene(
    n_views: int = 4, H: int = 16, W: int = 16, n_samples: int = 64
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Returns (images [V,H,W,3], poses [V,4,4], focal)."""
    focal = 0.9 * W
    poses = np.stack(
        [pose_spherical(th, -30.0, 4.0) for th in np.linspace(-180, 180, n_views, endpoint=False)]
    )
    images = []
    for p in poses:
        rays = make_rays_from_camera(H, W, float(focal), p, near=2.0, far=6.0)
        rgb = render_gt(rays, n_samples)
        images.append(np.asarray(rgb).reshape(H, W, 3))
    return np.stack(images), poses, float(focal)
