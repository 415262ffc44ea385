"""Independent numpy oracles reproducing the reference's math semantics.

These are golden-value reimplementations (from the documented recipes in
SURVEY.md §2.1 / the reference's ``pytest=True`` seeded-numpy hooks), NOT
imports of the reference — they let the JAX core be validated bit-for-bit in
fp64/fp32 without torch.
"""

import numpy as np


def embed_oracle(x, num_freqs, include_input=True):
    """Reference embedder.py:17-42 semantics."""
    if num_freqs == -1:
        return x
    outs = [x] if include_input else []
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, -1)


def sample_pdf_oracle(bins, weights, u):
    """Reference ray.py:96-153 with externally supplied uniforms u."""
    weights = weights + 1e-5
    pdf = weights / np.sum(weights, -1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)

    inds = np.stack(
        [np.searchsorted(cdf_row, u_row, side="right") for cdf_row, u_row in zip(cdf, u)]
    )
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)

    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, np.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def raw2outputs_oracle(raw, z_vals, rays_d, white_bkgd=False, noise=0.0):
    """Reference ray.py:155-198 semantics (noise passed explicitly)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3] + noise, 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)

    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * trans

    rgb_map = np.sum(weights[..., None] * rgb, -2)
    depth_map = np.sum(weights * z_vals, -1)
    acc_map = np.sum(weights, -1)
    disp_map = 1.0 / np.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map


def get_rays_oracle(H, W, focal_or_K, c2w):
    """Reference ray.py:42-72 semantics."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    if isinstance(focal_or_K, float):
        f = focal_or_K
        dirs = np.stack([(i - W * 0.5) / f, -(j - H * 0.5) / f, -np.ones_like(i)], -1)
    else:
        K = focal_or_K
        dirs = np.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
        )
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d
