"""Laplacian image pyramids (batch, NHWC) for the MultiRes trainer.

Capability parity with /root/reference/multires_dnerf/pyramid.py:8-98:
gaussian 3x3 blur (sigma 1.0) -> 0.5x bilinear downsample per level;
laplacian band = level - upsample(next); last band = the final low-pass;
reconstruction is the exact inverse (upsample + add).

TPU-first notes: the blur is a depthwise ``lax.conv_general_dilated``
(feature_group_count=C) and resizing uses ``jax.image.resize`` (half-pixel
'linear', the analog of torch ``align_corners=False``; jax's downscale
kernel is slightly antialiased vs torch's plain bilinear — a documented,
benign numeric delta). Everything is jittable; no PIL/host round trips.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def gaussian_kernel(kernel_size: int = 3, sigma: float = 1.0) -> jnp.ndarray:
    """Normalized 2-D gaussian [k, k]."""
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(coords[:, None] ** 2 + coords[None, :] ** 2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def gaussian_blur(images: jnp.ndarray, kernel_size: int = 3, sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise SAME blur on [N, H, W, C]."""
    C = images.shape[-1]
    k = gaussian_kernel(kernel_size, sigma)
    kern = jnp.broadcast_to(k[:, :, None, None], (kernel_size, kernel_size, 1, C))
    return jax.lax.conv_general_dilated(
        images,
        kern,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _resize(images: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    return jax.image.resize(
        images, (images.shape[0], H, W, images.shape[-1]), method="linear"
    )


def generate_gaussian_pyramid(
    images: jnp.ndarray, levels: int = 4, kernel_size: int = 3, sigma: float = 1.0
) -> List[jnp.ndarray]:
    """[N, H, W, C] -> ``levels`` progressively blurred+halved images,
    finest (original) first. Level i has spatial size H/2^i."""
    gauss = [images]
    for _ in range(levels - 1):
        blurred = gaussian_blur(gauss[-1], kernel_size, sigma)
        H, W = blurred.shape[1] // 2, blurred.shape[2] // 2
        gauss.append(_resize(blurred, H, W))
    return gauss


def generate_laplacian_pyramid(
    images: jnp.ndarray, levels: int = 4, kernel_size: int = 3, sigma: float = 1.0
) -> List[jnp.ndarray]:
    """[N, H, W, C] -> list of ``levels`` bands, finest first; band i has
    spatial size H/2^i; the last band is the low-pass residual."""
    gauss = [images]
    for _ in range(levels):
        blurred = gaussian_blur(gauss[-1], kernel_size, sigma)
        H, W = blurred.shape[1] // 2, blurred.shape[2] // 2
        gauss.append(_resize(blurred, H, W))

    bands = []
    for i in range(levels - 1):
        up = _resize(gauss[i + 1], gauss[i].shape[1], gauss[i].shape[2])
        bands.append(gauss[i] - up)
    bands.append(gauss[levels - 1])
    return bands


def reconstruct_from_pyramid(bands: List[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of :func:`generate_laplacian_pyramid`."""
    out = bands[-1]
    for band in bands[-2::-1]:
        out = _resize(out, band.shape[1], band.shape[2]) + band
    return out
