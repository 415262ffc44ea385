"""Along-ray sampling: stratified coarse samples and inverse-CDF importance
sampling (hierarchical fine samples).

Capability parity:
  * stratified sampling — reference render_rays z_vals logic
    (/root/reference/nerf/run.py:361-383): linspace(near, far) (or linear in
    inverse depth), optionally jittered uniformly within each interval;
  * ``sample_pdf`` — reference ray.py:96-153: weights -> pdf -> cdf,
    right-side searchsorted, below/above clamp, linear interpolation with the
    1e-5 weight floor and denom<1e-5 guard reproduced exactly in fp32.

TPU-first notes: the searchsorted is a vectorized comparison-count
(``sum(cdf <= u)``) rather than a per-element binary search — at NeRF sizes
(M ~ 64 bins) a dense VPU compare beats a gather-heavy binary search and maps
onto one fused elementwise reduction; the fused Pallas variant lives in
``swnerf_tpu.ops.pallas.sample_pdf_pallas``. The merge of coarse+fine depths
(reference run.py:400 ``torch.sort(cat(...))``) is a static-shape
``jnp.sort``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _pallas_sample_pdf_enabled() -> bool:
    """One dispatch rule for every hierarchical-sampling entry point:
    SWNERF_PALLAS_SAMPLE_PDF=1 forces the Pallas kernels, =0 forces jnp,
    unset defaults to Pallas on TPU only."""
    flag = os.environ.get("SWNERF_PALLAS_SAMPLE_PDF")
    return flag == "1" or (flag is None and jax.devices()[0].platform == "tpu")


def sample_along_rays(
    rng: Optional[jax.Array],
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 0.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Stratified depth samples per ray.

    Args:
      rng: PRNG key for jitter (ignored when ``perturb == 0``).
      near, far: [N_rays] or [N_rays, 1] bounds.
      n_samples: static sample count per ray.
      perturb: 0 for deterministic midpoints of linspace, nonzero to jitter
        uniformly inside each interval.
      lindisp: sample linearly in inverse depth instead of depth.

    Returns:
      z_vals: [N_rays, n_samples].
    """
    near = near.reshape(-1, 1)
    far = far.reshape(-1, 1)
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    n_rays = near.shape[0]
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def _searchsorted_right(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Batched right-side searchsorted: for each row, the number of cdf
    entries <= u. cdf: [N, M], u: [N, S] -> int32 [N, S]."""
    return jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-transform sampling of ``n_samples`` depths per ray.

    Args:
      bins: [N, M] sorted bin edges (the coarse z midpoints).
      weights: [N, M-1] unnormalized bin weights.
      n_samples: static number of samples to draw.
      rng: PRNG key (required when ``det=False`` and ``u`` is None).
      det: deterministic linspace(0,1) samples instead of uniform draws.
      u: optional externally supplied uniforms [N, n_samples] — the analog of
        the reference's ``pytest=True`` seeded-numpy override (ray.py:123-132),
        used by golden-value tests.

    Returns:
      samples: [N, n_samples].
    """
    if _pallas_sample_pdf_enabled():
        # Fused Pallas kernel (ops/pallas/sample_pdf.py): identical sample
        # values, but declared non-differentiable (every consumer detaches
        # the positions — reference run.py:398) — which also spares XLA from
        # linearizing the searchsorted machinery: measured 58 -> 86 it/s on
        # the lego train step. SWNERF_PALLAS_SAMPLE_PDF=0 restores jnp.
        from swnerf_tpu.ops.pallas.sample_pdf import sample_pdf_pallas

        return sample_pdf_pallas(bins, weights, n_samples, rng=rng, det=det, u=u)

    weights = weights + 1e-5  # prevent nans (reference ray.py:111)
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, M]

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
        else:
            u = jax.random.uniform(
                rng, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype
            )

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    # Uniformly non-differentiable on BOTH paths: the Pallas kernel has zero
    # tangents by declaration, and every in-repo consumer detaches the
    # positions anyway (reference z_samples.detach(), run.py:398). Stopping
    # here keeps external callers from silently getting gradients only off
    # TPU.
    return jax.lax.stop_gradient(samples)


def merge_z_vals(z_vals: jnp.ndarray, z_samples: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of coarse and fine depths (reference run.py:400)."""
    return jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)


def sample_pdf_merge(
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
) -> jnp.ndarray:
    """The full hierarchical-resample idiom in one call (reference
    run.py:394-400): bins = coarse z midpoints, importance-sample
    ``n_samples`` depths from ``weights[..., 1:-1]``, detach, and return the
    sorted union with ``z_vals``.

    Args:
      z_vals: [N, M] sorted coarse depths.
      weights: [N, M] FULL coarse compositing weights (sliced internally).
      n_samples, rng, det: as :func:`sample_pdf`.

    Returns:
      z_all: [N, M + n_samples] sorted.

    With ``SWNERF_PDF_MERGE=1`` on TPU this is ONE Pallas kernel
    (``sample_pdf_merge_pallas``) — the separate XLA sort between the coarse
    and fine render kernels disappears. Measured NEUTRAL on v5e (29.49 vs
    29.70M samp/s vanilla, 11.08 vs 11.09M dnerf — benchmarks/
    tpu_pdf_merge_ab.py), so the default stays the two-op path. The fused
    kernel needs sorted uniforms, which it draws as order statistics via
    exponential spacings: different PRNG BITS from the two-op path,
    identical z_all distribution (the sorted union depends on the set of
    uniforms only). ``det=True`` output is bit-identical on both paths.
    """
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if _pallas_sample_pdf_enabled() and os.environ.get("SWNERF_PDF_MERGE", "0") == "1":
        from swnerf_tpu.ops.pallas.sample_pdf import sample_pdf_merge_pallas

        return sample_pdf_merge_pallas(
            z_vals, z_mid, weights[..., 1:-1], n_samples, rng=rng, det=det
        )
    z_samples = sample_pdf(z_mid, weights[..., 1:-1], n_samples, rng=rng, det=det)
    return merge_z_vals(z_vals, jax.lax.stop_gradient(z_samples))
