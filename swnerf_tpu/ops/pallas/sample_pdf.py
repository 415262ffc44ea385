"""Fused inverse-CDF importance sampling as a Pallas TPU kernel.

The TPU-native equivalent of the reference's CUDA ``torchsearchsorted``
extension (d_nerf/torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu:
one thread per (row, col) binary search) composed with the surrounding
``sample_pdf`` math (ray.py:96-153). One kernel pass per ray tile computes:

  weights + 1e-5 -> pdf -> cdf (cumsum as a lower-triangular MXU matmul)
  -> right-side searchsorted (sorted-CDF select sweep, no gathers)
  -> below/above clamp -> denom<1e-5 guard -> linear interp

entirely in VMEM. Semantics match ``swnerf_tpu.ops.sampling.sample_pdf``
bit-for-bit in fp32 (tested against it and the numpy oracle).

Design notes: because the CDF is sorted, "gather bins at searchsorted
indices" is expressible as a monotone select sweep over the (static) M bins
— below = last bin with cdf <= u, above = first bin with cdf > u — which
vectorizes on the VPU with no dynamic-index gathers (TPU-unfriendly). M is a
compile-time constant (64ish), so the sweep unrolls.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(bins_ref, w_ref, u_ref, out_ref, *, M: int, tri_ref=None):
    R, Mp = bins_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Mp), 1)

    # pdf over the REAL M-1 weights (+1e-5 floor); padding lanes contribute 0.
    w = jnp.where(lane < M - 1, w_ref[:] + 1e-5, 0.0)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)

    # cdf[j] = sum_{k<j} pdf[k]  — strict-lower-triangular matmul on the MXU.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 1)
    ).astype(jnp.float32)
    # HIGHEST keeps the CDF accumulation in true fp32 on the MXU (DEFAULT
    # would round the fp32 pdf to bf16, shifting CDF values ~1e-3 and
    # breaking bit-for-bit parity with ops.sampling.sample_pdf); cheap at
    # Mp=128.
    cdf = jnp.dot(
        pdf, tri, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, Mp]

    u = u_ref[:]  # [R, Sp]

    # below: last k in [0, M) with cdf[k] <= u (cdf[0] == 0 <= u always).
    cdf_b = jnp.zeros_like(u)
    bins_b = jnp.broadcast_to(bins_ref[:, 0:1], u.shape)
    for k in range(1, M):
        ck = cdf[:, k : k + 1]
        m = ck <= u
        cdf_b = jnp.where(m, ck, cdf_b)
        bins_b = jnp.where(m, bins_ref[:, k : k + 1], bins_b)

    # above: first k with cdf[k] > u, clamped to M-1.
    cdf_a = jnp.broadcast_to(cdf[:, M - 1 : M], u.shape)
    bins_a = jnp.broadcast_to(bins_ref[:, M - 1 : M], u.shape)
    for k in range(M - 2, -1, -1):
        ck = cdf[:, k : k + 1]
        m = ck > u
        cdf_a = jnp.where(m, ck, cdf_a)
        bins_a = jnp.where(m, bins_ref[:, k : k + 1], bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    out_ref[:] = bins_b + t * (bins_a - bins_b)


def sample_pdf_pallas(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
    block_rays: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.sampling.sample_pdf on TPU. bins [N, M],
    weights [N, M-1] -> samples [N, n_samples].

    Non-differentiable by declaration (zero tangents): every consumer
    detaches the sampled positions anyway (reference z_samples.detach(),
    run.py:398), and pallas_call has no autodiff rule.
    """
    N, M = bins.shape
    if u is None:
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype), (N, n_samples)
            )
        else:
            u = jax.random.uniform(rng, (N, n_samples), dtype=bins.dtype)
    return _sample_pdf_core(bins, weights, u, n_samples, block_rays, interpret)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5))
def _sample_pdf_core(bins, weights, u, n_samples, block_rays, interpret):
    N, M = bins.shape
    Mp = _round_up(M, 128)
    Sp = _round_up(n_samples, 128)
    Np = _round_up(N, block_rays)

    bins_p = jnp.pad(bins, ((0, Np - N), (0, Mp - M)), mode="edge")
    w_p = jnp.pad(weights, ((0, Np - N), (0, Mp - (M - 1))))
    u_p = jnp.pad(u, ((0, Np - N), (0, Sp - n_samples)))

    out = pl.pallas_call(
        functools.partial(_kernel, M=M),
        out_shape=jax.ShapeDtypeStruct((Np, Sp), bins.dtype),
        grid=(Np // block_rays,),
        in_specs=[
            pl.BlockSpec((block_rays, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rays, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bins_p, w_p, u_p)
    return out[:N, :n_samples]


@_sample_pdf_core.defjvp
def _sample_pdf_core_jvp(n_samples, block_rays, interpret, primals, tangents):
    out = _sample_pdf_core(*primals, n_samples, block_rays, interpret)
    return out, jnp.zeros_like(out)
