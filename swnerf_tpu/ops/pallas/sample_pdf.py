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


# ---------------------------------------------------------------------------
# Fused sample + merge: one kernel emits the SORTED union of the coarse
# depths and the importance samples (reference run.py:398-400
# ``z_samples.detach(); torch.sort(cat([z_vals, z_samples]))``), removing
# the separate XLA sort dispatch between the coarse and fine render kernels.
# ---------------------------------------------------------------------------


def _merge_kernel(bins_ref, w_ref, u_ref, z_ref, out_ref, *, M: int, Mz: int, S: int):
    """invCDF sampling (as ``_kernel``) + gather-free sorted merge.

    Requires u SORTED ascending per row: the inverse CDF is monotone, so the
    samples come out sorted, and merging two sorted sequences reduces to rank
    arithmetic + monotone select sweeps (no scatters/gathers, which Mosaic
    has no efficient lowering for):

      rank_a[i] = i + |{j : b_j <  a_i}|   (coarse depth a_i's slot)
      rank_b[j] = j + |{i : a_i <= b_j}|   (sample b_j's slot; A wins ties)

    ranks form a permutation of 0..Mz+S-1 (stable two-pointer merge), and
    both rank sequences are nondecreasing, so the k-th smallest of the union
    is  max(last a with rank_a <= k, last b with rank_b <= k)  — each term a
    select sweep over the static element index, the same idiom as the
    searchsorted sweeps above.
    """
    R, Sp = u_ref.shape
    Kp = out_ref.shape[1]

    # --- invCDF sampling (identical math to _kernel) ---
    Mp = bins_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Mp), 1)
    w = jnp.where(lane < M - 1, w_ref[:] + 1e-5, 0.0)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Mp, Mp), 1)
    ).astype(jnp.float32)
    cdf = jnp.dot(
        pdf, tri, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u = u_ref[:]
    cdf_b = jnp.zeros_like(u)
    bins_b = jnp.broadcast_to(bins_ref[:, 0:1], u.shape)
    for k in range(1, M):
        ck = cdf[:, k : k + 1]
        m = ck <= u
        cdf_b = jnp.where(m, ck, cdf_b)
        bins_b = jnp.where(m, bins_ref[:, k : k + 1], bins_b)
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
    samples = bins_b + t * (bins_a - bins_b)  # [R, Sp], sorted in real lanes

    # --- rank arithmetic ---
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (R, Sp), 1)
    z = z_ref[:]
    # rank_b[j] = j + |{i < Mz : a_i <= b_j}| over the real coarse depths.
    acc_b = jnp.zeros((R, Sp), jnp.float32)
    for i in range(Mz):
        acc_b = acc_b + (z[:, i : i + 1] <= samples).astype(jnp.float32)
    rank_b = lane_s.astype(jnp.float32) + acc_b  # [R, Sp]

    # real-sample mask for the rank_a counts (padding lanes hold u=0 junk).
    real_s = (lane_s < S).astype(jnp.float32)

    kl = jax.lax.broadcasted_iota(jnp.int32, (R, Kp), 1).astype(jnp.float32)
    neg = jnp.full((R, Kp), -3e38, jnp.float32)

    # va(k) = last coarse depth with rank_a <= k (rank_a nondecreasing in i).
    va = neg
    for i in range(Mz):
        zi = z[:, i : i + 1]
        cnt = jnp.sum((samples < zi).astype(jnp.float32) * real_s, axis=-1,
                      keepdims=True)
        rank_a = cnt + float(i)  # [R, 1]
        va = jnp.where(rank_a <= kl, zi, va)

    # vb(k) = last sample with rank_b <= k (rank_b nondecreasing in j).
    vb = neg
    for j in range(S):
        vb = jnp.where(rank_b[:, j : j + 1] <= kl, samples[:, j : j + 1], vb)

    out_ref[:] = jnp.maximum(va, vb)


def sample_pdf_merge_pallas(
    z_vals: jnp.ndarray,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    rng: Optional[jax.Array] = None,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
    block_rays: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``merge_z_vals(z_vals, sample_pdf(bins, weights, S))``:
    z_vals [N, Mz] (sorted), bins [N, M], weights [N, M-1] -> sorted union
    [N, Mz + n_samples].

    The random draw differs from the two-op path in BITS, not distribution:
    ``u`` must be sorted, so the non-det path draws the order statistics of
    ``n_samples`` iid uniforms directly via exponential spacings
    (u_(i) = cumsum(E_1..E_i) / sum(E_1..E_{S+1}), E ~ Exp(1)) — the sorted
    union is a function of the SET of uniforms only, so z_all's distribution
    is exactly the reference's (run.py:398-400). With ``det=True`` the
    linspace u is already sorted and the output is bit-identical to
    sort(concat(z_vals, sample_pdf(..., det=True))). Zero-tangent like
    ``sample_pdf_pallas`` (consumers detach, reference run.py:398)."""
    N, M = bins.shape
    if u is None:
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype), (N, n_samples)
            )
        else:
            g = jax.random.exponential(
                rng, (N, n_samples + 1), dtype=jnp.float32
            ).astype(bins.dtype)
            c = jnp.cumsum(g, -1)
            u = c[:, :-1] / c[:, -1:]
    return _sample_pdf_merge_core(
        z_vals, bins, weights, u, n_samples, block_rays, interpret
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5, 6))
def _sample_pdf_merge_core(z_vals, bins, weights, u, n_samples, block_rays,
                           interpret):
    N, M = bins.shape
    Mz = z_vals.shape[1]
    K = Mz + n_samples
    Mp = _round_up(M, 128)
    Mzp = _round_up(Mz, 128)
    Sp = _round_up(n_samples, 128)
    Kp = _round_up(K, 128)
    Np = _round_up(N, block_rays)

    bins_p = jnp.pad(bins, ((0, Np - N), (0, Mp - M)), mode="edge")
    w_p = jnp.pad(weights, ((0, Np - N), (0, Mp - (M - 1))))
    u_p = jnp.pad(u, ((0, Np - N), (0, Sp - n_samples)))
    z_p = jnp.pad(z_vals, ((0, Np - N), (0, Mzp - Mz)), mode="edge")

    out = pl.pallas_call(
        functools.partial(_merge_kernel, M=M, Mz=Mz, S=n_samples),
        out_shape=jax.ShapeDtypeStruct((Np, Kp), z_vals.dtype),
        grid=(Np // block_rays,),
        in_specs=[
            pl.BlockSpec((block_rays, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, Mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, Mzp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rays, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bins_p, w_p, u_p, z_p)
    return out[:N, :K]


@_sample_pdf_merge_core.defjvp
def _sample_pdf_merge_core_jvp(n_samples, block_rays, interpret, primals,
                               tangents):
    out = _sample_pdf_merge_core(*primals, n_samples, block_rays, interpret)
    return out, jnp.zeros_like(out)
