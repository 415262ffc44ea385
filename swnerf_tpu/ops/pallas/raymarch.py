"""Fused NeRF ray-march Pallas kernels: positional encoding + the whole MLP
trunk in one VMEM pass (forward AND backward).

This is the performance core mandated by BASELINE.json's north star (fuse
embedder + MLP instead of the reference's ``netchunk`` Python loop,
nerf/run.py:63-87). The XLA path materializes every hidden layer ([P, 256])
to HBM between matmuls — ~10 round trips per point — which caps throughput
well below the MXU. These kernels keep ALL weights (~2.4 MB) and the running
activation tile in VMEM; only raw (pts, viewdirs) [P, 8] inputs and the
4-channel raw output touch HBM.

Key tricks:
  * skip / view concats as split matmuls:
    ``cat([emb, h]) @ W == emb @ W_top + h @ W_bottom`` (no concatenation);
  * feature+alpha heads packed into one [W, W+128] matmul;
  * the Fourier embedding as matmul+sin:
    ``emb = pts8 @ E0 + sin(pts8 @ S + PHASE) * MASK`` where S holds the
    2^i frequencies and PHASE turns sin columns into cos (cos t =
    sin(t + pi/2)) — so the encoder and its VJP live on the MXU/VPU with no
    HBM intermediates;
  * backward = second kernel: recompute activations per tile (remat in
    VMEM), reverse with transpose-free dot_generals, accumulate dW/db in
    VMEM-resident f32 accumulators across grid steps.

v5e notes: vector compares must be f32 (no bf16 cmp); backward tiles are
sized so D resident activations + accumulators fit 16 MB VMEM.

Covers the flagship architecture (use_viewdirs, one skip, netwidth % 128 ==
0, embed dims <= 128); other configs fall back to the jnp trunk
(models/vanilla.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supports_config(cfg) -> bool:
    """The fused kernels cover the flagship shape family."""
    return (
        cfg.use_viewdirs
        and cfg.netwidth % 128 == 0
        and len(cfg.skips) <= 1
        and cfg.input_ch <= 128
        and cfg.input_ch_views <= 128
        and cfg.netdepth >= 2
        and (not cfg.skips or 0 < cfg.skips[0] < cfg.netdepth - 1)
    )


# ---------------------------------------------------------------------------
# Parameter packing
# ---------------------------------------------------------------------------


def pack_params(params, cfg, dtype=jnp.float32) -> Tuple[list, dict]:
    """Pad the pytree into 128-aligned matrices for the kernels.

    Layer i's weight is stored [in_pad, W]; the post-skip layer is split
    into (emb rows, h rows); feature+alpha are one [W, W+128] matmul
    (col W = alpha).
    """
    W = cfg.netwidth

    def cast(x):
        return x.astype(dtype)

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    skip = cfg.skips[0] if cfg.skips else -1
    flat = []
    for i, lyr in enumerate(params["pts_linears"]):
        w = lyr["w"]
        if i == skip + 1:
            flat.append(cast(pad_rows(w[: cfg.input_ch], 128)))
            flat.append(cast(w[cfg.input_ch :]))
        elif i == 0:
            flat.append(cast(pad_rows(w, 128)))
        else:
            flat.append(cast(w))
        flat.append(lyr["b"][None, :].astype(jnp.float32))

    fa_w = jnp.concatenate(
        [
            params["feature_linear"]["w"],
            jnp.pad(params["alpha_linear"]["w"], ((0, 0), (0, 127))),
        ],
        axis=1,
    )
    fa_b = jnp.concatenate(
        [params["feature_linear"]["b"], jnp.pad(params["alpha_linear"]["b"], (0, 127))]
    )
    flat.append(cast(fa_w))
    flat.append(fa_b[None, :].astype(jnp.float32))
    vw = params["views_linears"][0]["w"]
    flat.append(cast(vw[:W]))
    flat.append(cast(pad_rows(vw[W:], 128)))
    flat.append(params["views_linears"][0]["b"][None, :].astype(jnp.float32))
    flat.append(cast(jnp.pad(params["rgb_linear"]["w"], ((0, 0), (0, 125)))))
    flat.append(jnp.pad(params["rgb_linear"]["b"], (0, 125))[None, :].astype(jnp.float32))

    meta = {"D": cfg.netdepth, "W": W, "skip": skip}
    return flat, meta


# ---------------------------------------------------------------------------
# In-kernel Fourier embedding (matmul + phase-shifted sin)
# ---------------------------------------------------------------------------


def build_embed_consts(num_freqs: int, dims: int = 3):
    """Constants for emb = x8 @ E0 + sin(x8 @ S + PHASE) * MASK.

    Column layout matches ops.embedding.positional_encoding: identity dims,
    then per freq i: sin(2^i x)(dims), cos(2^i x)(dims). x8 is the input
    padded to 8 lanes.
    """
    out_dim = dims + 2 * num_freqs * dims
    assert out_dim <= 128
    E0 = np.zeros((8, 128), np.float32)
    S = np.zeros((8, 128), np.float32)
    PHASE = np.zeros((1, 128), np.float32)
    MASK = np.zeros((1, 128), np.float32)
    for a in range(dims):
        E0[a, a] = 1.0
    for i in range(num_freqs):
        f = float(2.0**i)
        base = dims + 2 * dims * i
        for a in range(dims):
            S[a, base + a] = f  # sin column
            S[a, base + dims + a] = f  # cos column
            PHASE[0, base + dims + a] = np.pi / 2.0
            MASK[0, base + a] = 1.0
            MASK[0, base + dims + a] = 1.0
    return E0, S, PHASE, MASK


def build_embed_consts_xt(num_freqs_pos: int, num_freqs_time: int):
    """Combined-constant variant of build_embed_consts for time-conditioned
    fields: x8 carries [x, y, z, t] in lanes 0-3 and ONE matmul+sin produces
    [embed(xyz) | embed(t)] — the packed T-NeRF input layout
    (t_nerf/run_tnerf.py:33-41 embeds pos and time separately then
    concatenates). Lane width grows in 128-blocks when the combined
    embedding exceeds one block (multires level 0: 123 + 17 = 140)."""
    dpos = 3 + 6 * num_freqs_pos
    dtime = 1 + 2 * num_freqs_time
    L = max(128, _round_up(dpos + dtime, 128))
    E0 = np.zeros((8, L), np.float32)
    S = np.zeros((8, L), np.float32)
    PHASE = np.zeros((1, L), np.float32)
    MASK = np.zeros((1, L), np.float32)
    for a in range(3):
        E0[a, a] = 1.0
    for i in range(num_freqs_pos):
        f = float(2.0**i)
        base = 3 + 6 * i
        for a in range(3):
            S[a, base + a] = f
            S[a, base + 3 + a] = f
            PHASE[0, base + 3 + a] = np.pi / 2.0
            MASK[0, base + a] = 1.0
            MASK[0, base + 3 + a] = 1.0
    E0[3, dpos] = 1.0
    for i in range(num_freqs_time):
        f = float(2.0**i)
        base = dpos + 1 + 2 * i
        S[3, base] = f
        S[3, base + 1] = f
        PHASE[0, base + 1] = np.pi / 2.0
        MASK[0, base] = 1.0
        MASK[0, base + 1] = 1.0
    return E0, S, PHASE, MASK


def _embed_fwd(x8, e0, s, phase, mask):
    """x8 [B, 8] f32 -> emb [B, 128] f32."""
    ident = jnp.dot(x8, e0, preferred_element_type=jnp.float32)
    t = jnp.dot(x8, s, preferred_element_type=jnp.float32) + phase
    return ident + jnp.sin(t) * mask


def _embed_bwd(x8, g, e0, s, phase, mask):
    """d(emb)/d(x8)^T @ g: [B, 128] f32 -> [B, 8] f32."""
    t = jnp.dot(x8, s, preferred_element_type=jnp.float32) + phase
    gs = g * mask * jnp.cos(t)
    return _mmt(g, e0) + _mmt(gs, s)


# ---------------------------------------------------------------------------
# Shared trunk bodies (operate on values; weight iterator supplies arrays)
# ---------------------------------------------------------------------------


def _prec(a):
    # f32 compute dtype = parity mode: full-precision MXU passes (Mosaic
    # supports only DEFAULT/HIGHEST; HIGHEST needs multi-pass scratch, hence
    # the smaller f32 tiles below). bf16 = native single-pass MXU.
    return jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_prec(b))


def _tmm(a, b):
    """a^T @ b contraction over rows (no materialized transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a),
    )


def _mmt(a, b):
    """a @ b^T contraction over last dims."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a),
    )


def _act_fwd(z, act: str):
    """Trunk activation on the f32 pre-activation. ELU is written as an f32
    where + exp (no bf16 compares on v5e)."""
    if act == "relu":
        return jnp.maximum(z, 0.0)
    # elu: z > 0 ? z : exp(z) - 1
    return jnp.where(z > 0.0, z, jnp.exp(z) - 1.0)


def _act_grad(h, act: str):
    """d act / d z from the stored POST-activation (remat-friendly): relu'
    = [h > 0]; elu' = 1 for h > 0 else h + 1 (h = exp(z) - 1)."""
    h32 = h.astype(jnp.float32)
    if act == "relu":
        return (h32 > 0).astype(jnp.float32)
    return jnp.where(h32 > 0, 1.0, h32 + 1.0)


def _trunk_forward(
    emb, vemb, nxt, D: int, skip: int, W: int, plain_head: bool = False,
    act: str = "relu", rgb_relu: bool = False,
):
    """emb/vemb [B, L] (compute dtype) -> raw out [B, 128] f32
    (lanes 0-2 rgb, 3 alpha/sigma). ``plain_head=True`` skips the view
    branch and applies a single [W, 128] head (lanes 0-2 = output) — the
    D-NeRF deformation-MLP shape (model.py:113-136); vemb is ignored.
    ``act`` selects the trunk/view activation (T-NeRF uses ELU,
    model.py:152-210); ``rgb_relu`` applies the T-NeRF ReLU color head
    (model.py:183-186)."""
    cdt = emb.dtype
    h = None
    for i in range(D):
        if i == skip + 1:
            w_top, w_bot, b = nxt(), nxt(), nxt()
            z = _mm(emb, w_top) + _mm(h, w_bot) + b
        else:
            w, b = nxt(), nxt()
            z = _mm(emb if i == 0 else h, w) + b
        h = _act_fwd(z, act).astype(cdt)

    if plain_head:
        w_out, b_out = nxt(), nxt()
        return _mm(h, w_out) + b_out

    fa_w, fa_b = nxt(), nxt()
    fa = _mm(h, fa_w) + fa_b
    alpha = fa[:, W : W + 1]
    feat = fa[:, :W].astype(cdt)  # no activation (model.py:50)

    w_vf, w_vv, b_v = nxt(), nxt(), nxt()
    hv = _act_fwd(_mm(feat, w_vf) + _mm(vemb, w_vv) + b_v, act).astype(cdt)
    w_rgb, b_rgb = nxt(), nxt()
    rgb = _mm(hv, w_rgb) + b_rgb
    if rgb_relu:
        rgb = jnp.maximum(rgb, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    return jnp.where(lane < 3, rgb, jnp.where(lane == 3, alpha, 0.0))


def _trunk_backward(
    emb, vemb, g, nxt, D: int, skip: int, W: int, plain_head: bool = False,
    act: str = "relu", rgb_relu: bool = False, need_din: bool = True,
):
    """Recompute + reverse. Returns (grads list in flat order, demb, dvemb)
    — all f32. Masks compared in f32 (no bf16 cmp on v5e).

    ``need_din=False`` skips the input-gradient matmuls (demb at the first
    and skip layers, dvemb at the view layer) — the training path detaches
    sample positions, so those cotangents are discarded anyway; skipping
    them removes ~3 of the ~47 MXU passes per point."""
    cdt = emb.dtype

    # forward recompute keeping post-activation values
    hs = []
    ws = []
    h = None
    for i in range(D):
        if i == skip + 1:
            w_top, w_bot, b = nxt(), nxt(), nxt()
            z = _mm(emb, w_top) + _mm(h, w_bot) + b
            ws.append((w_top, w_bot))
        else:
            w, b = nxt(), nxt()
            z = _mm(emb if i == 0 else h, w) + b
            ws.append((w,))
        h = _act_fwd(z, act).astype(cdt)
        hs.append(h)

    if plain_head:
        w_out, _b_out = nxt(), nxt()
        g_c = g.astype(cdt)
        dh = _mmt(g_c, w_out)
        dW_out = _tmm(hs[D - 1], g_c)
        db_out = jnp.sum(g, axis=0, keepdims=True)
        demb = jnp.zeros(emb.shape, jnp.float32)
        trunk_grads = []
        for i in range(D - 1, -1, -1):
            dz = (dh * _act_grad(hs[i], act)).astype(cdt)
            db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
            if i == skip + 1:
                w_top, w_bot = ws[i]
                trunk_grads.append((_tmm(emb, dz), _tmm(hs[i - 1], dz), db))
                if need_din:
                    demb = demb + _mmt(dz, w_top)
                dh = _mmt(dz, w_bot)
            else:
                (w,) = ws[i]
                x = emb if i == 0 else hs[i - 1]
                trunk_grads.append((_tmm(x, dz), db))
                if i == 0:
                    if need_din:
                        demb = demb + _mmt(dz, w)
                else:
                    dh = _mmt(dz, w)
        grads = []
        for i in range(D):
            grads.extend(trunk_grads[D - 1 - i])
        grads += [dW_out, db_out]
        return grads, demb, jnp.zeros(vemb.shape, jnp.float32)

    fa_w, fa_b = nxt(), nxt()
    fa = _mm(h, fa_w) + fa_b
    feat = fa[:, :W].astype(cdt)
    w_vf, w_vv, b_v = nxt(), nxt(), nxt()
    hv = _act_fwd(_mm(feat, w_vf) + _mm(vemb, w_vv) + b_v, act).astype(cdt)
    w_rgb, b_rgb = nxt(), nxt()

    # backward
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb32 = jnp.where(lane < 3, g, 0.0)
    if rgb_relu:
        # T-NeRF ReLU color head (model.py:186): mask by the recomputed
        # pre-clip output.
        u = _mm(hv, w_rgb) + b_rgb
        g_rgb32 = g_rgb32 * (u > 0.0).astype(jnp.float32)
    g_rgb = g_rgb32.astype(cdt)
    dalpha = jnp.where(lane == 3, g, 0.0)

    dhv = _mmt(g_rgb, w_rgb) * _act_grad(hv, act)
    dW_rgb = _tmm(hv, g_rgb)
    db_rgb = jnp.sum(g_rgb32, axis=0, keepdims=True)
    dhv_c = dhv.astype(cdt)

    dfeat = _mmt(dhv_c, w_vf)
    dvemb = (
        _mmt(dhv_c, w_vv) if need_din else jnp.zeros(vemb.shape, jnp.float32)
    )
    dW_vf = _tmm(feat, dhv_c)
    dW_vv = _tmm(vemb, dhv_c)
    db_v = jnp.sum(dhv, axis=0, keepdims=True)

    dfa = jnp.concatenate([dfeat, jnp.zeros_like(dalpha)], axis=1)
    fa_lane = jax.lax.broadcasted_iota(jnp.int32, dfa.shape, 1)
    dalpha_col = jnp.sum(dalpha, axis=1, keepdims=True)
    dfa = jnp.where(fa_lane == W, dalpha_col, dfa).astype(cdt)
    dh = _mmt(dfa, fa_w)
    dW_fa = _tmm(hs[D - 1], dfa)
    db_fa = jnp.sum(dfa.astype(jnp.float32), axis=0, keepdims=True)

    demb = jnp.zeros(emb.shape, jnp.float32)
    trunk_grads = []
    for i in range(D - 1, -1, -1):
        dz = (dh * _act_grad(hs[i], act)).astype(cdt)
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        if i == skip + 1:
            w_top, w_bot = ws[i]
            trunk_grads.append((_tmm(emb, dz), _tmm(hs[i - 1], dz), db))
            if need_din:
                demb = demb + _mmt(dz, w_top)
            dh = _mmt(dz, w_bot)
        else:
            (w,) = ws[i]
            x = emb if i == 0 else hs[i - 1]
            trunk_grads.append((_tmm(x, dz), db))
            if i == 0:
                if need_din:
                    demb = demb + _mmt(dz, w)
            else:
                dh = _mmt(dz, w)

    grads = []
    for i in range(D):
        grads.extend(trunk_grads[D - 1 - i])
    grads += [dW_fa, db_fa, dW_vf, dW_vv, db_v, dW_rgb, db_rgb]
    return grads, demb, dvemb


# ---------------------------------------------------------------------------
# Kernels: embedded-input variant (emb/vemb precomputed outside)
# ---------------------------------------------------------------------------


def _ref_iter(refs):
    it = iter(refs)

    def nxt():
        return next(it)[:]

    return nxt


def _fwd_kernel(emb_ref, vemb_ref, *refs, D: int, skip: int, W: int,
                act: str = "relu", rgb_relu: bool = False):
    out_ref = refs[-1]
    nxt = _ref_iter(refs[:-1])
    cdt = refs[0].dtype
    out_ref[:] = _trunk_forward(
        emb_ref[:].astype(cdt), vemb_ref[:].astype(cdt), nxt, D, skip, W,
        act=act, rgb_relu=rgb_relu,
    )


def _bwd_kernel(emb_ref, vemb_ref, g_ref, *refs, D: int, skip: int, W: int,
                act: str = "relu", rgb_relu: bool = False, need_din: bool = True):
    n_w = (len(refs) - 2) // 2
    wrefs = refs[:n_w]
    grefs = refs[n_w:-2]
    demb_ref, dvemb_ref = refs[-2], refs[-1]
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    nxt = _ref_iter(wrefs)
    grads, demb, dvemb = _trunk_backward(
        emb_ref[:].astype(cdt), vemb_ref[:].astype(cdt), g_ref[:], nxt, D, skip, W,
        act=act, rgb_relu=rgb_relu, need_din=need_din,
    )
    for r, gval in zip(grefs, grads):
        r[:] += gval.astype(r.dtype)
    demb_ref[:] = demb
    dvemb_ref[:] = dvemb


def _fwd_kernel_plain(emb_ref, *refs, D: int, skip: int, W: int,
                      act: str = "relu", rgb_relu: bool = False):
    del rgb_relu  # no color head on the plain variant
    out_ref = refs[-1]
    nxt = _ref_iter(refs[:-1])
    cdt = refs[0].dtype
    emb = emb_ref[:].astype(cdt)
    out_ref[:] = _trunk_forward(emb, emb, nxt, D, skip, W, plain_head=True, act=act)


def _bwd_kernel_plain(emb_ref, g_ref, *refs, D: int, skip: int, W: int,
                      act: str = "relu", rgb_relu: bool = False, need_din: bool = True):
    del rgb_relu
    n_w = (len(refs) - 1) // 2
    wrefs = refs[:n_w]
    grefs = refs[n_w:-1]
    demb_ref = refs[-1]
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    emb = emb_ref[:].astype(cdt)
    nxt = _ref_iter(wrefs)
    grads, demb, _ = _trunk_backward(
        emb, emb, g_ref[:], nxt, D, skip, W, plain_head=True, act=act,
        need_din=need_din,
    )
    for r, gval in zip(grefs, grads):
        r[:] += gval.astype(r.dtype)
    demb_ref[:] = demb


def _fwd_kernel_plain_raw(x8_ref, *refs, D: int, skip: int, W: int,
                          act: str = "relu", rgb_relu: bool = False):
    """Plain-head (deformation MLP) forward with the [embed(xyz)|embed(t)]
    encode in-kernel: x8 lanes 0-2 position, lane 3 time; 4 xt consts lead
    the refs. The [P, L] embedding stream never exists in HBM."""
    del rgb_relu
    out_ref = refs[-1]
    consts = [r[:] for r in refs[:4]]
    nxt = _ref_iter(refs[4:-1])
    cdt = refs[4].dtype
    emb = _embed_fwd(x8_ref[:], *consts).astype(cdt)
    out_ref[:] = _trunk_forward(emb, emb, nxt, D, skip, W, plain_head=True, act=act)


def _bwd_kernel_plain_raw(x8_ref, g_ref, *refs, D: int, skip: int, W: int,
                          act: str = "relu", rgb_relu: bool = False,
                          need_din: bool = True):
    del rgb_relu
    consts = [r[:] for r in refs[:4]]
    rest = refs[4:]
    n_w = (len(rest) - 1) // 2
    wrefs = rest[:n_w]
    grefs = rest[n_w:-1]
    dx_ref = rest[-1]
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    x8 = x8_ref[:]
    emb = _embed_fwd(x8, *consts).astype(cdt)
    nxt = _ref_iter(wrefs)
    grads, demb, _ = _trunk_backward(
        emb, emb, g_ref[:], nxt, D, skip, W, plain_head=True, act=act,
        need_din=need_din,
    )
    for r, gval in zip(grefs, grads):
        r[:] += gval.astype(r.dtype)
    if need_din:
        dx_ref[:] = _embed_bwd(x8, demb, *consts)
    else:
        dx_ref[:] = jnp.zeros_like(dx_ref)


# ---------------------------------------------------------------------------
# Kernels: raw-input variant (embedding fused inside)
# ---------------------------------------------------------------------------


def _fwd_kernel_raw(pts_ref, vd_ref, *refs, D: int, skip: int, W: int,
                    act: str = "relu", rgb_relu: bool = False):
    del act, rgb_relu  # raw variant serves the vanilla family only
    # refs: e0p, sp, php, mkp, e0v, sv, phv, mkv, weights..., out
    out_ref = refs[-1]
    consts = [r[:] for r in refs[:8]]
    nxt = _ref_iter(refs[8:-1])
    cdt = refs[8].dtype
    emb = _embed_fwd(pts_ref[:], *consts[:4]).astype(cdt)
    vemb = _embed_fwd(vd_ref[:], *consts[4:]).astype(cdt)
    out_ref[:] = _trunk_forward(emb, vemb, nxt, D, skip, W)


def _bwd_kernel_raw(pts_ref, vd_ref, g_ref, *refs, D: int, skip: int, W: int,
                    act: str = "relu", rgb_relu: bool = False, need_din: bool = True):
    del act, rgb_relu, need_din  # raw variant always produces input grads
    consts = [r[:] for r in refs[:8]]
    rest = refs[8:]
    n_w = (len(rest) - 2) // 2
    wrefs = rest[:n_w]
    grefs = rest[n_w:-2]
    dpts_ref, dvd_ref = rest[-2], rest[-1]
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    pts8 = pts_ref[:]
    vd8 = vd_ref[:]
    emb = _embed_fwd(pts8, *consts[:4]).astype(cdt)
    vemb = _embed_fwd(vd8, *consts[4:]).astype(cdt)
    nxt = _ref_iter(wrefs)
    grads, demb, dvemb = _trunk_backward(emb, vemb, g_ref[:], nxt, D, skip, W)
    for r, gval in zip(grefs, grads):
        r[:] += gval.astype(r.dtype)
    dpts_ref[:] = _embed_bwd(pts8, demb, *consts[:4])
    dvd_ref[:] = _embed_bwd(vd8, dvemb, *consts[4:])


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _vmem_params(vmem_mb: int):
    """Mosaic's default VMEM budget is conservative (the v5e core has far
    more than the 16 MB the round-1/2 notes assumed — R=8..32 render tiles
    compile and RUN once the cap is raised). vmem_mb > 0 raises the
    per-kernel cap; an over-ask fails loudly at compile."""
    if vmem_mb > 0:
        return {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)}
    return {}


def _resolve_vmem_mb(vmem_mb) -> int:
    """Resolve the per-kernel VMEM cap at the PUBLIC-wrapper call site so
    SWNERF_FUSED_VMEM_MB participates in trace caching like the render
    kernels' jit-static cap (render_fused.py). The default here is 0 (keep
    the Mosaic default), NOT render_fused's 100: these kernels' 512-row
    backward blocks fit the default budget and raising unneeded caps
    measured neutral-to-slower (PERFORMANCE.md round-3 sweep rows)."""
    if vmem_mb is not None:
        return int(vmem_mb)
    import os

    return int(os.environ.get("SWNERF_FUSED_VMEM_MB", "0"))


def _bwd_block(dtype, block: int, raw: bool = False) -> int:
    # Backward holds all D activations + grad accumulators in VMEM; fp32
    # parity mode additionally needs HIGHEST-precision multi-pass scratch.
    # 512 measured OPTIMAL for bf16 even with the VMEM cap raised: block
    # 2048 backwards are ~20% SLOWER (round-3 probe — the reverse working
    # set thrashes at big rows), so the cap is kept unconditionally.
    if dtype == jnp.float32:
        return min(block, 128)
    return min(block, 512)


def _const_specs(arrs):
    return [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for a in arrs
    ]


def _tile_spec(block, lanes=128):
    return pl.BlockSpec((block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _run_fwd(kernel, tiles, consts, flat, meta, block, interpret, P, vmem_mb=0):
    # fp32 (HIGHEST-precision) matmuls need extra multi-pass scratch.
    if flat[0].dtype == jnp.float32:
        block = min(block, 1024)
    return pl.pallas_call(
        functools.partial(
            kernel, D=meta["D"], skip=meta["skip"], W=meta["W"],
            act=meta.get("act", "relu"), rgb_relu=meta.get("rgb_relu", False),
        ),
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        grid=(P // block,),
        in_specs=[_tile_spec(block, t.shape[-1]) for t in tiles]
        + _const_specs(consts)
        + _const_specs(flat),
        out_specs=_tile_spec(block),
        interpret=interpret,
        **_vmem_params(vmem_mb),
    )(*tiles, *consts, *flat)


def _run_bwd(kernel, tiles, g, consts, flat, meta, block, interpret, P, din_lanes,
             vmem_mb=0):
    block = _bwd_block(flat[0].dtype, block, raw=bool(consts))
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in flat]
    out_specs = _const_specs(flat)
    for lanes in din_lanes:
        out_shapes.append(jax.ShapeDtypeStruct((P, lanes), jnp.float32))
        out_specs.append(_tile_spec(block, lanes))
    outs = pl.pallas_call(
        functools.partial(
            kernel, D=meta["D"], skip=meta["skip"], W=meta["W"],
            act=meta.get("act", "relu"), rgb_relu=meta.get("rgb_relu", False),
            need_din=meta.get("need_din", True),
        ),
        out_shape=tuple(out_shapes),
        grid=(P // block,),
        in_specs=[_tile_spec(block, t.shape[-1]) for t in tiles]
        + [_tile_spec(block)]
        + _const_specs(consts)
        + _const_specs(flat),
        out_specs=tuple(out_specs),
        interpret=interpret,
        **_vmem_params(vmem_mb),
    )(*tiles, g, *consts, *flat)
    dflat = [d.astype(f.dtype) for d, f in zip(outs[: len(flat)], flat)]
    return dflat, outs[len(flat) :]


# ---------------------------------------------------------------------------
# Public op 1: fused_trunk (embedded inputs)
# ---------------------------------------------------------------------------


def fused_trunk(
    params,
    cfg,
    pts_emb: jnp.ndarray,
    views_emb: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    need_input_grads: bool = True,
    vmem_mb: int = None,
) -> jnp.ndarray:
    """Fused trunk on embedded inputs: [..., in_ch], [..., in_ch_views] ->
    raw [..., 4]. Differentiable (Pallas backward).

    ``need_input_grads=False`` skips the input-cotangent matmuls in the
    backward kernel (the cotangents come back as zeros) — correct whenever
    the embeddings are constants w.r.t. the differentiated values, which is
    every training/eval path on a static field (positions are detached,
    reference run.py:398)."""
    lead = pts_emb.shape[:-1]
    emb = pts_emb.reshape(-1, pts_emb.shape[-1])
    vemb = views_emb.reshape(-1, views_emb.shape[-1])
    n = emb.shape[0]
    P = _round_up(max(n, block), block)

    emb_p = jnp.zeros((P, 128), compute_dtype).at[:n, : emb.shape[-1]].set(
        emb.astype(compute_dtype)
    )
    vemb_p = jnp.zeros((P, 128), compute_dtype).at[:n, : vemb.shape[-1]].set(
        vemb.astype(compute_dtype)
    )
    flat, meta = pack_params(params, cfg, dtype=compute_dtype)
    out = _trunk_call(
        tuple(flat), emb_p, vemb_p, meta["D"], meta["skip"], meta["W"], block, interpret,
        "relu", False, need_input_grads, _resolve_vmem_mb(vmem_mb),
    )
    return out[:n, :4].reshape(*lead, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def _trunk_call(flat, emb_p, vemb_p, D, skip, W, block, interpret, act, rgb_relu,
                need_din=True, vmem_mb=0):
    meta = {"D": D, "skip": skip, "W": W, "act": act, "rgb_relu": rgb_relu}
    P = emb_p.shape[0]
    return _run_fwd(_fwd_kernel, [emb_p, vemb_p], [], list(flat), meta, block, interpret, P,
                    vmem_mb=vmem_mb)


def _trunk_call_fwd(flat, emb_p, vemb_p, D, skip, W, block, interpret, act, rgb_relu,
                    need_din, vmem_mb):
    out = _trunk_call(flat, emb_p, vemb_p, D, skip, W, block, interpret, act, rgb_relu,
                      need_din, vmem_mb)
    return out, (flat, emb_p, vemb_p)


def _trunk_call_bwd(D, skip, W, block, interpret, act, rgb_relu, need_din, vmem_mb,
                    res, g):
    flat, emb_p, vemb_p = res
    meta = {"D": D, "skip": skip, "W": W, "act": act, "rgb_relu": rgb_relu,
            "need_din": need_din}
    P = emb_p.shape[0]
    dflat, (demb, dvemb) = _run_bwd(
        _bwd_kernel, [emb_p, vemb_p], g, [], list(flat), meta, block, interpret, P,
        din_lanes=[emb_p.shape[1], vemb_p.shape[1]], vmem_mb=vmem_mb,
    )
    return tuple(dflat), demb.astype(emb_p.dtype), dvemb.astype(vemb_p.dtype)


_trunk_call.defvjp(_trunk_call_fwd, _trunk_call_bwd)


# ---------------------------------------------------------------------------
# Public op 2: fused_time_net (D-NeRF deformation MLP)
# ---------------------------------------------------------------------------


def supports_time_net(cfg) -> bool:
    return (
        cfg.netwidth % 128 == 0
        and len(cfg.skips) <= 1
        and cfg.input_ch + cfg.input_ch_time <= 256  # up to 2 lane blocks
        and cfg.netdepth >= 2
        and (not cfg.skips or 0 < cfg.skips[0] < cfg.netdepth - 1)
    )


def pack_time_params(tp, cfg, dtype=jnp.float32) -> Tuple[list, dict]:
    """Pack the deformation MLP (models/dnerf.py init_time_net_params):
    input = [embed(x), embed(t)]; the skip concatenates embed(x) ONLY
    (model.py:128-134) — expressed by zero-padding the split weight's rows
    beyond input_ch, which the shared kernel then ignores exactly."""
    W = cfg.netwidth
    skip = cfg.skips[0] if cfg.skips else -1

    def cast(x):
        return x.astype(dtype)

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    L = _round_up(cfg.input_ch + cfg.input_ch_time, 128)
    flat = []
    for i, lyr in enumerate(tp["layers"]):
        w = lyr["w"]
        if i == skip + 1:
            # skip concatenates embed(x) ONLY (model.py:128-134); rows past
            # input_ch stay zero so the kernel's emb@w_top ignores embed(t).
            flat.append(cast(pad_rows(w[: cfg.input_ch], L)))
            flat.append(cast(w[cfg.input_ch :]))
        elif i == 0:
            flat.append(cast(pad_rows(w, L)))
        else:
            flat.append(cast(w))
        flat.append(lyr["b"][None, :].astype(jnp.float32))
    flat.append(cast(jnp.pad(tp["out"]["w"], ((0, 0), (0, 125)))))
    flat.append(jnp.pad(tp["out"]["b"], (0, 125))[None, :].astype(jnp.float32))
    return flat, {"D": cfg.netdepth, "W": W, "skip": skip, "L": L}


def fused_time_net(
    tp,
    cfg,
    pts_emb: jnp.ndarray,
    time_emb: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    need_input_grads: bool = True,
    vmem_mb: int = None,
) -> jnp.ndarray:
    """Fused deformation MLP: (embed(x) [..., in_ch], embed(t)
    [..., in_ch_t]) -> dx [..., 3]."""
    lead = pts_emb.shape[:-1]
    pe = pts_emb.reshape(-1, pts_emb.shape[-1])
    te = time_emb.reshape(-1, time_emb.shape[-1])
    n = pe.shape[0]
    P = _round_up(max(n, block), block)
    L = _round_up(pe.shape[-1] + te.shape[-1], 128)
    emb_p = (
        jnp.zeros((P, L), compute_dtype)
        .at[:n, : pe.shape[-1]].set(pe.astype(compute_dtype))
        .at[:n, pe.shape[-1] : pe.shape[-1] + te.shape[-1]].set(te.astype(compute_dtype))
    )
    flat, meta = pack_time_params(tp, cfg, dtype=compute_dtype)
    out = _plain_call(
        tuple(flat), emb_p, meta["D"], meta["skip"], meta["W"], block, interpret,
        need_input_grads, _resolve_vmem_mb(vmem_mb),
    )
    return out[:n, :3].reshape(*lead, 3)


def fused_time_net_pts(
    tp,
    cfg,
    pts: jnp.ndarray,
    times: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    need_input_grads: bool = False,
    vmem_mb: int = None,
) -> jnp.ndarray:
    """Deformation MLP with the encode IN-KERNEL: raw pts [..., 3] +
    per-point times [..., 1] -> dx [..., 3]. Replaces fused_time_net's
    XLA-side positional_encoding producers and their [P, L] embedding
    stream with a [P, 8] x8 stream (16-32x less input traffic; the backward
    kernel's residual shrinks the same way). Differentiable in tp;
    positions/times are treated as detached (the deformation field's inputs
    are stop-gradient in every training path, models/dnerf.py)."""
    lead = pts.shape[:-1]
    p3 = pts.reshape(-1, 3)
    t1 = jnp.broadcast_to(times, pts.shape[:-1] + (1,)).reshape(-1, 1)
    n = p3.shape[0]
    P = _round_up(max(n, block), block)
    x8 = (
        jnp.zeros((P, 8), jnp.float32)
        .at[:n, :3].set(p3)
        .at[:n, 3].set(t1[:, 0])
    )
    consts = tuple(
        jnp.asarray(c)
        for c in build_embed_consts_xt(max(cfg.nf_pts, 0), max(cfg.nf_time, 0))
    )
    flat, meta = pack_time_params(tp, cfg, dtype=compute_dtype)
    out = _plain_raw_call(
        tuple(flat), x8, consts, meta["D"], meta["skip"], meta["W"], block,
        interpret, need_input_grads, _resolve_vmem_mb(vmem_mb),
    )
    return out[:n, :3].reshape(*lead, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _plain_raw_call(flat, x8, consts, D, skip, W, block, interpret, need_din=False,
                    vmem_mb=0):
    meta = {"D": D, "skip": skip, "W": W}
    P = x8.shape[0]
    return _run_fwd(
        _fwd_kernel_plain_raw, [x8], list(consts), list(flat), meta, block,
        interpret, P, vmem_mb=vmem_mb,
    )


def _plain_raw_call_fwd(flat, x8, consts, D, skip, W, block, interpret, need_din,
                        vmem_mb):
    out = _plain_raw_call(flat, x8, consts, D, skip, W, block, interpret, need_din,
                          vmem_mb)
    return out, (flat, x8, consts)


def _plain_raw_call_bwd(D, skip, W, block, interpret, need_din, vmem_mb, res, g):
    flat, x8, consts = res
    meta = {"D": D, "skip": skip, "W": W, "need_din": need_din}
    P = x8.shape[0]
    dflat, (dx8,) = _run_bwd(
        _bwd_kernel_plain_raw, [x8], g, list(consts), list(flat), meta, block,
        interpret, P, din_lanes=[8], vmem_mb=vmem_mb,
    )
    dconsts = jax.tree.map(jnp.zeros_like, consts)
    return tuple(dflat), dx8, dconsts


_plain_raw_call.defvjp(_plain_raw_call_fwd, _plain_raw_call_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _plain_call(flat, emb_p, D, skip, W, block, interpret, need_din=True, vmem_mb=0):
    meta = {"D": D, "skip": skip, "W": W}
    P = emb_p.shape[0]
    return _run_fwd(_fwd_kernel_plain, [emb_p], [], list(flat), meta, block, interpret, P,
                    vmem_mb=vmem_mb)


def _plain_call_fwd(flat, emb_p, D, skip, W, block, interpret, need_din, vmem_mb):
    out = _plain_call(flat, emb_p, D, skip, W, block, interpret, need_din, vmem_mb)
    return out, (flat, emb_p)


def _plain_call_bwd(D, skip, W, block, interpret, need_din, vmem_mb, res, g):
    flat, emb_p = res
    meta = {"D": D, "skip": skip, "W": W, "need_din": need_din}
    P = emb_p.shape[0]
    dflat, (demb,) = _run_bwd(
        _bwd_kernel_plain, [emb_p], g, [], list(flat), meta, block, interpret, P,
        din_lanes=[emb_p.shape[1]], vmem_mb=vmem_mb,
    )
    return tuple(dflat), demb.astype(emb_p.dtype)


_plain_call.defvjp(_plain_call_fwd, _plain_call_bwd)


# ---------------------------------------------------------------------------
# Public op 3: fused_field_raw (embedding inside the kernel)
# ---------------------------------------------------------------------------


def fused_field_raw(
    params,
    cfg,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    vmem_mb: int = None,
) -> jnp.ndarray:
    """Full fused field: raw pts [..., 3] + per-point viewdirs [..., 3] ->
    raw [..., 4]; the Fourier encoding runs inside the kernels."""
    assert cfg.i_embed == 0
    lead = pts.shape[:-1]
    p3 = pts.reshape(-1, 3)
    v3 = viewdirs.reshape(-1, 3)
    n = p3.shape[0]
    P = _round_up(max(n, block), block)

    pts8 = jnp.zeros((P, 8), jnp.float32).at[:n, :3].set(p3)
    vd8 = jnp.zeros((P, 8), jnp.float32).at[:n, :3].set(v3)

    flat, meta = pack_params(params, cfg, dtype=compute_dtype)
    consts = build_embed_consts(cfg.nf_pts) + build_embed_consts(cfg.nf_views)
    consts = tuple(jnp.asarray(c) for c in consts)
    out = _raw_call(
        tuple(flat), pts8, vd8, consts, meta["D"], meta["skip"], meta["W"], block,
        interpret, _resolve_vmem_mb(vmem_mb),
    )
    return out[:n, :4].reshape(*lead, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _raw_call(flat, pts8, vd8, consts, D, skip, W, block, interpret, vmem_mb=0):
    meta = {"D": D, "skip": skip, "W": W}
    P = pts8.shape[0]
    return _run_fwd(
        _fwd_kernel_raw, [pts8, vd8], list(consts), list(flat), meta, block, interpret, P,
        vmem_mb=vmem_mb,
    )


def _raw_call_fwd(flat, pts8, vd8, consts, D, skip, W, block, interpret, vmem_mb):
    out = _raw_call(flat, pts8, vd8, consts, D, skip, W, block, interpret, vmem_mb)
    return out, (flat, pts8, vd8, consts)


def _raw_call_bwd(D, skip, W, block, interpret, vmem_mb, res, g):
    flat, pts8, vd8, consts = res
    meta = {"D": D, "skip": skip, "W": W}
    P = pts8.shape[0]
    dflat, (dpts8, dvd8) = _run_bwd(
        _bwd_kernel_raw, [pts8, vd8], g, list(consts), list(flat), meta, block,
        interpret, P, din_lanes=[8, 8], vmem_mb=vmem_mb,
    )
    dconsts = jax.tree.map(jnp.zeros_like, consts)
    return tuple(dflat), dpts8, dvd8, dconsts


_raw_call.defvjp(_raw_call_fwd, _raw_call_bwd)


# ---------------------------------------------------------------------------
# Public op 4: fused_tnerf (ELU trunk, density/feature heads, ReLU color)
# ---------------------------------------------------------------------------


def supports_tnerf(cfg) -> bool:
    """The T-NeRF architecture family the fused kernel covers (reference
    model.py:152-210 as wired by t_nerf/run_tnerf.py:242-305): 128-aligned
    net_dim, packed (pos+time) input within one lane block, and a single
    skip (forward skips fire at i % skip_layer == 0, 0 < i < depth, so
    depth <= 2*skip_layer keeps exactly one; depth >= skip_layer+2 keeps it
    off the last layer — skip_layer == depth-1 would widen the heads' input
    and crash the reference too)."""
    in0 = cfg.in_feat + cfg.time_feat
    return (
        cfg.net_dim % 128 == 0
        and in0 <= 128
        and cfg.dir_feat <= 128
        and cfg.netdepth >= 2
        and cfg.skip_layer + 2 <= cfg.netdepth <= 2 * cfg.skip_layer
    )


def pack_tnerf_params(params, cfg, dtype=jnp.float32):
    """Pack the T-NeRF pytree (models/tnerf.py init_tnerf_params) into the
    generic head layout: trunk layers (skip split at layer skip_layer+1),
    feature+density as one [W, W+128] matmul (col W = sigma), the
    view-conditioned layer split into (feature rows, view-embed rows), and
    the color head — all half-width (W//2) slots zero-padded to 128 lanes
    so the shared kernel's shapes stay Mosaic-aligned."""
    W = cfg.net_dim
    in0 = cfg.in_feat + cfg.time_feat
    skip = cfg.skip_layer

    def cast(x):
        return x.astype(dtype)

    def pad_to(w, rows=None, cols=None):
        r = 0 if rows is None else rows - w.shape[0]
        c = 0 if cols is None else cols - w.shape[1]
        return jnp.pad(w, ((0, r), (0, c)))

    flat = []
    for i, lyr in enumerate(params["layers"]):
        w = lyr["w"]
        if i == skip + 1:
            # cat([inp, x]) @ w == inp @ w[:in0] + x @ w[in0:]
            flat.append(cast(pad_to(w[:in0], rows=128)))
            flat.append(cast(w[in0:]))
        elif i == 0:
            flat.append(cast(pad_to(w, rows=128)))
        else:
            flat.append(cast(w))
        flat.append(lyr["b"][None, :].astype(jnp.float32))

    fd_w = jnp.concatenate(
        [params["feature"]["w"], pad_to(params["density"]["w"], cols=128)], axis=1
    )
    fd_b = jnp.concatenate(
        [params["feature"]["b"], jnp.pad(params["density"]["b"], (0, 127))]
    )
    flat.append(cast(fd_w))
    flat.append(fd_b[None, :].astype(jnp.float32))

    vw = params["layer_9"]["w"]  # [W + dir_feat, W//2]
    flat.append(cast(pad_to(vw[:W], cols=128)))
    flat.append(cast(pad_to(vw[W:], rows=128, cols=128)))
    flat.append(
        jnp.pad(params["layer_9"]["b"], (0, 128 - vw.shape[1]))[None, :].astype(jnp.float32)
    )
    flat.append(cast(pad_to(params["color"]["w"], rows=128, cols=128)))
    flat.append(jnp.pad(params["color"]["b"], (0, 125))[None, :].astype(jnp.float32))

    return flat, {"D": cfg.netdepth, "W": W, "skip": skip, "act": "elu", "rgb_relu": True}


def fused_tnerf(
    params,
    cfg,
    pts_emb: jnp.ndarray,
    views_emb: jnp.ndarray,
    time_emb: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    need_input_grads: bool = True,
    vmem_mb: int = None,
) -> jnp.ndarray:
    """Fused T-NeRF field on embedded inputs -> raw [..., 4] (rgb after the
    ReLU color head, sigma). Differentiable (shared Pallas backward with ELU
    masks)."""
    lead = pts_emb.shape[:-1]
    pe = pts_emb.reshape(-1, pts_emb.shape[-1])
    te = time_emb.reshape(-1, time_emb.shape[-1])
    ve = views_emb.reshape(-1, views_emb.shape[-1])
    n = pe.shape[0]
    P = _round_up(max(n, block), block)

    emb_p = (
        jnp.zeros((P, 128), compute_dtype)
        .at[:n, : pe.shape[-1]].set(pe.astype(compute_dtype))
        .at[:n, pe.shape[-1] : pe.shape[-1] + te.shape[-1]].set(te.astype(compute_dtype))
    )
    vemb_p = jnp.zeros((P, 128), compute_dtype).at[:n, : ve.shape[-1]].set(
        ve.astype(compute_dtype)
    )
    flat, meta = pack_tnerf_params(params, cfg, dtype=compute_dtype)
    out = _trunk_call(
        tuple(flat), emb_p, vemb_p, meta["D"], meta["skip"], meta["W"], block, interpret,
        "elu", True, need_input_grads, _resolve_vmem_mb(vmem_mb),
    )
    return out[:n, :4].reshape(*lead, 4)
