"""Fused NeRF-MLP Pallas kernel: the whole trunk in one VMEM pass.

This is the performance core mandated by BASELINE.json's north star (fuse
embedder + MLP + compositing instead of the reference's ``netchunk`` Python
loop, nerf/run.py:63-87). The XLA path materializes every hidden layer
([P, 256] fp32) to HBM between matmuls — ~10 round trips per point — which
caps throughput well below the MXU. This kernel keeps ALL weights (~2.4 MB)
and the running activation tile in VMEM; only the embedded inputs and the
4-channel raw output touch HBM.

Layout: points-major [P_tile, C] with C zero-padded to 128 lanes. The skip
concat (model.py:45-46) is expressed as a split matmul:
``cat([emb, h]) @ W == emb @ W_top + h @ W_bottom`` — no in-kernel
concatenation. The view branch reuses the same trick.

The op is differentiable via ``jax.custom_vjp``: the backward pass is a
second Pallas kernel that *recomputes* the forward activations tile-by-tile
in VMEM (rematerialization — trading FLOPs for HBM, the right trade on TPU)
and accumulates dW/db across grid steps in VMEM-resident accumulators.

Covers the flagship architecture (use_viewdirs, one skip, netwidth % 128 ==
0); other configs fall back to the jnp trunk (models/vanilla.py).
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
    """The fused kernel covers the flagship shape family."""
    return (
        cfg.use_viewdirs
        and cfg.netwidth % 128 == 0
        and len(cfg.skips) <= 1
        and cfg.input_ch <= 128
        and cfg.input_ch_views <= 128
        and cfg.netdepth >= 2
        and (not cfg.skips or 0 < cfg.skips[0] < cfg.netdepth - 1)
    )


def pack_params(params, cfg, dtype=jnp.float32) -> Tuple[list, dict]:
    """Pad the pytree into 128-aligned matrices for the kernel.

    Returns (flat list of arrays, meta dict). Layer i's weight is stored
    [in_pad, W]; the post-skip layer is split into (emb rows, h rows); the
    feature and alpha heads are packed into ONE [W, W+128] matmul (col W is
    alpha) so the 1-wide alpha head doesn't cost a padded 128-wide matmul.
    """
    W = cfg.netwidth
    in_ch, view_ch = cfg.input_ch, cfg.input_ch_views
    skip = cfg.skips[0] if cfg.skips else -1

    def cast(x):
        return x.astype(dtype)

    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    flat = []
    for i, lyr in enumerate(params["pts_linears"]):
        w = lyr["w"]
        if i == skip + 1:
            # split: emb part [in_ch, W] and h part [W, W]
            flat.append(cast(pad_rows(w[:in_ch], 128)))
            flat.append(cast(w[in_ch:]))
        elif i == 0:
            flat.append(cast(pad_rows(w, 128)))
        else:
            flat.append(cast(w))
        flat.append(lyr["b"][None, :].astype(jnp.float32))  # [1, W]

    # feature+alpha packed: [W, W+128], cols [0,W) feature, col W alpha.
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
    # views layer: [W + view_ch, W//2] -> feature part + view part (padded)
    vw = params["views_linears"][0]["w"]
    flat.append(cast(vw[:W]))  # [W, W//2]
    flat.append(cast(pad_rows(vw[W:], 128)))  # [128, W//2]
    flat.append(params["views_linears"][0]["b"][None, :].astype(jnp.float32))
    # rgb head [W//2, 3] padded to 128 lanes
    flat.append(cast(jnp.pad(params["rgb_linear"]["w"], ((0, 0), (0, 125)))))
    flat.append(jnp.pad(params["rgb_linear"]["b"], (0, 125))[None, :].astype(jnp.float32))

    meta = {"D": cfg.netdepth, "W": W, "skip": skip, "in_ch": in_ch, "view_ch": view_ch}
    return flat, meta


def _fwd_kernel(emb_ref, vemb_ref, *refs, D: int, skip: int, W: int):
    """One tile: trunk + heads. refs = packed weights... , out_ref."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    cdt = wrefs[0].dtype  # compute dtype (f32 or bf16), accumulation f32

    it = iter(wrefs)

    def nxt():
        return next(it)[:]

    emb = emb_ref[:].astype(cdt)  # [P, 128]
    vemb = vemb_ref[:].astype(cdt)
    h = None
    for i in range(D):
        if i == skip + 1:
            w_top = nxt()
            w_bot = nxt()
            b = nxt()
            z = (
                jnp.dot(emb, w_top, preferred_element_type=jnp.float32)
                + jnp.dot(h, w_bot, preferred_element_type=jnp.float32)
                + b
            )
        else:
            w = nxt()
            b = nxt()
            x = emb if i == 0 else h
            z = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        h = jnp.maximum(z, 0.0).astype(cdt)

    # Packed feature+alpha head: [P, W] @ [W, W+128]; col W is alpha.
    fa_w, fa_b = nxt(), nxt()
    fa = jnp.dot(h, fa_w, preferred_element_type=jnp.float32) + fa_b
    alpha = fa[:, W : W + 1]
    feat = fa[:, :W].astype(cdt)  # no activation (model.py:50)

    w_vf, w_vv, b_v = nxt(), nxt(), nxt()
    hv = jnp.maximum(
        jnp.dot(feat, w_vf, preferred_element_type=jnp.float32)
        + jnp.dot(vemb, w_vv, preferred_element_type=jnp.float32)
        + b_v,
        0.0,
    ).astype(cdt)  # [P, W//2]
    w_rgb, b_rgb = nxt(), nxt()
    rgb = jnp.dot(hv, w_rgb, preferred_element_type=jnp.float32) + b_rgb  # [P,128]

    # out lanes: 0..2 rgb, 3 alpha.
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out_ref[:] = jnp.where(lane < 3, rgb, jnp.where(lane == 3, alpha, 0.0))


def _run_fwd(flat, emb_p, vemb_p, meta, block: int, interpret: bool):
    P = emb_p.shape[0]
    grid = (P // block,)
    in_specs = [
        pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for arr in flat:
        r, c = arr.shape
        in_specs.append(pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, D=meta["D"], skip=meta["skip"], W=meta["W"]),
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emb_p, vemb_p, *flat)


def fused_trunk(
    params,
    cfg,
    pts_emb: jnp.ndarray,
    views_emb: jnp.ndarray,
    block: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused forward of the vanilla trunk on embedded inputs.

    pts_emb [..., input_ch], views_emb [..., input_ch_views] -> raw [..., 4].
    Differentiable (custom VJP). ``compute_dtype=bf16`` halves VMEM/HBM and
    doubles MXU rate (fp32 accumulation either way).
    """
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
    out = _fused_call(
        tuple(flat), emb_p, vemb_p, meta["D"], meta["skip"], meta["W"], block, interpret
    )
    return out[:n, :4].reshape(*lead, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_call(flat, emb_p, vemb_p, D, skip, W, block, interpret):
    meta = {"D": D, "skip": skip, "W": W}
    return _run_fwd(list(flat), emb_p, vemb_p, meta, block, interpret)


def _fused_fwd(flat, emb_p, vemb_p, D, skip, W, block, interpret):
    out = _fused_call(flat, emb_p, vemb_p, D, skip, W, block, interpret)
    return out, (flat, emb_p, vemb_p)


def _tmm(a, b):
    """a^T @ b contraction over rows (no materialized transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mmt(a, b):
    """a @ b^T contraction over last dims."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd_kernel(emb_ref, vemb_ref, g_ref, *refs, D: int, skip: int, W: int):
    """Backward tile: recompute forward activations in VMEM, then reverse.

    refs layout: packed weights..., then outputs: [dW/db per packed array...,
    demb, dvemb]. Weight/bias grads are f32 accumulators shared across grid
    steps (zero-initialized at program 0, += afterwards)."""
    n_w = (len(refs) - 2) // 2
    wrefs = refs[:n_w]
    grefs = refs[n_w:-2]
    demb_ref, dvemb_ref = refs[-2], refs[-1]
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    it = iter(wrefs)

    def nxt():
        return next(it)[:]

    emb = emb_ref[:].astype(cdt)
    vemb = vemb_ref[:].astype(cdt)

    # ---- forward recompute, keeping post-relu activations ----
    hs = []
    h = None
    ws = []
    for i in range(D):
        if i == skip + 1:
            w_top, w_bot, b = nxt(), nxt(), nxt()
            z = (
                jnp.dot(emb, w_top, preferred_element_type=jnp.float32)
                + jnp.dot(h, w_bot, preferred_element_type=jnp.float32)
                + b
            )
            ws.append((w_top, w_bot))
        else:
            w, b = nxt(), nxt()
            z = jnp.dot(emb if i == 0 else h, w, preferred_element_type=jnp.float32) + b
            ws.append((w,))
        h = jnp.maximum(z, 0.0).astype(cdt)
        hs.append(h)

    fa_w, fa_b = nxt(), nxt()
    fa = jnp.dot(h, fa_w, preferred_element_type=jnp.float32) + fa_b
    feat = fa[:, :W].astype(cdt)
    w_vf, w_vv, _b_v = nxt(), nxt(), nxt()
    hv_pre = (
        jnp.dot(feat, w_vf, preferred_element_type=jnp.float32)
        + jnp.dot(vemb, w_vv, preferred_element_type=jnp.float32)
        + _b_v
    )
    hv = jnp.maximum(hv_pre, 0.0).astype(cdt)
    w_rgb, _b_rgb = nxt(), nxt()

    # ---- backward ----
    g = g_ref[:]  # [P, 128] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb = jnp.where(lane < 3, g, 0.0).astype(cdt)
    dalpha = jnp.where(lane == 3, g, 0.0)  # alpha grad sits in lane 3

    gi = iter(grefs)

    def acc(val):
        r = next(gi)
        r[:] += val.astype(r.dtype)

    # In grefs order we must emit grads matching the flat weight order, so
    # compute them and stash, then write in order at the end.
    out_grads = {}

    # rgb head (masks compared in f32 — bf16 cmp unsupported on v5e VPU)
    dhv = _mmt(g_rgb, w_rgb) * (hv.astype(jnp.float32) > 0)  # [P, W//2] f32
    dW_rgb = _tmm(hv, g_rgb)
    db_rgb = jnp.sum(g_rgb.astype(jnp.float32), axis=0, keepdims=True)
    dhv_c = dhv.astype(cdt)

    # views layer
    dfeat = _mmt(dhv_c, w_vf)  # [P, W]
    dvemb = _mmt(dhv_c, w_vv)  # [P, 128]
    dW_vf = _tmm(feat, dhv_c)
    dW_vv = _tmm(vemb, dhv_c)
    db_v = jnp.sum(dhv, axis=0, keepdims=True)

    # packed feature+alpha
    dfa = jnp.concatenate([dfeat, jnp.zeros_like(dalpha)], axis=1)
    fa_lane = jax.lax.broadcasted_iota(jnp.int32, dfa.shape, 1)
    # place dalpha's lane-3 value at lane W: roll the alpha grad into place.
    dalpha_col = jnp.sum(dalpha, axis=1, keepdims=True)  # [P,1] (only lane 3 nonzero)
    dfa = jnp.where(fa_lane == W, dalpha_col, dfa).astype(cdt)
    dh = _mmt(dfa, fa_w)  # [P, W]
    dW_fa = _tmm(hs[D - 1], dfa)
    db_fa = jnp.sum(dfa.astype(jnp.float32), axis=0, keepdims=True)

    # trunk reverse
    demb = jnp.zeros(emb.shape, jnp.float32)
    trunk_grads = []
    for i in range(D - 1, -1, -1):
        dz = (dh * (hs[i].astype(jnp.float32) > 0)).astype(cdt)
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        if i == skip + 1:
            w_top, w_bot = ws[i]
            dW_top = _tmm(emb, dz)
            dW_bot = _tmm(hs[i - 1], dz)
            demb = demb + _mmt(dz, w_top)
            dh = _mmt(dz, w_bot)
            trunk_grads.append((dW_top, dW_bot, db))
        else:
            (w,) = ws[i]
            x = emb if i == 0 else hs[i - 1]
            dW = _tmm(x, dz)
            if i == 0:
                demb = demb + _mmt(dz, w)
            else:
                dh = _mmt(dz, w)
            trunk_grads.append((dW, db))

    # Emit in flat order: trunk layers 0..D-1, fa, views, rgb.
    for i in range(D):
        for gval in trunk_grads[D - 1 - i]:
            acc(gval)
    acc(dW_fa)
    acc(db_fa)
    acc(dW_vf)
    acc(dW_vv)
    acc(db_v)
    acc(dW_rgb)
    acc(db_rgb)

    demb_ref[:] = demb
    dvemb_ref[:] = dvemb.astype(jnp.float32)


def _run_bwd(flat, emb_p, vemb_p, g, meta, block: int, interpret: bool):
    # The backward tile holds all D activations at once; shrink the block so
    # the recompute + grad accumulators fit VMEM (f32 needs the smallest).
    bwd_block = 512 if flat[0].dtype == jnp.float32 else 1024
    block = min(block, bwd_block)
    P = emb_p.shape[0]
    grid = (P // block,)

    def tile_spec():
        return pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [tile_spec(), tile_spec(), tile_spec()]
    for arr in flat:
        r, c = arr.shape
        in_specs.append(pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    for arr in flat:
        r, c = arr.shape
        out_shapes.append(jax.ShapeDtypeStruct((r, c), jnp.float32))
        out_specs.append(pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM))
    out_shapes += [
        jax.ShapeDtypeStruct((P, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, 128), jnp.float32),
    ]
    out_specs += [tile_spec(), tile_spec()]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, D=meta["D"], skip=meta["skip"], W=meta["W"]),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(emb_p, vemb_p, g, *flat)
    dflat = [d.astype(f.dtype) for d, f in zip(outs[: len(flat)], flat)]
    return dflat, outs[-2], outs[-1]


def _fused_bwd_xla(D, skip, W, block, interpret, res, g):
    """Backward via jax.vjp over a jnp replay of the packed-weight forward.

    Fallback path (SWNERF_FUSED_BWD=0); the live backward is the Pallas
    kernel above.
    """

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def replay(flat, emb, vemb):
        it = iter(flat)
        cdt = flat[0].dtype

        def nxt():
            return next(it)

        h = None
        for i in range(D):
            if i == skip + 1:
                w_top, w_bot, b = nxt(), nxt(), nxt()
                z = mm(emb, w_top) + mm(h, w_bot) + b
            else:
                w, b = nxt(), nxt()
                z = mm(emb if i == 0 else h, w) + b
            h = jnp.maximum(z, 0.0).astype(cdt)
        fa_w, fa_b = nxt(), nxt()
        fa = mm(h, fa_w) + fa_b
        alpha = fa[:, W : W + 1]
        feat = fa[:, :W].astype(cdt)
        w_vf, w_vv, b_v = nxt(), nxt(), nxt()
        hv = jnp.maximum(mm(feat, w_vf) + mm(vemb, w_vv) + b_v, 0.0).astype(cdt)
        w_rgb, b_rgb = nxt(), nxt()
        rgb = mm(hv, w_rgb) + b_rgb
        lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
        return jnp.where(lane < 3, rgb, jnp.where(lane == 3, alpha, 0.0))

    flat, emb_p, vemb_p = res
    _, vjp = jax.vjp(replay, list(flat), emb_p, vemb_p)
    dflat, demb, dvemb = vjp(g)
    return tuple(dflat), demb, dvemb


def _fused_bwd(D, skip, W, block, interpret, res, g):
    import os

    if os.environ.get("SWNERF_FUSED_BWD", "1") == "0":
        return _fused_bwd_xla(D, skip, W, block, interpret, res, g)
    flat, emb_p, vemb_p = res
    meta = {"D": D, "skip": skip, "W": W}
    dflat, demb, dvemb = _run_bwd(
        list(flat), emb_p, vemb_p, g, meta, block, interpret
    )
    return tuple(dflat), demb, dvemb


_fused_call.defvjp(_fused_fwd, _fused_bwd)
