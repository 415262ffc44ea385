"""One-kernel-per-pass training: MLP trunk forward + volume compositing +
per-ray MSE loss + full backward, fused into a single Pallas kernel.

Motivation (measured, PERFORMANCE.md round 2): the split fwd-kernel /
bwd-kernel scheme pays FOUR forward-equivalents of MXU work per point
(fwd, then the backward's remat recompute, dX, dW) plus XLA glue for
compositing and the loss. When the kernel knows the per-ray target, the
loss cotangent is computable inside (d sqerr/d rgb_map = 2(rgb_map -
target), scaled by a static constant), so forward and backward fuse into
one pass per tile: activations stay in VMEM between the forward and the
reverse sweep — THREE forward-equivalents, no recompute, no composite/loss
round trips. A lego train step becomes two kernel launches (coarse, fine)
plus the Pallas sample_pdf and small XLA (sampling, merge, Adam).

Replaces: embed->MLP->raw2outputs->loss->backward of the reference hot loop
(nerf/run.py:389-407,689-700) for the flagship (vanilla/NeRFOriginal)
architecture; other fields keep the split-kernel scheme.

In-kernel compositing (raw2outputs, ray.py:155-198) on ray-major tiles of
R whole rays x S samples:
  * exclusive-cumprod transmittance as a segmented Hillis-Steele scan in
    log space (log(1-alpha+1e-10) prefix sums via log2(S) shift+add steps);
  * per-ray reductions (rgb/acc/depth maps) as ONE [B,R]^T x [B,128] MXU
    matmul with a 0/1 segment matrix;
  * the backward's suffix sums (dL/dalpha_b needs sum_{c>b} dL/dw_c w_c)
    as the reverse segmented scan.

Gradient contract: gradients flow ONLY from the returned per-ray ``sqerr``
(sum over rgb channels of the squared error, after optional white
background); rgb/acc/depth/weights outputs are zero-tangent. This matches
the product loss exactly (mse = sum(sqerr) / (3N)).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swnerf_tpu.ops.pallas.raymarch import (
    _act_fwd,
    _act_grad,
    _embed_bwd,
    _embed_fwd,
    _mm,
    _mmt,
    _ref_iter,
    _round_up,
    _tmm,
    build_embed_consts,
    build_embed_consts_xt,
    pack_params,
)

EPS = 1e-10  # transmittance stabilizer (reference ray.py:188)


# ---------------------------------------------------------------------------
# Segmented scans (rows are ray-major: row = ray * S + sample)
# ---------------------------------------------------------------------------


def _row_in_ray(B: int, S: int):
    return jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) % S


def _seg_prefix_sum_excl(x, S: int):
    """Exclusive prefix sum within length-S row segments (Hillis-Steele,
    log2(S) shift+add steps; static slices only — Mosaic-friendly)."""
    B = x.shape[0]
    ridx = _row_in_ray(B, S)
    incl = x
    k = 1
    while k < S:
        shifted = jnp.concatenate([jnp.zeros((k, 1), x.dtype), incl[:-k]], 0)
        incl = incl + jnp.where(ridx >= k, shifted, 0.0)
        k *= 2
    return incl - x


def _seg_suffix_sum_excl(x, S: int):
    """Exclusive suffix sum within segments (sum over rows AFTER b)."""
    B = x.shape[0]
    ridx = _row_in_ray(B, S)
    incl = x
    k = 1
    while k < S:
        shifted = jnp.concatenate([incl[k:], jnp.zeros((k, 1), x.dtype)], 0)
        incl = incl + jnp.where(ridx < S - k, shifted, 0.0)
        k *= 2
    return incl - x


def _segment_matrix(B: int, S: int, R: int, cols: int, col_off):
    """0/1 [B, cols] matrix with Seg[b, col_off + b // S] = 1.

    ``cols`` >= R with a traced ``col_off`` supports ray tiles smaller than
    the 8-sublane minimum: the per-ray blocks stay (8, 128) and are
    revisited over 8/R consecutive grid steps, each writing its R-row slice
    (col_off = R * (step % (8/R)))."""
    row = jax.lax.broadcasted_iota(jnp.int32, (B, cols), 0) // S + col_off
    col = jax.lax.broadcasted_iota(jnp.int32, (B, cols), 1)
    return (row == col).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Trunk forward (keep activations) + reverse — flagship head (viewdirs, relu)
# ---------------------------------------------------------------------------


def _layer_fwd(emb, h_prev, ws_i, i: int, skip: int, act: str):
    """Recompute layer i's post-activation output from its input(s)."""
    if i == skip + 1:
        w_top, w_bot, b = ws_i
        z = _mm(emb, w_top) + _mm(h_prev, w_bot) + b
    else:
        w, b = ws_i
        z = _mm(emb if i == 0 else h_prev, w) + b
    return _act_fwd(z, act).astype(emb.dtype)


def _trunk_fwd_keep(emb, vemb, nxt, D: int, skip: int, W: int,
                    remat: bool = True, act: str = "relu",
                    store_stride: int = 2, store: bool = True):
    """Like raymarch._trunk_forward but returns the VMEM-resident caches the
    reverse sweep needs. VMEM economy (the fine pass tiles R rays x 192
    samples; a full activation cache can blow the ~16 MB budget): with
    ``remat`` only every ``store_stride``-th post-activation (+ the last) is
    kept — the reverse sweep recomputes the gaps from the nearest stored
    predecessor (memoized, so each skipped layer recomputes once) — and
    feat/hv are recomputed rather than cached. ``remat=False`` stores every
    layer (preferred when the tile is small enough to fit); stride 3-4
    trades ~1 recompute matmul per gap layer for the VMEM that unlocks
    bigger ray tiles. ``store=False`` (forward-only mode: eval passes, the
    external-cotangent forward) keeps NOTHING — no reverse sweep will run.

    Scheduling note (measured, PERFORMANCE.md round 3): this forward chain
    runs at ~41%% of the MXU roof vs the reverse sweep's ~87%% — the
    backward has three independent matmuls per layer to overlap, the
    forward is a pure matmul->activation dependency chain. Splitting the
    tile into two independent row-half chains to manufacture that overlap
    was tried and REGRESSED (24.6M vs 29.7M at rc16/rf8; 25.4M vs 27.0M at
    rc32/rf16): Mosaic schedules the traced order and does not interleave
    independent chains, so the split only halves the matmul M-dimension."""
    cdt = emb.dtype
    hs, ws = {}, []
    h = None
    for i in range(D):
        if i == skip + 1:
            w_top, w_bot, b = nxt(), nxt(), nxt()
            z = _mm(emb, w_top) + _mm(h, w_bot) + b
            ws.append((w_top, w_bot, b))
        else:
            w, b = nxt(), nxt()
            z = _mm(emb if i == 0 else h, w) + b
            ws.append((w, b))
        h = _act_fwd(z, act).astype(cdt)
        if store and (
            (not remat) or i % store_stride == store_stride - 1 or i == D - 1
        ):
            hs[i] = h

    fa_w, fa_b = nxt(), nxt()
    fa = _mm(h, fa_w) + fa_b
    alpha_raw = fa[:, W : W + 1]  # pre-noise density logit
    feat = fa[:, :W].astype(cdt)

    w_vf, w_vv, b_v = nxt(), nxt(), nxt()
    hv = _act_fwd(_mm(feat, w_vf) + _mm(vemb, w_vv) + b_v, act).astype(cdt)
    w_rgb, b_rgb = nxt(), nxt()
    rgb_logits = _mm(hv, w_rgb) + b_rgb  # [B, 128]; lanes 0-2 live

    cache = dict(hs=hs, ws=ws, fa_w=fa_w, fa_b=fa_b, w_vf=w_vf, w_vv=w_vv,
                 b_v=b_v, w_rgb=w_rgb)
    if not remat:
        cache["feat"], cache["hv"] = feat, hv
    return rgb_logits, alpha_raw, cache


def _trunk_reverse(emb, vemb, g, cache, D: int, skip: int, W: int,
                   act: str = "relu", input_grads: bool = False):
    """Reverse sweep on the (checkpointed) forward cache. ``g`` [B, 128]
    carries the raw cotangent: lanes 0-2 d rgb_logits, lane 3 d sigma.
    Returns (grads list in pack_params order, demb [B, 128] f32 or None) —
    ``input_grads`` accumulates d loss / d emb from layer 0 and the skip
    layer's emb rows (the D-NeRF canonical pass chains it through the
    encode into the deformation MLP; plain passes detach positions)."""
    cdt = emb.dtype
    stored, ws = cache["hs"], cache["ws"]
    fa_w, w_vf, w_vv, w_rgb = cache["fa_w"], cache["w_vf"], cache["w_vv"], cache["w_rgb"]

    def h_at(i):
        # Memoized gap recompute: with store_stride > 2 the nearest stored
        # activation may be several layers back; each skipped layer is
        # recomputed exactly once and cached for the remaining sweep.
        if i in stored:
            return stored[i]
        h = _layer_fwd(emb, h_at(i - 1) if i else None, ws[i], i, skip, act)
        stored[i] = h
        return h

    if "feat" in cache:
        feat, hv = cache["feat"], cache["hv"]
    else:
        # Recompute feat (fa slice) and hv from the last trunk activation —
        # cheaper in VMEM than caching two [B, W] arrays across the composite.
        fa = _mm(stored[D - 1], fa_w) + cache["fa_b"]
        feat = fa[:, :W].astype(cdt)
        hv = _act_fwd(_mm(feat, w_vf) + _mm(vemb, w_vv) + cache["b_v"], act).astype(cdt)

    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb32 = jnp.where(lane < 3, g, 0.0)
    g_rgb = g_rgb32.astype(cdt)
    dalpha = jnp.where(lane == 3, g, 0.0)

    dhv = _mmt(g_rgb, w_rgb) * _act_grad(hv, act)
    dW_rgb = _tmm(hv, g_rgb)
    db_rgb = jnp.sum(g_rgb32, axis=0, keepdims=True)
    dhv_c = dhv.astype(cdt)

    dfeat = _mmt(dhv_c, w_vf)
    dW_vf = _tmm(feat, dhv_c)
    dW_vv = _tmm(vemb, dhv_c)
    db_v = jnp.sum(dhv, axis=0, keepdims=True)

    dfa = jnp.concatenate([dfeat, jnp.zeros_like(dalpha)], axis=1)
    fa_lane = jax.lax.broadcasted_iota(jnp.int32, dfa.shape, 1)
    dalpha_col = jnp.sum(dalpha, axis=1, keepdims=True)
    dfa = jnp.where(fa_lane == W, dalpha_col, dfa).astype(cdt)
    dh = _mmt(dfa, fa_w)
    dW_fa = _tmm(stored[D - 1], dfa)
    db_fa = jnp.sum(dfa.astype(jnp.float32), axis=0, keepdims=True)

    trunk_grads = []
    demb = None
    h_i = stored[D - 1]
    for i in range(D - 1, -1, -1):
        # Walking downward, layer i's input is layer i-1's output — compute
        # it once here and carry it as the next iteration's h_i.
        h_prev = h_at(i - 1) if i > 0 else None
        dz = (dh * _act_grad(h_i, act)).astype(cdt)
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        if i == skip + 1:
            w_top, w_bot, _ = ws[i]
            trunk_grads.append((_tmm(emb, dz), _tmm(h_prev, dz), db))
            dh = _mmt(dz, w_bot)
            if input_grads:
                demb = _mmt(dz, w_top)
        else:
            w = ws[i][0]
            x = emb if i == 0 else h_prev
            trunk_grads.append((_tmm(x, dz), db))
            if i != 0:
                dh = _mmt(dz, w)
            elif input_grads:
                d0 = _mmt(dz, w)
                demb = d0 if demb is None else demb + d0
        h_i = h_prev

    grads = []
    for i in range(D):
        grads.extend(trunk_grads[D - 1 - i])
    grads += [dW_fa, db_fa, dW_vf, dW_vv, db_v, dW_rgb, db_rgb]
    return grads, demb


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _render_loss_kernel(
    *args,
    D: int, skip: int, W: int, S: int, white_bkgd: bool, loss_scale: float,
    rev: int, encode: bool, remat: bool, act: str, rgb_relu: bool,
    from_rays: bool = False, input_grads: bool = False,
    param_grads: bool = True, ext_ct: bool = False, store_stride: int = 2,
):
    """One tile = R whole rays x S samples. Leading refs are either
    (emb, vemb, aux, tgt) or, with ``from_rays``, (o8, d8, vemb, aux, tgt);
    then, with ``ext_ct``, gct [R, 128]; then weights..., grad-accums...,
    perray_out [R, 128], weights_out [B, 128(lane 0)].

    ``ext_ct``: the reverse sweep's per-ray cotangent comes from the gct
    input (lanes 0-2 = d loss/d rgb_map AFTER white compositing, 3 =
    d/d acc_map, 4 = d/d depth_map) instead of the in-kernel MSE — the
    differentiable-outputs mode backing losses the kernel can't express
    (e.g. MultiRes' pyramid-reconstruction term). tgt is ignored.

    vemb_ref is PER-RAY [R, 128] (viewdirs are constant along a ray) and is
    broadcast to rows in-kernel via the segment matmul — feeding the
    broadcast [B, 128] from HBM would cost S x the bandwidth and VMEM.
    With ``from_rays`` the positions themselves never touch HBM either:
    o8/d8 are PER-RAY [R, 8] (origin xyz + frame-time lane 3 / direction
    xyz) and pts = o + d*z is computed in-kernel from the aux z lane —
    the [B, 8] raw-points stream and its XLA producer disappear.
    aux lanes: 0 = dist*|d| (last = 1e10), 1 = density noise, 2 = z.
    tgt lanes 0-2: per-ray target rgb.
    perray_out lanes: 0-2 rgb_map (white-composited), 3 acc, 4 depth,
    5 sqerr."""
    if from_rays:
        o8_ref, d8_ref, vemb_ref, aux_ref, tgt_ref = args[:5]
        refs = args[5:]
        emb_ref = None
    else:
        emb_ref, vemb_ref, aux_ref, tgt_ref = args[:4]
        refs = args[4:]
    gct_ref = None
    if ext_ct:
        gct_ref, refs = refs[0], refs[1:]
    n_c = 4 if encode else 0  # fourier-encoder consts (E0, S, PHASE, MASK)
    crefs, refs = refs[:n_c], refs[n_c:]
    n_out = 3 if input_grads else 2
    n_w = (len(refs) - n_out) // 2 if param_grads else len(refs) - n_out
    wrefs = refs[:n_w]
    grefs = refs[n_w:-n_out] if param_grads else ()
    base = n_w * 2 if param_grads else n_w
    perray_ref, wout_ref = refs[base], refs[base + 1]
    dxout_ref = refs[base + 2] if input_grads else None
    cdt = wrefs[0].dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    aux = aux_ref[:]
    dist = aux[:, 0:1]
    noise = aux[:, 1:2]
    z = aux[:, 2:3]
    B = aux.shape[0]
    R = B // S
    RP = R * rev  # per-ray block rows (>= 8); rev > 1 => revisited block
    col_off = R * (pl.program_id(0) % rev) if rev > 1 else 0
    seg = _segment_matrix(B, S, R, RP, col_off)

    if from_rays:
        # pts = o + d*z, f32, bit-identical to the XLA producer it replaces
        # (seg broadcast is an exact 0/1 matmul; lane 3 carries t, d8 lane
        # 3 is 0 so t is z-invariant).
        x8 = _mm(seg, o8_ref[:]) + _mm(seg, d8_ref[:]) * z
        emb = _embed_fwd(
            x8, crefs[0][:], crefs[1][:], crefs[2][:], crefs[3][:]
        ).astype(cdt)
    elif encode:
        # Positions arrive raw [B, 8] (xyz in lanes 0-2); the fourier
        # encoding runs in-kernel (matmul + phase-shifted sin) — feeding
        # pre-embedded [B, 128] rows from HBM costs 16x the bandwidth.
        x8 = emb_ref[:]
        emb = _embed_fwd(
            x8, crefs[0][:], crefs[1][:], crefs[2][:], crefs[3][:]
        ).astype(cdt)
    else:
        assert not input_grads, "input grads need the in-kernel encode"
        emb = emb_ref[:].astype(cdt)
    vemb = _mm(seg, vemb_ref[:]).astype(cdt)

    nxt = _ref_iter(wrefs)
    rgb_logits, sigma_raw, cache = _trunk_fwd_keep(
        emb, vemb, nxt, D, skip, W, remat=remat, act=act,
        store_stride=store_stride, store=param_grads,
    )

    # ---- composite forward (raw2outputs, ray.py:155-198) ----
    sigma = sigma_raw + noise
    relu_sig = jnp.maximum(sigma, 0.0)
    alpha = 1.0 - jnp.exp(-relu_sig * dist)  # [B,1]
    # The max() floor guards against the compiler reassociating
    # (1 - alpha) + EPS into (1 + EPS) - alpha (observed inside the fused
    # kernel), which folds the stabilizer away and yields log(0) = -inf at
    # alpha == 1; at that point max() is bit-equal to the reference's
    # 1 - alpha + 1e-10 (ray.py:188).
    safe = jnp.maximum(1.0 - alpha + EPS, EPS)
    logs = jnp.log(safe)
    trans = jnp.exp(_seg_prefix_sum_excl(logs, S))
    w = alpha * trans  # weights [B,1]

    lane = jax.lax.broadcasted_iota(jnp.int32, rgb_logits.shape, 1)
    # Kept live into the backward (drgb, dldw) — compute dtype is enough;
    # mixed f32/cdt arithmetic below promotes to f32.
    if rgb_relu:
        # T-NeRF's in-model ReLU color head (model.py:183-186) feeds the
        # compositor's sigmoid; the mask is recoverable as rgb > 0.5.
        rgb_logits = jnp.maximum(rgb_logits, 0.0)
    rgb = jax.nn.sigmoid(rgb_logits).astype(cdt)
    vals = jnp.where(
        lane < 3, w * rgb, jnp.where(lane == 3, w, jnp.where(lane == 4, w * z, 0.0))
    )
    perray = _tmm(seg, vals)  # [R, 128]: 0-2 sum w*rgb, 3 acc, 4 depth

    plane = jax.lax.broadcasted_iota(jnp.int32, perray.shape, 1)
    acc_col = perray[:, 3:4]
    if white_bkgd:
        perray = jnp.where(plane < 3, perray + (1.0 - acc_col), perray)
    tgt = tgt_ref[:]
    valid = tgt[:, 3:4]  # 1.0 for real rays, 0.0 for ray-count padding
    if rev > 1:
        # Only this step's R-row slice of the (8,128) per-ray block is
        # live; rows of the other visits see the other rays' targets with
        # zero perray — mask them out of the error/cotangent entirely.
        prow = jax.lax.broadcasted_iota(jnp.int32, perray.shape, 0)
        valid = valid * jnp.where(
            (prow[:, :1] >= col_off) & (prow[:, :1] < col_off + R), 1.0, 0.0
        )
    err = jnp.where(plane < 3, (perray - tgt) * valid, 0.0)
    sqerr_col = jnp.sum(err * err, axis=1, keepdims=True)
    perray = jnp.where(plane == 5, sqerr_col, perray)
    if rev > 1:
        live = (prow >= col_off) & (prow < col_off + R)
        perray_ref[:] = jnp.where(live, perray, perray_ref[:])
    else:
        perray_ref[:] = perray
    wout_ref[:] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1) == 0, w, 0.0
    )

    if not param_grads:
        # Forward-only mode (e.g. the shared-model D-NeRF coarse pass whose
        # loss term is never used, or eval rendering): skip the whole
        # reverse sweep — the autodiff paths get this for free via DCE.
        return

    # ---- loss + composite backward ----
    if ext_ct:
        # External per-ray cotangent (lanes 0-2 rgb_map, 3 acc_map,
        # 4 depth_map). Rows outside this visit's R-slice are selected away
        # by the segment matmul, so no live-row masking is needed; padded
        # rays carry zero cotangent from the host.
        gct = gct_ref[:]
        g_perray = jnp.where(plane < 3, gct, 0.0)
        if white_bkgd:
            # rgb_map includes +(1-acc): d/d acc += -sum_c g_rgb_c
            g_acc = gct[:, 3:4] - jnp.sum(g_perray, axis=1, keepdims=True)
        else:
            g_acc = gct[:, 3:4]
        g_depth = gct[:, 4:5]
    else:
        # d loss/d rgb_map = loss_scale * 2 * err (sqerr is channel-summed)
        g_perray = loss_scale * 2.0 * err  # [R, 128] lanes 0-2
        if white_bkgd:
            # rgb_map includes +(1-acc): d/d acc = -sum_c g_rgb_c
            g_acc = -jnp.sum(g_perray, axis=1, keepdims=True)
        else:
            g_acc = jnp.zeros_like(acc_col)
        g_depth = jnp.zeros_like(acc_col)
    g_packed = jnp.where(
        plane < 3, g_perray,
        jnp.where(plane == 3, g_acc, jnp.where(plane == 4, g_depth, 0.0)),
    )
    g_row = _mm(seg, g_packed)  # [B, 128] broadcast to rows

    # dL/dw_b = sum_c g_rgb_c*rgb_c + g_acc + g_depth*z_b
    dldw_terms = jnp.where(
        lane < 3, g_row * rgb,
        jnp.where(lane == 3, g_row, jnp.where(lane == 4, g_row * z, 0.0)),
    )
    dldw = jnp.sum(dldw_terms, axis=1, keepdims=True)  # [B,1]

    # d rgb_logits (lanes 0-2): w * g_rgb * sigmoid' (* relu' for T-NeRF)
    drgb = jnp.where(lane < 3, w * g_row * rgb * (1.0 - rgb), 0.0)
    if rgb_relu:
        drgb = drgb * (rgb.astype(jnp.float32) > 0.5).astype(jnp.float32)

    # d alpha: dldw*T - suffix_{c>b}(dldw_c w_c) / safe_b
    suff = _seg_suffix_sum_excl(dldw * w, S)
    dalpha = dldw * trans - suff / safe
    dsigma = dalpha * dist * jnp.exp(-relu_sig * dist) * (sigma > 0.0).astype(jnp.float32)

    g_raw = drgb + jnp.where(lane == 3, dsigma, 0.0)

    grads, demb = _trunk_reverse(emb, vemb, g_raw, cache, D, skip, W, act=act,
                                 input_grads=input_grads)
    for r, gval in zip(grefs, grads):
        r[:] += gval.astype(r.dtype)

    if input_grads:
        # Chain the emb cotangent through the in-kernel fourier encode:
        # d loss / d x8 (lanes 0-2 position, lane 3 time). Padded rays have
        # zero loss cotangent, so their rows are exactly zero.
        dxout_ref[:] = _embed_bwd(
            x8, demb.astype(jnp.float32),
            crefs[0][:], crefs[1][:], crefs[2][:], crefs[3][:]
        )


# ---------------------------------------------------------------------------
# Host-side op
# ---------------------------------------------------------------------------


def _const_specs(arrs):
    return [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for a in arrs]


def _rows_spec(rows, lanes=128):
    return pl.BlockSpec((rows, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _rays_spec(rays, lanes=128):
    return pl.BlockSpec((rays, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)


def fused_render_pass(
    params,
    cfg,
    pts_emb: jnp.ndarray,
    views_emb: jnp.ndarray,
    z_vals: jnp.ndarray,
    dists_scaled: jnp.ndarray,
    noise: jnp.ndarray,
    target: jnp.ndarray,
    white_bkgd: bool,
    loss_scale: float,
    rays_per_tile: int = 8,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    pts: jnp.ndarray = None,
    remat: bool = True,
    times: jnp.ndarray = None,
    arch: str = "vanilla",
    origins: jnp.ndarray = None,
    directions: jnp.ndarray = None,
    need_input_grads: bool = False,
    need_param_grads: bool = True,
    perray_ct: jnp.ndarray = None,
    store_stride: int = None,
    vmem_mb: int = None,
):
    """Fused trunk+composite+loss+backward for one render pass.

    ``perray_ct`` [N, 5] switches the reverse sweep to an EXTERNAL per-ray
    cotangent (d loss/d rgb_map lanes 0-2, d/d acc_map lane 3, d/d
    depth_map lane 4) instead of the in-kernel MSE — the backward half of
    the differentiable-outputs mode (losses the kernel can't express, e.g.
    MultiRes' pyramid-reconstruction term). target/loss_scale are ignored
    and the returned sqerr is meaningless in this mode.

    Args:
      pts_emb [N, S, in_ch] pre-embedded positions, OR pts [N, S, 3] raw
        positions (pts_emb=None) to run the fourier encoding in-kernel —
        the preferred TPU path: 16x less HBM input traffic;
      views_emb [N, in_ch_views] PER RAY (broadcast
        over samples happens in-kernel), z_vals [N, S], dists_scaled [N, S]
        (deltas * |d|, last entry 1e10 * |d|), noise [N, S] (pre-activation
        density noise, zeros if none), target [N, 3], loss_scale =
        d loss / d sqerr_r (e.g. 1/(3N) for the mse mean).

    Returns:
      (outs, grads): outs dict with rgb (white-composited), acc, depth,
      weights [N, S], sqerr [N]; grads — the param-pytree cotangent of
      ``loss_scale * sum(sqerr)`` (computed in-kernel, not via jax.grad).
    """
    N, S = z_vals.shape
    R = rays_per_tile
    assert R in (1, 2, 4) or R % 8 == 0, R  # per-ray blocks tile in 8s
    Np = _round_up(N, max(R, 8))
    B = R * S

    def pad_rays(x):
        if x.shape[0] == Np:
            return x
        pad = Np - N
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)

    assert views_emb.ndim == 2, "views_emb is per-ray [N, in_ch_views]"
    vemb = pad_rays(views_emb)
    P = Np * S

    def embed_consts():
        # nf == -1 (identity embedder, multires level 3) is numerically
        # nf == 0: identity columns only (ops/embedding.py:45-48).
        nfp = max(cfg.nf_pts, 0)
        if times is not None:
            # Time-conditioned field: per-ray frame time rides lane 3; the
            # combined constants emit [embed(xyz) | embed(t)] in one
            # matmul+sin.
            return tuple(
                jnp.asarray(c)
                for c in build_embed_consts_xt(nfp, max(cfg.nf_time, 0))
            )
        return tuple(jnp.asarray(c) for c in build_embed_consts(nfp, 3))

    from_rays = origins is not None
    if from_rays:
        # Preferred TPU path: only PER-RAY [Np, 8] origin/direction blocks
        # enter the kernel; pts = o + d*z is computed in-kernel from the
        # aux z lane (the [P, 8] raw-points stream never exists).
        assert pts is None and pts_emb is None
        o8 = jnp.zeros((Np, 8), jnp.float32).at[:, :3].set(pad_rays(origins))
        d8 = jnp.zeros((Np, 8), jnp.float32).at[:, :3].set(pad_rays(directions))
        if times is not None:
            o8 = o8.at[:, 3].set(pad_rays(times.reshape(-1, 1))[:, 0])
        emb_in = (o8, d8)
        consts = embed_consts()
    elif pts is not None:
        assert pts_emb is None
        x = pad_rays(pts).reshape(P, 3)
        emb_p = jnp.zeros((P, 8), jnp.float32).at[:, :3].set(x)
        if times is not None:
            t = jnp.broadcast_to(times.reshape(-1, 1), (times.shape[0], S))
            emb_p = emb_p.at[:, 3].set(pad_rays(t).reshape(P))
        emb_in = (emb_p,)
        consts = embed_consts()
    else:
        emb = pad_rays(pts_emb).reshape(P, -1)
        emb_p = jnp.zeros((P, 128), compute_dtype).at[:, : emb.shape[-1]].set(
            emb.astype(compute_dtype)
        )
        emb_in = (emb_p,)
        consts = ()
    vemb_p = jnp.zeros((Np, 128), jnp.float32).at[:, : vemb.shape[-1]].set(
        vemb.astype(jnp.float32)
    )
    # Column-concat, NOT stack->pad: stacking three [P] vectors then
    # padding into [P, 8] makes XLA materialize a layout-changing copy +
    # select + pad (~0.6 ms/step at lego shapes, the profiler-visible glue
    # of benchmarks/tpu_profile_step.py); the [P, 1]-column concatenate
    # lowers to one fused write and measures +3.6% on the vanilla step
    # (30.77M vs 29.70M, benchmarks A/B in PERFORMANCE.md).
    aux_p = jnp.concatenate(
        [
            pad_rays(dists_scaled).reshape(P, 1).astype(jnp.float32),
            pad_rays(noise).reshape(P, 1).astype(jnp.float32),
            pad_rays(z_vals).reshape(P, 1).astype(jnp.float32),
            jnp.zeros((P, 5), jnp.float32),
        ],
        axis=1,
    )
    tgt_p = (
        jnp.zeros((Np, 128), jnp.float32)
        .at[:N, :3].set(target)
        .at[:N, 3].set(1.0)
    )

    if arch == "tnerf":
        from swnerf_tpu.ops.pallas.raymarch import pack_tnerf_params

        flat, meta = pack_tnerf_params(params, cfg, dtype=compute_dtype)
    else:
        flat, meta = pack_params(params, cfg, dtype=compute_dtype)
    if need_input_grads:
        assert len(consts) > 0, "input grads need the in-kernel encode"
        assert need_param_grads, "input grads ride the reverse sweep"
    if perray_ct is not None:
        assert need_param_grads, "external cotangent drives the reverse sweep"
        gct_p = jnp.zeros((Np, 128), jnp.float32).at[:N, :5].set(
            perray_ct.astype(jnp.float32)
        )
    else:
        gct_p = None
    import os

    if store_stride is None:
        store_stride = int(os.environ.get("SWNERF_FUSED_STRIDE", "2"))
    if vmem_mb is None:
        vmem_mb = int(os.environ.get("SWNERF_FUSED_VMEM_MB", "100"))
    outs = _render_pass_call(
        tuple(flat), consts, emb_in, vemb_p, aux_p, tgt_p, gct_p,
        meta["D"], meta["skip"], meta["W"], S, R, bool(white_bkgd),
        float(loss_scale), interpret, bool(remat),
        meta.get("act", "relu"), bool(meta.get("rgb_relu", False)),
        from_rays, bool(need_input_grads), bool(need_param_grads),
        int(store_stride), vmem_mb,
    )
    n_out = 3 if need_input_grads else 2
    perray, wout = outs[len(outs) - n_out], outs[len(outs) - n_out + 1]
    dflat = outs[: len(outs) - n_out]
    if need_param_grads:
        unpack = unpack_tnerf_grads if arch == "tnerf" else unpack_grads
        grads = unpack(list(dflat), params, cfg)
    else:
        grads = None
    res = {
        "rgb": perray[:N, :3],
        "acc": perray[:N, 3],
        "depth": perray[:N, 4],
        "sqerr": perray[:N, 5],
        "weights": wout[:, 0].reshape(Np, S)[:N],
    }
    if need_input_grads:
        # d loss / d x8 per sample: lanes 0-2 position, lane 3 time.
        res["dx8"] = outs[-1].reshape(Np, S, 8)[:N]
    return res, grads


@functools.partial(jax.jit,
                   static_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                                   18, 19, 20, 21, 22))
def _render_pass_call(flat, consts, emb_in, vemb_p, aux_p, tgt_p, gct_p, D,
                      skip, W, S, R, white_bkgd, loss_scale, interpret,
                      remat=True, act="relu", rgb_relu=False, from_rays=False,
                      input_grads=False, param_grads=True, store_stride=2,
                      vmem_mb=100):
    encode = len(consts) > 0
    ext_ct = gct_p is not None
    P = aux_p.shape[0]
    B = R * S
    Np = P // S
    n_tiles = P // B
    rev = max(1, 8 // R)
    # Ray tiles < 8 rays: the (8,128) per-ray block is revisited across
    # ``rev`` consecutive grid steps, each handling its R-row slice (Mosaic
    # requires >= 8 sublanes per block; Np is padded to a multiple of 8).
    ray_spec = pl.BlockSpec(
        (max(R, 8), 128), lambda i: (i // rev, 0), memory_space=pltpu.VMEM
    )
    ray8_spec = pl.BlockSpec(
        (max(R, 8), 8), lambda i: (i // rev, 0), memory_space=pltpu.VMEM
    )
    if param_grads:
        out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in flat]
        out_specs = _const_specs(list(flat))
    else:
        out_shapes, out_specs = [], []
    out_shapes.append(jax.ShapeDtypeStruct((Np, 128), jnp.float32))  # perray
    out_specs.append(ray_spec)
    out_shapes.append(jax.ShapeDtypeStruct((P, 8), jnp.float32))  # weights
    out_specs.append(_rows_spec(B, 8))
    if input_grads:
        out_shapes.append(jax.ShapeDtypeStruct((P, 8), jnp.float32))  # dx8
        out_specs.append(_rows_spec(B, 8))

    if from_rays:
        emb_specs = [ray8_spec, ray8_spec]  # per-ray o8 / d8
    else:
        emb_specs = [_rows_spec(B, 8 if encode else 128)]  # raw pts or rows

    ct_in = (gct_p,) if ext_ct else ()
    ct_specs = [ray_spec] if ext_ct else []
    # Mosaic's default VMEM budget is conservative (the round-1/2 "16 MB"
    # wall); the raised cap lets the rc16/rf8 product tiles compile.
    # SWNERF_FUSED_VMEM_MB=0 restores the Mosaic default; an over-ask
    # fails loudly at compile, not silently.
    cparams = None
    if vmem_mb > 0:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)
    outs = pl.pallas_call(
        functools.partial(
            _render_loss_kernel, D=D, skip=skip, W=W, S=S,
            white_bkgd=white_bkgd, loss_scale=loss_scale, rev=rev,
            encode=encode, remat=remat, act=act, rgb_relu=rgb_relu,
            from_rays=from_rays, input_grads=input_grads,
            param_grads=param_grads, ext_ct=ext_ct,
            store_stride=store_stride,
        ),
        out_shape=tuple(out_shapes),
        grid=(n_tiles,),
        in_specs=emb_specs
        + [
            ray_spec,  # per-ray viewdir embedding
            _rows_spec(B, 8),
            ray_spec,
        ]
        + ct_specs
        + _const_specs(list(consts))
        + _const_specs(list(flat)),
        out_specs=tuple(out_specs),
        interpret=interpret,
        **({"compiler_params": cparams} if cparams is not None else {}),
    )(*emb_in, vemb_p, aux_p, tgt_p, *ct_in, *consts, *flat)
    return outs


def unpack_grads(dflat, params, cfg):
    """Invert pack_params for the GRADIENTS: slice the zero-padded regions
    back to each parameter's true shape (pads receive zero cotangent, so
    plain slicing is exact)."""
    D, W = cfg.netdepth, cfg.netwidth
    skip = cfg.skips[0] if cfg.skips else -1
    it = iter(dflat)
    g = {"pts_linears": []}
    for i, lyr in enumerate(params["pts_linears"]):
        if i == skip + 1:
            w_top = next(it)[: cfg.input_ch]
            w_bot = next(it)
            gw = jnp.concatenate([w_top, w_bot], 0)
        elif i == 0:
            gw = next(it)[: lyr["w"].shape[0]]
        else:
            gw = next(it)
        gb = next(it)[0]
        g["pts_linears"].append({"w": gw.astype(jnp.float32), "b": gb})
    fa_w = next(it)
    fa_b = next(it)[0]
    g["feature_linear"] = {"w": fa_w[:, :W].astype(jnp.float32), "b": fa_b[:W]}
    g["alpha_linear"] = {"w": fa_w[:, W : W + 1].astype(jnp.float32), "b": fa_b[W : W + 1]}
    w_vf = next(it)
    w_vv = next(it)[: cfg.input_ch_views]
    b_v = next(it)[0]
    g["views_linears"] = [
        {"w": jnp.concatenate([w_vf, w_vv], 0).astype(jnp.float32), "b": b_v}
    ]
    w_rgb = next(it)[:, :3]
    b_rgb = next(it)[0][:3]
    g["rgb_linear"] = {"w": w_rgb.astype(jnp.float32), "b": b_rgb}
    return g


def unpack_tnerf_grads(dflat, params, cfg):
    """Invert pack_tnerf_params for the gradients (zero-padded regions have
    zero cotangent, so plain slicing is exact). Layout mirrors
    raymarch.pack_tnerf_params."""
    W = cfg.net_dim
    W2 = W // 2
    in0 = cfg.in_feat + cfg.time_feat
    skip = cfg.skip_layer
    it = iter(dflat)
    g = {"layers": []}
    for i, _lyr in enumerate(params["layers"]):
        if i == skip + 1:
            w_top = next(it)[:in0]
            w_bot = next(it)
            gw = jnp.concatenate([w_top, w_bot], 0)
        elif i == 0:
            gw = next(it)[:in0]
        else:
            gw = next(it)
        gb = next(it)[0]
        g["layers"].append({"w": gw.astype(jnp.float32), "b": gb})
    fd_w = next(it)
    fd_b = next(it)[0]
    g["feature"] = {"w": fd_w[:, :W].astype(jnp.float32), "b": fd_b[:W]}
    g["density"] = {"w": fd_w[:, W : W + 1].astype(jnp.float32), "b": fd_b[W : W + 1]}
    vw_f = next(it)
    vw_v = next(it)
    b9 = next(it)[0]
    g["layer_9"] = {
        "w": jnp.concatenate([vw_f[:, :W2], vw_v[: cfg.dir_feat, :W2]], 0).astype(jnp.float32),
        "b": b9[:W2],
    }
    cw = next(it)
    cb = next(it)[0]
    g["color"] = {"w": cw[:W2, :3].astype(jnp.float32), "b": cb[:3]}
    return g
