"""The two-kernel train step: coarse fused render-loss kernel -> Pallas
sample_pdf (+sorted merge; one fused kernel under SWNERF_PDF_MERGE=1) ->
fine fused render-loss kernel -> Adam.

This is the flagship-performance path (vanilla/NeRFOriginal hierarchical
rendering with the plain coarse+fine MSE loss, reference run.py:689-700).
Gradients come from the kernels directly (computed in the same VMEM pass as
the forward — see ops/pallas/render_fused.py), NOT from jax.grad; the RNG
stream, sampling math and loss are bit-compatible with
``make_train_step(make_vanilla_field(...))`` (tested against it).

Not applicable to: extra losses (D-NeRF TV), the deformation field (needs
input gradients), non-MSE objectives — those keep the autodiff path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
from swnerf_tpu.ops.sampling import sample_along_rays, sample_pdf_merge
from swnerf_tpu.render.core import Rays, RenderConfig
from swnerf_tpu.train.loop import TrainState, mse_to_psnr


def supports_fused_step(cfg, fcfg, rcfg: RenderConfig) -> bool:
    """The fused step covers the flagship family: hierarchical coarse+fine
    (or coarse-only) vanilla rendering, fourier embeds, same coarse/fine
    embedding dims (shared encode)."""
    from swnerf_tpu.ops.pallas.raymarch import supports_config

    ok = supports_config(cfg) and cfg.i_embed == 0
    if fcfg is not None:
        ok = ok and supports_config(fcfg) and fcfg.i_embed == 0
        ok = ok and (fcfg.multires, fcfg.multires_views) == (cfg.multires, cfg.multires_views)
    return ok


def default_train_tiles(cfg, fine_cfg) -> tuple:
    """Width-adaptive v5e tile defaults for the fused train step, as
    ``("rc", "rf")`` strings (env-var default form).

    Measured (benchmarks/tpu_tile_sweep.py, benchmarks/tpu_w512_step.py):
    at the production W<=256 the big rc16/rf8 tiles + the raised Mosaic
    VMEM cap win (29.5M vs 29.1M samp/s at rc8/rf4); at W=512 the
    optimum inverts — weight bytes per layer quadruple, the kernel
    becomes weight-residency-dominated, and the small rc4/rf2 tiles win
    (11.14M vs 10.22M at either larger tiling).
    `SWNERF_FUSED_TILE_COARSE`/`_FINE` override either regime."""
    wide = max(cfg.netwidth, fine_cfg.netwidth) > 256
    return ("4", "2") if wide else ("16", "8")


def supports_fused_tnerf_step(cfg, rcfg: RenderConfig) -> bool:
    """The fused T-NeRF step: single time-conditioned pass (the runner
    forces n_importance=0, reference run_tnerf.py:329), fourier embeds."""
    from swnerf_tpu.ops.pallas.raymarch import supports_tnerf

    return supports_tnerf(cfg) and cfg.i_embed == 0 and rcfg.n_importance == 0


def make_fused_tnerf_step(
    cfg,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    rays_per_tile: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    axis_name: Optional[str] = None,
):
    """Single-pass fused T-NeRF train step ``(state, rays, target, rng) ->
    (state, metrics)``: one render-loss kernel (ELU trunk, in-kernel
    [embed(xyz)|embed(t)] encoding, ReLU color head) + Adam. RNG schedule
    and loss match ``make_dnerf_step`` with a T-NeRF field exactly
    (fold_in(step) then the render_rays 4-way split; reference loss
    run_tnerf.py:675-690). ``axis_name`` as in make_fused_train_step."""
    import os

    if rays_per_tile is None:
        rays_per_tile = int(os.environ.get("SWNERF_FUSED_TILE_COARSE", "8"))
    remat = os.environ.get("SWNERF_FUSED_REMAT", "1") != "0"
    # T-NeRF runs ~4% FASTER under Mosaic's default VMEM budget than under
    # the raised global cap that the vanilla rc16/rf8 tiles need (v5e A/B:
    # 652 vs 626 it/s, PERFORMANCE.md round 3) — keep the Mosaic default
    # here unless explicitly overridden.
    vmem_mb = int(os.environ.get("SWNERF_FUSED_VMEM_MB_TNERF", "0"))

    def train_step(state: TrainState, rays: Rays, target, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis_name))
        k_jit, k_noise0, _k_pdf, _k_noise1 = jax.random.split(step_rng, 4)
        n = rays.origins.shape[0]
        scale = 1.0 / (3.0 * n)

        z_vals = sample_along_rays(
            k_jit, rays.near, rays.far, rcfg.n_samples, rcfg.perturb, rcfg.lindisp
        )
        vd_emb = positional_encoding(rays.viewdirs, cfg.nf_views)
        if rcfg.raw_noise_std > 0.0:
            noise = jax.random.normal(k_noise0, z_vals.shape) * rcfg.raw_noise_std
        else:
            noise = jnp.zeros(z_vals.shape)

        outs, grads_c = fused_render_pass(
            state.params["coarse"], cfg, None, vd_emb, z_vals,
            _dists_scaled(z_vals, rays.directions), noise, target,
            rcfg.white_bkgd, scale, rays_per_tile=rays_per_tile,
            interpret=interpret, compute_dtype=compute_dtype,
            origins=rays.origins, directions=rays.directions,
            remat=remat, times=rays.times, arch="tnerf", vmem_mb=vmem_mb,
        )
        mse0 = jnp.sum(outs["sqerr"]) * scale
        if axis_name is not None:
            mse0 = jax.lax.pmean(mse0, axis_name)
        grads = {"coarse": grads_c, "fine": None}
        if axis_name is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)
        metrics = {"loss": mse0, "psnr": mse_to_psnr(mse0), "total_loss": mse0}
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def _dists_scaled(z_vals: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """deltas * |d| with the reference's trailing 1e10 (ray.py:163-167)."""
    d = z_vals[..., 1:] - z_vals[..., :-1]
    d = jnp.concatenate([d, jnp.full_like(d[..., :1], 1e10)], -1)
    return d * jnp.linalg.norm(rays_d[..., None, :], axis=-1)


def make_fused_train_step(
    cfg,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    fcfg=None,
    rays_per_tile_coarse: Optional[int] = None,
    rays_per_tile_fine: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    axis_name: Optional[str] = None,
):
    """Build ``(state, rays, target, rng) -> (state, metrics)`` with in-kernel
    gradients. ``cfg``/``fcfg`` are VanillaNeRFConfig for the coarse/fine
    networks (fcfg None -> coarse net serves the fine pass when
    n_importance > 0 with shared params['fine'] slot = None).

    ``axis_name``: run under ``shard_map`` over a rays mesh — rays/target
    arrive per-shard, grads and loss terms are ``pmean``-reduced over the
    axis before the (replicated) Adam update. Pallas kernels cannot be
    GSPMD-partitioned, so the mesh path for this step is shard_map, unlike
    the autodiff path's jit-with-shardings (parallel/mesh.py). Per-shard
    RNG is folded with the axis index: the noise/jitter streams are
    independent per shard (same distribution as single-device, not the
    same bits)."""
    import os

    fine_cfg = fcfg if fcfg is not None else cfg
    rc_default, rf_default = default_train_tiles(cfg, fine_cfg)
    if rays_per_tile_coarse is None:
        rays_per_tile_coarse = int(
            os.environ.get("SWNERF_FUSED_TILE_COARSE", rc_default))
    if rays_per_tile_fine is None:
        rays_per_tile_fine = int(
            os.environ.get("SWNERF_FUSED_TILE_FINE", rf_default))
    # Full activation cache (remat=0) trades VMEM for ~6 fewer matmuls per
    # tile; viable at small tiles — see PERFORMANCE.md.
    remat = os.environ.get("SWNERF_FUSED_REMAT", "1") != "0"

    def train_step(state: TrainState, rays: Rays, target, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis_name))
        # EXACT render_rays key schedule (render/core.py:99).
        k_jit, k_noise0, k_pdf, k_noise1 = jax.random.split(step_rng, 4)
        n = rays.origins.shape[0]
        scale = 1.0 / (3.0 * n)  # d mse / d sqerr_r (per-shard n; pmean below)

        z_vals = sample_along_rays(
            k_jit, rays.near, rays.far, rcfg.n_samples, rcfg.perturb, rcfg.lindisp
        )
        vd_emb = positional_encoding(rays.viewdirs, cfg.nf_views)

        def noise_for(key, shape):
            if rcfg.raw_noise_std > 0.0:
                return jax.random.normal(key, shape) * rcfg.raw_noise_std
            return jnp.zeros(shape)

        outs_c, grads_c = fused_render_pass(
            state.params["coarse"], cfg, None, vd_emb, z_vals,
            _dists_scaled(z_vals, rays.directions),
            noise_for(k_noise0, z_vals.shape), target,
            rcfg.white_bkgd, scale, rays_per_tile=rays_per_tile_coarse,
            interpret=interpret, compute_dtype=compute_dtype,
            origins=rays.origins, directions=rays.directions, remat=remat,
        )
        mse0 = jnp.sum(outs_c["sqerr"]) * scale

        if rcfg.n_importance > 0:
            # Importance-sample + sorted union; one Pallas kernel under
            # SWNERF_PDF_MERGE=1 (measured neutral — PERFORMANCE.md).
            z_all = sample_pdf_merge(
                z_vals, outs_c["weights"], rcfg.n_importance,
                rng=k_pdf, det=(rcfg.perturb == 0.0),
            )

            fine_params = (
                state.params["fine"] if state.params.get("fine") is not None
                else state.params["coarse"]
            )
            outs_f, grads_f = fused_render_pass(
                fine_params, fine_cfg, None, vd_emb, z_all,
                _dists_scaled(z_all, rays.directions),
                noise_for(k_noise1, z_all.shape), target,
                rcfg.white_bkgd, scale, rays_per_tile=rays_per_tile_fine,
                interpret=interpret, compute_dtype=compute_dtype,
                origins=rays.origins, directions=rays.directions, remat=remat,
            )
            mse1 = jnp.sum(outs_f["sqerr"]) * scale
            if axis_name is not None:
                mse0 = jax.lax.pmean(mse0, axis_name)
                mse1 = jax.lax.pmean(mse1, axis_name)
            loss = mse1 + mse0
            if state.params.get("fine") is not None:
                grads = {"coarse": grads_c, "fine": grads_f}
            else:
                grads = {
                    "coarse": jax.tree.map(jnp.add, grads_c, grads_f),
                    "fine": None,
                }
            metrics = {
                "loss": mse1,
                "psnr": mse_to_psnr(mse1),
                "psnr0": mse_to_psnr(mse0),
                "total_loss": loss,
            }
        else:
            if axis_name is not None:
                mse0 = jax.lax.pmean(mse0, axis_name)
            loss = mse0
            grads = {"coarse": grads_c, "fine": None}
            metrics = {"loss": mse0, "psnr": mse_to_psnr(mse0), "total_loss": loss}

        if axis_name is not None:
            # Per-shard grads are d(local mse)/dθ with local 1/(3n) scaling;
            # the global-batch gradient is their mean over the axis.
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)

        # params["fine"] may be a None leaf — optax sees the same treedef as
        # params, so mirror it in grads (handled above).
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


# ---------------------------------------------------------------------------
# Differentiable fused render outputs (external-cotangent backward)
# ---------------------------------------------------------------------------


def make_render_outputs(ccfg, white_bkgd: bool, tile: int = 8,
                        interpret: bool = False,
                        compute_dtype=jnp.bfloat16, remat: bool = True):
    """A render pass as a differentiable function of (params, positions):

        (params_canon, pts, vd_emb, z, dists, noise)
            -> dict(rgb, acc, depth, weights)

    Forward: ONE forward-only fused kernel (composite in-kernel). Backward:
    ONE external-cotangent kernel (ops/pallas/render_fused.py ``perray_ct``)
    that recomputes the forward in-VMEM and reverses with the caller's
    d loss/d {rgb, acc, depth} — the mode for objectives the kernel cannot
    express in-kernel (MultiRes' pyramid-reconstruction MSE, or any custom
    loss on the rendered maps). ``weights`` is zero-tangent (consumers
    detach it for importance sampling, reference run.py:398), as are
    vd_emb/z/dists/noise (non-trainable inputs)."""

    @jax.custom_vjp
    def render_out(params_canon, pts, vd_emb, z, dists, noise):
        res, _ = fused_render_pass(
            params_canon, ccfg, None, vd_emb, z, dists, noise,
            jnp.zeros((z.shape[0], 3)), white_bkgd, 0.0, rays_per_tile=tile,
            interpret=interpret, compute_dtype=compute_dtype, pts=pts,
            remat=remat, need_param_grads=False,
        )
        return {k: res[k] for k in ("rgb", "acc", "depth", "weights")}

    def fwd(params_canon, pts, vd_emb, z, dists, noise):
        return (
            render_out(params_canon, pts, vd_emb, z, dists, noise),
            (params_canon, pts, vd_emb, z, dists, noise),
        )

    def bwd(resid, ct):
        params_canon, pts, vd_emb, z, dists, noise = resid
        perray_ct = jnp.concatenate(
            [ct["rgb"], ct["acc"][:, None], ct["depth"][:, None]], -1
        )
        res, grads = fused_render_pass(
            params_canon, ccfg, None, vd_emb, z, dists, noise,
            jnp.zeros((z.shape[0], 3)), white_bkgd, 0.0, rays_per_tile=tile,
            interpret=interpret, compute_dtype=compute_dtype, pts=pts,
            remat=remat, need_input_grads=True, need_param_grads=True,
            perray_ct=perray_ct,
        )
        return (
            grads,
            res["dx8"][..., :3],
            jnp.zeros_like(vd_emb),
            jnp.zeros_like(z),
            jnp.zeros_like(dists),
            jnp.zeros_like(noise),
        )

    render_out.defvjp(fwd, bwd)
    return render_out


# ---------------------------------------------------------------------------
# D-NeRF: fused canonical passes composed under jax.grad
# ---------------------------------------------------------------------------


def supports_fused_dnerf_step(cfg, fcfg, rcfg: RenderConfig) -> bool:
    """The fused D-NeRF step: DirectTemporalNeRF (canonical trunk in the
    vanilla shape family + supported deformation MLP), fourier embeds."""
    from swnerf_tpu.ops.pallas.raymarch import supports_config, supports_time_net

    def one(c):
        return supports_config(c) and supports_time_net(c) and c.i_embed == 0

    ok = one(cfg)
    if fcfg is not None:
        ok = ok and one(fcfg) and (
            (fcfg.multires, fcfg.multires_views, fcfg.multires_time)
            == (cfg.multires, cfg.multires_views, cfg.multires_time)
        )
    return ok


def make_fused_dnerf_step(
    cfg,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    fcfg=None,
    add_tv_loss: bool = False,
    tv_loss_weight: float = 0.0,
    rays_per_tile_coarse: Optional[int] = None,
    rays_per_tile_fine: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    axis_name: Optional[str] = None,
):
    """Fused D-NeRF train step ``(state, rays, target, neighbor_time, rng)
    -> (state, metrics)``.

    Each canonical render pass is ONE Pallas kernel (in-kernel encode of the
    deformed positions, trunk, composite, MSE, backward INCLUDING
    d loss / d positions chained back through the fourier encode) wrapped in
    a ``jax.custom_vjp``; ``jax.grad`` then composes the whole loss — the
    deformation MLP (its own fused kernel), the zero_canonical mask, the
    ``pts + dx`` warp, the hierarchical resample and the TV term — exactly
    as the autodiff path does (reference run_dnerf.py:354-480, 690-727).
    The TV neighbor render evaluates only the deformation net: the
    reference's neighbor render computes a full canonical pass whose output
    is discarded (run_dnerf.py:702-725) — dropping it is mathematically
    identical and saves a kernel.

    ``axis_name``: as in make_fused_train_step. MSE terms are per-shard
    means (grads pmean-reduce exactly); the TV term is a global SUM
    (reference semantics), so its local piece is pre-scaled by the axis
    size, which makes the single pmean over combined grads exact for both.
    """
    import os

    from swnerf_tpu.models.dnerf import apply_time_net
    from swnerf_tpu.ops.embedding import embedding_dim
    from swnerf_tpu.ops.pallas.raymarch import fused_time_net

    if rays_per_tile_coarse is None:
        rays_per_tile_coarse = int(os.environ.get("SWNERF_FUSED_TILE_COARSE", "8"))
    if rays_per_tile_fine is None:
        # R=4 now compiles (round-3: the 16M "budget" was Mosaic's default
        # cap) and measures fastest; R>=8 regresses (tpu_tile_sweep.py).
        rays_per_tile_fine = int(os.environ.get("SWNERF_FUSED_TILE_FINE_DNERF", "4"))
    remat = os.environ.get("SWNERF_FUSED_REMAT", "1") != "0"
    fine_cfg = fcfg if fcfg is not None else cfg

    def make_pass(ccfg, tile, grads_on: bool = True):
        """Canonical render pass as a differentiable (params, pts2) ->
        (loss, aux) function; the kernel computes both param and position
        grads in-pass. ``grads_on=False`` runs the kernel forward-only (the
        shared-model coarse pass contributes no loss term, so its grads are
        identically zero — skipping the reverse sweep mirrors the DCE the
        autodiff path gets)."""

        def run(params_canon, pts2, vd_emb, z, dists, noise, target):
            n = z.shape[0]
            scale = 1.0 / (3.0 * n)
            res, grads = fused_render_pass(
                params_canon, ccfg, None, vd_emb, z, dists, noise, target,
                rcfg.white_bkgd, scale, rays_per_tile=tile,
                interpret=interpret, compute_dtype=compute_dtype,
                pts=pts2, remat=remat, need_input_grads=grads_on,
                need_param_grads=grads_on,
            )
            loss = jnp.sum(res["sqerr"]) * scale
            aux = {k: res[k] for k in ("rgb", "acc", "depth", "weights")}
            return loss, aux, grads, res["dx8"][..., :3] if grads_on else None

        @jax.custom_vjp
        def pass_loss(params_canon, pts2, vd_emb, z, dists, noise, target):
            loss, aux, _, _ = run(params_canon, pts2, vd_emb, z, dists, noise, target)
            return loss, aux

        def fwd(params_canon, pts2, vd_emb, z, dists, noise, target):
            loss, aux, grads, dpts = run(
                params_canon, pts2, vd_emb, z, dists, noise, target
            )
            if not grads_on:
                # Zero-cotangent pass: keep only shapes for the bwd zeros.
                return (loss, aux), (params_canon, jnp.zeros(z.shape + (3,)))
            return (loss, aux), (grads, dpts)

        def bwd(resid, ct):
            # aux outputs are consumed only behind stop_gradient (weights ->
            # sample_pdf) or for metrics, so only the loss cotangent acts.
            grads, dpts = resid
            ctl = ct[0] if grads_on else 0.0
            n, s, _ = dpts.shape
            dv = embedding_dim(ccfg.nf_views, 3)
            z_ns = jnp.zeros((n, s))
            return (
                jax.tree.map(lambda g: g * ctl, grads),
                dpts * ctl,
                jnp.zeros((n, dv)),
                z_ns,
                z_ns,
                z_ns,
                jnp.zeros((n, 3)),
            )

        pass_loss.defvjp(fwd, bwd)
        return pass_loss

    # Shared-model fine: the coarse pass contributes no loss term, so its
    # position gradients are identically zero — don't ask the kernel for
    # them (saves the demb sweep + the dx8 stream and its VMEM).
    coarse_in_loss = rcfg.n_importance == 0 or rcfg.coarse_contributes
    pass_coarse = make_pass(cfg, rays_per_tile_coarse, grads_on=coarse_in_loss)
    pass_fine = (
        make_pass(fine_cfg, rays_per_tile_fine, grads_on=True)
        if rcfg.n_importance > 0 else None
    )

    def dx_at(tp, ccfg, pts, tval):
        """Deformation dx at pts for per-ray time tval [N, 1] (differentiable
        in tp; positions/time enter detached as in the field)."""
        tb = jnp.broadcast_to(tval[..., None, :], pts.shape[:-1] + (1,))
        pe = positional_encoding(pts, ccfg.nf_pts)
        te = positional_encoding(tb, ccfg.nf_time)
        if interpret:
            dx = apply_time_net(tp, ccfg, pe, te)
        else:
            # XLA-side encode measured FASTER than the in-kernel variant
            # (fused_time_net_pts): the backward kernel re-runs the encode
            # per 512-row block, which costs more than the [P, L] stream
            # saves (PERFORMANCE.md round-3 decomposition).
            dx = fused_time_net(
                tp, ccfg,
                jax.lax.stop_gradient(pe), jax.lax.stop_gradient(te),
                compute_dtype=compute_dtype, need_input_grads=False,
            )
        if ccfg.zero_canonical:
            dx = jnp.where(tb == 0.0, jnp.zeros_like(dx), dx)
        return dx

    def dx_pair(tp, ccfg, pts, tval, tval_n):
        """dx at two times for the SAME points in ONE deformation-net call
        (2x batch: one kernel dispatch and one backward for both the main
        and the TV-neighbor evaluation)."""
        tb = jnp.broadcast_to(tval[..., None, :], pts.shape[:-1] + (1,))
        tb_n = jnp.broadcast_to(tval_n[..., None, :], pts.shape[:-1] + (1,))
        pe = positional_encoding(pts, ccfg.nf_pts)
        te = positional_encoding(jnp.concatenate([tb, tb_n], 0), ccfg.nf_time)
        pe2 = jnp.concatenate([pe, pe], 0)
        if interpret:
            dx2 = apply_time_net(tp, ccfg, pe2, te)
        else:
            dx2 = fused_time_net(
                tp, ccfg,
                jax.lax.stop_gradient(pe2), jax.lax.stop_gradient(te),
                compute_dtype=compute_dtype, need_input_grads=False,
            )
        if ccfg.zero_canonical:
            dx2 = jnp.where(jnp.concatenate([tb, tb_n], 0) == 0.0,
                            jnp.zeros_like(dx2), dx2)
        n = pts.shape[0]
        return dx2[:n], dx2[n:]

    def train_step(state: TrainState, rays: Rays, target, neighbor_time, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis_name))
        k_jit, k_noise0, k_pdf, k_noise1 = jax.random.split(step_rng, 4)
        n = rays.origins.shape[0]
        nshards = (
            jax.lax.psum(jnp.ones(()), axis_name) if axis_name is not None else 1.0
        )

        z_vals = sample_along_rays(
            k_jit, rays.near, rays.far, rcfg.n_samples, rcfg.perturb, rcfg.lindisp
        )
        vd_emb = positional_encoding(rays.viewdirs, cfg.nf_views)
        t_col = rays.times

        def noise_for(key, shape):
            if rcfg.raw_noise_std > 0.0:
                return jax.random.normal(key, shape) * rcfg.raw_noise_std
            return jnp.zeros(shape)

        def pts_of(z):
            return rays.origins[:, None, :] + rays.directions[:, None, :] * z[..., None]

        pts_c = pts_of(z_vals)

        def loss_fn(params):
            pc = params["coarse"]
            shared = params.get("fine") is None
            pf = pc if shared else params["fine"]
            f_ccfg = cfg if shared else fine_cfg

            nt_col = jnp.full((n, 1), neighbor_time, jnp.float32)
            dx_n = None
            if rcfg.n_importance == 0 and add_tv_loss:
                # Coarse-only + TV: main and neighbor dx in one 2x-batch
                # deformation-net call.
                dx_c, dx_n = dx_pair(pc["time_net"], cfg, pts_c, t_col, nt_col)
            else:
                dx_c = dx_at(pc["time_net"], cfg, pts_c, t_col)
            if not coarse_in_loss:
                # Dead gradient chain (loss never uses the coarse term):
                # detach so the deformation net's backward kernel is not
                # even built for this pass.
                dx_c = jax.lax.stop_gradient(dx_c)
            mse0, aux_c = pass_coarse(
                pc["canonical"], pts_c + dx_c, vd_emb, z_vals,
                _dists_scaled(z_vals, rays.directions),
                noise_for(k_noise0, z_vals.shape), target,
            )
            # Shared-model fine (reference default, run_dnerf.py:445-448):
            # the coarse pass only guides importance sampling under
            # stop_gradient and contributes no loss term — mse0 is simply
            # never added, its kernel runs forward-only, and dx_c is
            # detached. Two-model mode (coarse_contributes) trains the
            # coarse net via mse0.
            if rcfg.n_importance > 0:
                z_all = sample_pdf_merge(
                    z_vals, jax.lax.stop_gradient(aux_c["weights"]),
                    rcfg.n_importance, rng=k_pdf, det=(rcfg.perturb == 0.0),
                )
                pts_f = pts_of(z_all)
                if add_tv_loss:
                    dx_f, dx_n = dx_pair(pf["time_net"], f_ccfg, pts_f, t_col, nt_col)
                else:
                    dx_f = dx_at(pf["time_net"], f_ccfg, pts_f, t_col)
                mse1, _aux_f = pass_fine(
                    pf["canonical"], pts_f + dx_f, vd_emb, z_all,
                    _dists_scaled(z_all, rays.directions),
                    noise_for(k_noise1, z_all.shape), target,
                )
                img_loss = mse1
                img_loss0 = mse0 if coarse_in_loss else None
                dx_used = dx_f
            else:
                img_loss, img_loss0 = mse0, None
                dx_used = dx_c

            # Reference loss composition order (run_dnerf.py:688-731):
            # img_loss (+ tv) (+ img_loss0). Under sharding: the MSE terms
            # are per-shard means (grads pmean-reduce to the global-batch
            # mean exactly); the TV term is a global SUM (reference
            # semantics), so its local piece is pre-scaled by the axis size
            # — pmean(mse_k + K*tv_k) = mean(mse) + sum(tv), exact for
            # both, with no collectives inside the grad.
            loss = img_loss
            metrics = {"loss": img_loss}
            if add_tv_loss:
                tv = jnp.sum((dx_used - dx_n) ** 2) * tv_loss_weight
                loss = loss + tv * nshards
                metrics["tv"] = tv * nshards
            if img_loss0 is not None:
                loss = loss + img_loss0
                metrics["loss0"] = img_loss0
            metrics["total_loss"] = loss
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)
            # pmean makes every entry its exact global value: mse terms are
            # equal-shard means; tv was pre-scaled by the axis size.
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        metrics["psnr"] = mse_to_psnr(metrics["loss"])
        if "loss0" in metrics:
            metrics["psnr0"] = mse_to_psnr(metrics.pop("loss0"))
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step
