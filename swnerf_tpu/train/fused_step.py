"""The two-kernel train step: coarse fused render-loss kernel -> Pallas
sample_pdf -> fine fused render-loss kernel -> Adam.

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
from swnerf_tpu.ops.sampling import merge_z_vals, sample_along_rays, sample_pdf
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


def supports_fused_tnerf_step(cfg, rcfg: RenderConfig) -> bool:
    """The fused T-NeRF step: single time-conditioned pass (the runner
    forces n_importance=0, reference run_tnerf.py:329), fourier embeds."""
    from swnerf_tpu.ops.pallas.raymarch import supports_tnerf

    return (
        supports_tnerf(cfg)
        and cfg.i_embed == 0
        and rcfg.n_importance == 0
        and cfg.in_feat + cfg.time_feat + 0 <= 128
    )


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
            remat=remat, times=rays.times, arch="tnerf",
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

    # VMEM-validated v5e defaults (benchmarks/tpu_fused_probe.py): the fine
    # pass (S=192) only fits at small ray tiles.
    if rays_per_tile_coarse is None:
        rays_per_tile_coarse = int(os.environ.get("SWNERF_FUSED_TILE_COARSE", "8"))
    if rays_per_tile_fine is None:
        rays_per_tile_fine = int(os.environ.get("SWNERF_FUSED_TILE_FINE", "4"))
    # Full activation cache (remat=0) trades VMEM for ~6 fewer matmuls per
    # tile; viable at small tiles — see PERFORMANCE.md.
    remat = os.environ.get("SWNERF_FUSED_REMAT", "1") != "0"
    fine_cfg = fcfg if fcfg is not None else cfg

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
            weights = outs_c["weights"]
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(
                z_mid, weights[..., 1:-1], rcfg.n_importance,
                rng=k_pdf, det=(rcfg.perturb == 0.0),
            )
            z_all = merge_z_vals(z_vals, jax.lax.stop_gradient(z_samples))

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
