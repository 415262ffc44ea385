"""Forward-only fused eval rendering.

One Pallas render kernel per pass computes encode + trunk + composite
(rgb/acc/depth/weights in-kernel) with the reverse sweep skipped
(ops/pallas/render_fused.py ``param_grads=False``) — on TPU this replaces
the eval path's field-apply kernel + XLA composite per pass, removing the
[B, 4] raw stream and the composite's HBM round trips. Semantics are the
deterministic eval mode of ``render_rays`` (reference render_kwargs_test,
run.py:302-304): perturb=0 midpoint-free linspace z, no noise, det
``sample_pdf``; disp derives from depth/acc exactly as the compositor does
(ray.py:192, including its 0/0 behavior).

Attached to a Field as ``eval_pass`` (models/vanilla.py) and picked up by
``render_image`` (render/core.py) when rendering single-device.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.sampling import sample_along_rays, sample_pdf_merge
from swnerf_tpu.train.fused_step import _dists_scaled


def _eval_tiles(mcfg=None):
    """Ray tiles for the forward-only eval kernels. Eval-specific knobs
    win; the shared train-tile knobs are honored next (back-compat); the
    defaults differ from the train step's because the forward-only pass
    has no reverse-sweep working set (store=False) and bigger tiles are
    pure matmul-row win up to rc32/rf16 — the measured 400^2-frame
    optimum at the production W<=256 (benchmarks/tpu_eval_tiles.py;
    rc64+ regresses). At W>256 the optimum inverts, same as the train
    step (train/fused_step.py default_train_tiles): weight bytes per
    layer quadruple and the weight-residency-dominated kernel wants the
    small rc8/rf4 tiles (1405.6 vs 1541.5 ms/frame at W=512, measured
    benchmarks/tpu_eval_tiles.py 512)."""
    wide = mcfg is not None and getattr(mcfg, "netwidth", 256) > 256
    default_rc, default_rf = (8, 4) if wide else (32, 16)
    rc = int(os.environ.get(
        "SWNERF_FUSED_TILE_EVAL_COARSE",
        os.environ.get("SWNERF_FUSED_TILE_COARSE", str(default_rc))))
    rf = int(os.environ.get(
        "SWNERF_FUSED_TILE_EVAL_FINE",
        os.environ.get("SWNERF_FUSED_TILE_FINE", str(default_rf))))
    return rc, rf


def supports_eval_pass(mcfg, fine_field, eval_pass=None) -> bool:
    """Both passes' architectures must be kernel-supported with matching
    embedding dims (shared in-kernel encode constants). The coarse cfg was
    validated when the eval_pass was attached (models/*.py); the fine
    field is only known at render time. Passes with extra per-arch fine
    requirements (the D-NeRF deformation net) attach a ``fine_check``."""
    from swnerf_tpu.ops.pallas.raymarch import supports_config

    if fine_field is None:
        return True
    fcfg = getattr(fine_field, "cfg", None)
    if fcfg is None:
        return False
    extra = getattr(eval_pass, "fine_check", None)
    if extra is not None and not extra(fcfg):
        return False
    return (
        supports_config(fcfg)
        and fcfg.i_embed == 0
        and (fcfg.multires, fcfg.multires_views)
        == (mcfg.multires, mcfg.multires_views)
    )


def make_vanilla_eval_pass(mcfg, interpret: bool = False,
                           compute_dtype=jnp.bfloat16):
    """(params, fine_params, fine_field, rays, ecfg) ->
    (rgb, disp, acc, depth) via forward-only fused kernels (vanilla /
    NeRFOriginal trunk family, from-rays in-kernel encode)."""
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass

    rc, rf = _eval_tiles(mcfg)

    def run(params, fine_params, fine_field, rays, ecfg):
        n = rays.origins.shape[0]
        vd_emb = positional_encoding(rays.viewdirs, mcfg.nf_views)
        ztgt = jnp.zeros((n, 3))

        def one(p, ccfg, z, tile):
            res, _ = fused_render_pass(
                p, ccfg, None, vd_emb, z,
                _dists_scaled(z, rays.directions), jnp.zeros(z.shape), ztgt,
                ecfg.white_bkgd, 0.0, rays_per_tile=tile,
                interpret=interpret, compute_dtype=compute_dtype,
                origins=rays.origins, directions=rays.directions,
                need_param_grads=False,
            )
            return res

        z_vals = sample_along_rays(
            None, rays.near, rays.far, ecfg.n_samples, 0.0, ecfg.lindisp
        )
        res = one(params, mcfg, z_vals, rc)
        if ecfg.n_importance > 0:
            # det=True: bit-identical to the two-op path (sorted linspace u).
            z_all = sample_pdf_merge(
                z_vals, res["weights"], ecfg.n_importance, rng=None, det=True
            )
            fcfg = mcfg
            if fine_field is not None and getattr(fine_field, "cfg", None) is not None:
                fcfg = fine_field.cfg
            res = one(
                fine_params if fine_params is not None else params,
                fcfg, z_all, rf,
            )
        disp = 1.0 / jnp.maximum(1e-10, res["depth"] / res["acc"])
        return res["rgb"], disp, res["acc"], res["depth"]

    return run


def make_tnerf_eval_pass(mcfg, interpret: bool = False,
                         compute_dtype=jnp.bfloat16):
    """T-NeRF variant: single time-conditioned pass (the runner forces
    n_importance=0); the per-ray frame time rides the kernel's o8 lane 3
    and the combined [embed(xyz)|embed(t)] constants (arch=\"tnerf\")."""
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass

    rc, _ = _eval_tiles(mcfg)

    def run(params, fine_params, fine_field, rays, ecfg):
        del fine_params, fine_field  # single model (run_tnerf.py:329)
        if ecfg.n_importance:
            raise ValueError("the T-NeRF eval pass is single-pass (n_importance=0)")
        n = rays.origins.shape[0]
        vd_emb = positional_encoding(rays.viewdirs, mcfg.nf_views)
        z_vals = sample_along_rays(
            None, rays.near, rays.far, ecfg.n_samples, 0.0, ecfg.lindisp
        )
        res, _ = fused_render_pass(
            params, mcfg, None, vd_emb, z_vals,
            _dists_scaled(z_vals, rays.directions), jnp.zeros(z_vals.shape),
            jnp.zeros((n, 3)), ecfg.white_bkgd, 0.0, rays_per_tile=rc,
            interpret=interpret, compute_dtype=compute_dtype,
            origins=rays.origins, directions=rays.directions,
            times=rays.times, arch="tnerf", need_param_grads=False,
        )
        disp = 1.0 / jnp.maximum(1e-10, res["depth"] / res["acc"])
        return res["rgb"], disp, res["acc"], res["depth"]

    run.supports_times = True
    return run


def make_dnerf_eval_pass(mcfg, interpret: bool = False,
                         compute_dtype=jnp.bfloat16):
    """DirectTemporalNeRF variant: deformation net (fused kernel) then the
    canonical pass on pts + dx (pts-mode in-kernel encode), forward-only.
    params trees are {"canonical": ..., "time_net": ...}."""
    from swnerf_tpu.models.dnerf import apply_time_net
    from swnerf_tpu.ops.pallas.raymarch import fused_time_net, supports_time_net
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass

    rc, rf = _eval_tiles(mcfg)

    def dx_at(tp, ccfg, pts, times):
        tb = jnp.broadcast_to(times[..., None, :], pts.shape[:-1] + (1,))
        pe = positional_encoding(pts, ccfg.nf_pts)
        te = positional_encoding(tb, ccfg.nf_time)
        if interpret:
            dx = apply_time_net(tp, ccfg, pe, te)
        else:
            dx = fused_time_net(tp, ccfg, pe, te, compute_dtype=compute_dtype,
                                need_input_grads=False)
        if ccfg.zero_canonical:
            dx = jnp.where(tb == 0.0, jnp.zeros_like(dx), dx)
        return dx

    def run(params, fine_params, fine_field, rays, ecfg):
        n = rays.origins.shape[0]
        vd_emb = positional_encoding(rays.viewdirs, mcfg.nf_views)
        ztgt = jnp.zeros((n, 3))

        def pts_of(z):
            return rays.origins[:, None, :] + rays.directions[:, None, :] * z[..., None]

        def one(p, ccfg, z, tile):
            pts2 = pts_of(z) + dx_at(p["time_net"], ccfg, pts_of(z), rays.times)
            res, _ = fused_render_pass(
                p["canonical"], ccfg, None, vd_emb, z,
                _dists_scaled(z, rays.directions), jnp.zeros(z.shape), ztgt,
                ecfg.white_bkgd, 0.0, rays_per_tile=tile,
                interpret=interpret, compute_dtype=compute_dtype,
                pts=pts2, need_param_grads=False,
            )
            return res

        z_vals = sample_along_rays(
            None, rays.near, rays.far, ecfg.n_samples, 0.0, ecfg.lindisp
        )
        res = one(params, mcfg, z_vals, rc)
        if ecfg.n_importance > 0:
            # det=True: bit-identical to the two-op path (sorted linspace u).
            z_all = sample_pdf_merge(
                z_vals, res["weights"], ecfg.n_importance, rng=None, det=True
            )
            fcfg = mcfg
            if fine_field is not None and getattr(fine_field, "cfg", None) is not None:
                fcfg = fine_field.cfg
            res = one(
                fine_params if fine_params is not None else params,
                fcfg, z_all, rf,
            )
        disp = 1.0 / jnp.maximum(1e-10, res["depth"] / res["acc"])
        return res["rgb"], disp, res["acc"], res["depth"]

    run.supports_times = True
    run.fine_check = supports_time_net
    return run
