"""D-NeRF fields: canonical NeRF + deformation ("time") MLP.

Capability parity with /root/reference/model.py:93-151 (DirectTemporalNeRF)
and model.py:227-325 (NeRFOriginal):

* ``NeRFOriginal`` — the vanilla trunk with kaiming-normal(fan_in) weight
  init on every Linear (model.py:270-272) and an ``output_color_ch`` rgb
  head; its apply returns ``(raw, dx=0)``.
* ``DirectTemporalNeRF`` — a deformation MLP mapping
  ``(embed(x), embed(t)) -> dx`` (model.py:113-136), after which the
  canonical network is queried at the *re-embedded* ``x + dx``
  (model.py:147-150). With ``zero_canonical`` the deformation is forced to
  zero at ``t == 0`` (model.py:144-146).

Design delta (deliberate, documented): the reference asserts that every
point in a batch shares one time and branches on it in Python
(model.py:142-146). Here the ``t == 0`` short-circuit is an elementwise
``jnp.where`` per ray, which is XLA-compatible (no data-dependent Python
branch), reproduces the reference exactly when all times are equal, and
additionally supports mixed-time ray batches — which is what a TPU wants,
since it removes the one-image-per-step constraint.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from swnerf_tpu.models.common import (
    Field,
    dense,
    density_bias_floor,
    init_mlp_stack,
    kaiming_linear_init,
    safe_init_enabled,
    torch_linear_init,
)
from swnerf_tpu.ops.embedding import embedding_dim, positional_encoding


@dataclasses.dataclass(frozen=True)
class DNeRFConfig:
    netdepth: int = 8
    netwidth: int = 256
    skips: Tuple[int, ...] = (4,)
    multires: int = 10  # xyz freqs; also time freqs unless multires_time set
    multires_views: int = 4
    # Separate time freqs for the MultiRes per-level channel lists
    # (multires_dnerf.py:665-668); None -> same as multires (run_dnerf.py:253).
    multires_time: Optional[int] = None
    i_embed: int = 0
    use_viewdirs: bool = True
    output_ch: int = 4
    zero_canonical: bool = True
    precision: Optional[jax.lax.Precision] = None  # per-field matmul override

    @property
    def nf_pts(self) -> int:
        return self.multires if self.i_embed == 0 else -1

    @property
    def nf_views(self) -> int:
        return self.multires_views if self.i_embed == 0 else -1

    @property
    def nf_time(self) -> int:
        if self.i_embed != 0:
            return -1
        return self.multires if self.multires_time is None else self.multires_time

    @property
    def input_ch(self) -> int:
        return embedding_dim(self.nf_pts, 3)

    @property
    def input_ch_views(self) -> int:
        return embedding_dim(self.nf_views, 3) if self.use_viewdirs else 0

    @property
    def input_ch_time(self) -> int:
        return embedding_dim(self.nf_time, 1)


def _trunk_dims(cfg: DNeRFConfig, in_ch: int):
    D, W = cfg.netdepth, cfg.netwidth
    return [(in_ch, W)] + [
        ((W + in_ch, W) if i in cfg.skips else (W, W)) for i in range(D - 1)
    ]


def init_nerf_original_params(rng: jax.Array, cfg: DNeRFConfig):
    """Canonical network params — kaiming init (reference model.py:270-272)."""
    W = cfg.netwidth
    keys = jax.random.split(rng, 6)
    params = {
        "pts_linears": init_mlp_stack(
            keys[0], _trunk_dims(cfg, cfg.input_ch), kaiming_linear_init
        )
    }
    if cfg.use_viewdirs:
        params["views_linears"] = init_mlp_stack(
            keys[1], [(cfg.input_ch_views + W, W // 2)], kaiming_linear_init
        )
        params["feature_linear"] = kaiming_linear_init(keys[2], W, W)
        params["alpha_linear"] = kaiming_linear_init(keys[3], W, 1)
        params["rgb_linear"] = kaiming_linear_init(keys[4], W // 2, 3)
    else:
        params["output_linear"] = kaiming_linear_init(keys[5], W, cfg.output_ch)
    if safe_init_enabled():
        if cfg.use_viewdirs:
            params["alpha_linear"] = density_bias_floor(params["alpha_linear"])
        else:
            params["output_linear"] = density_bias_floor(params["output_linear"], index=3)
    return params


def apply_nerf_original(params, cfg: DNeRFConfig, pts_emb, views_emb):
    """Canonical trunk on embedded inputs -> raw [..., 4]."""
    prec = cfg.precision
    h = pts_emb
    for i, lyr in enumerate(params["pts_linears"]):
        h = jax.nn.relu(dense(lyr, h, prec))
        if i in cfg.skips:
            h = jnp.concatenate([pts_emb, h], -1)
    if cfg.use_viewdirs:
        alpha = dense(params["alpha_linear"], h, prec)
        feature = dense(params["feature_linear"], h, prec)
        h = jnp.concatenate([feature, views_emb], -1)
        for lyr in params["views_linears"]:
            h = jax.nn.relu(dense(lyr, h, prec))
        rgb = dense(params["rgb_linear"], h, prec)
        return jnp.concatenate([rgb, alpha], -1)
    return dense(params["output_linear"], h, prec)


def init_time_net_params(rng: jax.Array, cfg: DNeRFConfig):
    """Deformation MLP: (embed(x), embed(t)) -> dx. Reference
    model.py:113-126 — torch-default Linear init (kaiming is only applied
    inside NeRFOriginal's own module tree)."""
    D, W = cfg.netdepth, cfg.netwidth
    in0 = cfg.input_ch + cfg.input_ch_time
    dims = [(in0, W)] + [
        ((W + cfg.input_ch, W) if i in cfg.skips else (W, W)) for i in range(D - 1)
    ]
    k1, k2 = jax.random.split(rng)
    return {
        "layers": init_mlp_stack(k1, dims, torch_linear_init),
        "out": torch_linear_init(k2, W, 3),
    }


def apply_time_net(params, cfg: DNeRFConfig, pts_emb, time_emb):
    prec = cfg.precision
    h = jnp.concatenate([pts_emb, time_emb], -1)
    for i, lyr in enumerate(params["layers"]):
        h = jax.nn.relu(dense(lyr, h, prec))
        if i in cfg.skips:
            h = jnp.concatenate([pts_emb, h], -1)
    return dense(params["out"], h, prec)


def _use_fused(cfg: DNeRFConfig) -> bool:
    """Route the canonical trunk through the fused Pallas kernel on TPU —
    it shares the vanilla architecture, so the same kernel serves it."""
    import os

    import jax

    from swnerf_tpu.ops.pallas.raymarch import supports_config

    return (
        supports_config(cfg)
        and jax.devices()[0].platform == "tpu"
        and os.environ.get("SWNERF_FUSED", "1") != "0"
        and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
    )


def _trunk_apply(
    params, cfg: DNeRFConfig, pts_emb, views_emb, fused: bool,
    need_input_grads: bool = True,
):
    if fused and cfg.use_viewdirs:
        import os

        from swnerf_tpu.ops.pallas.raymarch import fused_trunk

        cdt = (
            jnp.bfloat16
            if os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
            else jnp.float32
        )
        if os.environ.get("SWNERF_FUSED_INPUT_GRADS") == "1":
            need_input_grads = True
        if not need_input_grads:
            pts_emb = jax.lax.stop_gradient(pts_emb)
            views_emb = jax.lax.stop_gradient(views_emb)
        return fused_trunk(
            params, cfg, pts_emb, views_emb, compute_dtype=cdt,
            need_input_grads=need_input_grads,
        )
    return apply_nerf_original(params, cfg, pts_emb, views_emb)


def make_nerf_original_field(cfg: DNeRFConfig, fused: Optional[bool] = None) -> Field:
    """`--nerf_type original`: static canonical network, time ignored except
    for embedding-parity of the API. Returns aux dx = zeros
    (reference model.py:296)."""
    use_fused = _use_fused(cfg) if fused is None else fused

    def init(rng):
        return init_nerf_original_params(rng, cfg)

    def apply(params, pts, viewdirs: Optional[jnp.ndarray], times=None):
        pts_emb = positional_encoding(pts, cfg.nf_pts)
        views_emb = None
        if cfg.use_viewdirs:
            # Per-ray viewdir encoding broadcast over samples (see
            # models/vanilla.py).
            ve = positional_encoding(viewdirs, cfg.nf_views)
            views_emb = jnp.broadcast_to(
                ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],)
            )
        raw = _trunk_apply(
            params, cfg, pts_emb, views_emb, use_fused, need_input_grads=False
        )
        return raw, {"dx": jnp.zeros_like(pts)}

    return Field(init, apply)


def make_dnerf_field(cfg: DNeRFConfig, fused: Optional[bool] = None) -> Field:
    """`--nerf_type direct_temporal` (DirectTemporalNeRF)."""
    use_fused = _use_fused(cfg) if fused is None else fused

    def init(rng):
        k1, k2 = jax.random.split(rng)
        return {
            "canonical": init_nerf_original_params(k1, cfg),
            "time_net": init_time_net_params(k2, cfg),
        }

    def apply(params, pts, viewdirs: Optional[jnp.ndarray], times):
        """times: [N, 1] per-ray frame time, broadcast over samples."""
        pts_emb = positional_encoding(pts, cfg.nf_pts)
        t = jnp.broadcast_to(times[..., None, :], pts.shape[:-1] + (1,))
        time_emb = positional_encoding(t, cfg.nf_time)

        from swnerf_tpu.ops.pallas.raymarch import supports_time_net

        if use_fused and supports_time_net(cfg):
            import os

            from swnerf_tpu.ops.pallas.raymarch import fused_time_net

            cdt = (
                jnp.bfloat16
                if os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
                else jnp.float32
            )
            dx = fused_time_net(
                params["time_net"], cfg,
                jax.lax.stop_gradient(pts_emb), jax.lax.stop_gradient(time_emb),
                compute_dtype=cdt, need_input_grads=False,
            )
        else:
            dx = apply_time_net(params["time_net"], cfg, pts_emb, time_emb)
        if cfg.zero_canonical:
            # Elementwise analog of the reference's cur_time == 0 branch
            # (model.py:144-146); exact match when all times are equal.
            is_zero = t == 0.0
            dx = jnp.where(is_zero, jnp.zeros_like(dx), dx)
            warped_emb = positional_encoding(pts + dx, cfg.nf_pts)
            pts_emb = jnp.where(is_zero, pts_emb, warped_emb)
        else:
            pts_emb = positional_encoding(pts + dx, cfg.nf_pts)

        views_emb = None
        if cfg.use_viewdirs:
            # Per-ray viewdir encoding broadcast over samples (see
            # models/vanilla.py).
            ve = positional_encoding(viewdirs, cfg.nf_views)
            views_emb = jnp.broadcast_to(
                ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],)
            )
        raw = _trunk_apply(params["canonical"], cfg, pts_emb, views_emb, use_fused)
        return raw, {"dx": dx}

    import os

    from swnerf_tpu.ops.pallas.raymarch import supports_config, supports_time_net

    eval_pass = None
    if cfg.i_embed == 0 and supports_config(cfg) and supports_time_net(cfg):
        fused_interpret = os.environ.get("SWNERF_FUSED_STEP") == "force-interpret"
        if (use_fused and os.environ.get("SWNERF_FUSED_EVAL", "1") != "0") or fused_interpret:
            from swnerf_tpu.render.fused_eval import make_dnerf_eval_pass

            eval_pass = make_dnerf_eval_pass(
                cfg, interpret=fused_interpret,
                compute_dtype=jnp.float32 if fused_interpret else jnp.bfloat16,
            )
    return Field(init, apply, cfg=cfg, eval_pass=eval_pass)
