"""T-NeRF field: a single time-conditioned network (no deformation, no fine
pass).

Capability parity with /root/reference/model.py:152-210 (TNeRF) as wired by
t_nerf/run_tnerf.py:242-305: input = [embed(x) (in_feat), embed(t)], ELU
activations, skip concat of the full (pos+time) input after layer
``skip_layer``, separate density / feature heads, a view-conditioned
net_dim/2 layer, and a ReLU'd color head (whose output is then still passed
through the compositor's sigmoid — a reference quirk we reproduce for
parity, t_nerf/run_tnerf.py:370).

Reference quirk reproduced: the skip index uses ``i % (skip_layer+1) == 0``
at construction but ``i % skip_layer == 0`` in forward (model.py:162,199) —
consistent only for the shipped depth=8 / skip_layer=4; we implement the same
formulas.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from swnerf_tpu.models.common import (
    Field,
    dense,
    density_bias_floor,
    init_mlp_stack,
    safe_init_enabled,
    torch_linear_init,
)
from swnerf_tpu.ops.embedding import embedding_dim, positional_encoding


@dataclasses.dataclass(frozen=True)
class TNeRFConfig:
    netdepth: int = 8
    net_dim: int = 128
    skip_layer: int = 4
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0
    precision: Optional[jax.lax.Precision] = None  # per-field matmul override

    @property
    def nf_pts(self) -> int:
        return self.multires if self.i_embed == 0 else -1

    @property
    def nf_views(self) -> int:
        return self.multires_views if self.i_embed == 0 else -1

    @property
    def nf_time(self) -> int:
        return self.multires if self.i_embed == 0 else -1

    @property
    def in_feat(self) -> int:
        return embedding_dim(self.nf_pts, 3)

    @property
    def dir_feat(self) -> int:
        return embedding_dim(self.nf_views, 3)

    @property
    def time_feat(self) -> int:
        return embedding_dim(self.nf_time, 1)


def init_tnerf_params(rng: jax.Array, cfg: TNeRFConfig):
    nd, depth = cfg.net_dim, cfg.netdepth
    in0 = cfg.in_feat + cfg.time_feat
    units = [in0] + [nd] * (depth + 1)
    dims = []
    for i in range(depth):
        fan_in = units[i]
        if (i % (cfg.skip_layer + 1) == 0) and (i > 0):
            fan_in += in0
        dims.append((fan_in, units[i + 1]))
    keys = jax.random.split(rng, 5)
    return {
        "layers": init_mlp_stack(keys[0], dims),
        "density": (
            density_bias_floor(torch_linear_init(keys[1], nd, 1))
            if safe_init_enabled() else torch_linear_init(keys[1], nd, 1)
        ),
        "feature": torch_linear_init(keys[2], nd, nd),
        "layer_9": torch_linear_init(keys[3], nd + cfg.dir_feat, nd // 2),
        "color": torch_linear_init(keys[4], nd // 2, 3),
    }


def apply_tnerf(params, cfg: TNeRFConfig, pts_emb, views_emb, time_emb):
    prec = cfg.precision
    inp = jnp.concatenate([pts_emb, time_emb], -1)
    x = inp
    for i, lyr in enumerate(params["layers"]):
        x = jax.nn.elu(dense(lyr, x, prec))
        if (i % cfg.skip_layer == 0) and (i > 0):
            x = jnp.concatenate([inp, x], -1)
    sigma = dense(params["density"], x, prec)
    x = dense(params["feature"], x, prec)
    x = jnp.concatenate([x, views_emb], -1)
    x = jax.nn.elu(dense(params["layer_9"], x, prec))
    rgb = jax.nn.relu(dense(params["color"], x, prec))
    return jnp.concatenate([rgb, sigma], -1)


def _use_fused(cfg: TNeRFConfig) -> bool:
    import os

    from swnerf_tpu.ops.pallas.raymarch import supports_tnerf

    return (
        supports_tnerf(cfg)
        and jax.devices()[0].platform == "tpu"
        and os.environ.get("SWNERF_FUSED", "1") != "0"
        and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
    )


def make_tnerf_field(cfg: TNeRFConfig, fused=None, fused_interpret: bool = False) -> Field:
    """``fused=None`` auto-selects the fused ELU Pallas kernel on TPU when
    the architecture is supported (see ops.pallas.raymarch.supports_tnerf);
    True/False force it. ``fused_interpret`` runs the kernel in interpreter
    mode (CPU tests)."""
    use_fused = _use_fused(cfg) if fused is None else fused

    def init(rng):
        return init_tnerf_params(rng, cfg)

    def apply(params, pts, viewdirs, times):
        pts_emb = positional_encoding(pts, cfg.nf_pts)
        ve = positional_encoding(viewdirs, cfg.nf_views)
        views_emb = jnp.broadcast_to(
            ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],)
        )
        t = jnp.broadcast_to(times[..., None, :], pts.shape[:-1] + (1,))
        time_emb = positional_encoding(t, cfg.nf_time)
        if use_fused:
            import os

            from swnerf_tpu.ops.pallas.raymarch import fused_tnerf

            cdt = (
                jnp.bfloat16
                if os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
                else jnp.float32
            )
            din = os.environ.get("SWNERF_FUSED_INPUT_GRADS") == "1"
            if not din:
                pts_emb = jax.lax.stop_gradient(pts_emb)
                views_emb = jax.lax.stop_gradient(views_emb)
                time_emb = jax.lax.stop_gradient(time_emb)
            raw = fused_tnerf(
                params, cfg, pts_emb, views_emb, time_emb,
                interpret=fused_interpret, compute_dtype=cdt,
                need_input_grads=din,
            )
        else:
            raw = apply_tnerf(params, cfg, pts_emb, views_emb, time_emb)
        return raw, {}

    import os

    from swnerf_tpu.ops.pallas.raymarch import supports_tnerf

    eval_pass = None
    if cfg.i_embed == 0 and supports_tnerf(cfg) and (
        (use_fused and os.environ.get("SWNERF_FUSED_EVAL", "1") != "0")
        or fused_interpret
    ):
        from swnerf_tpu.render.fused_eval import make_tnerf_eval_pass

        eval_pass = make_tnerf_eval_pass(
            cfg, interpret=fused_interpret,
            compute_dtype=jnp.float32 if fused_interpret else jnp.bfloat16,
        )
    return Field(init, apply, cfg=cfg, eval_pass=eval_pass)
