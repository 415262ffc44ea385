"""Vanilla NeRF MLP field.

Capability parity with /root/reference/model.py:10-91 (``vallina_NeRF``):
D=8, W=256 MLP with a skip concat of the embedded input after layer 4
(skips=[4]); with view directions, an alpha head off the trunk, a feature
layer, one W/2 view-conditioned layer, and an rgb head; without view
directions, a single ``output_ch``-wide head (output_ch=5 when a fine pass
exists, matching nerf/run.py:231).

TPU-first notes: the field owns its positional encoding (reference does it in
run_network, nerf/run.py:73-87) so that encode+MLP+heads form one fusion
region for XLA / one Pallas kernel; weights total ~600k params (~2.4 MB fp32)
and stay VMEM-resident in the fused kernel. Matmuls accumulate in fp32
(PSNR-parity requirement).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

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
class VanillaNeRFConfig:
    netdepth: int = 8
    netwidth: int = 256
    skips: Tuple[int, ...] = (4,)
    multires: int = 10  # positional-encoding freqs for xyz
    multires_views: int = 4  # positional-encoding freqs for view dirs
    i_embed: int = 0  # 0: fourier encoding, -1: identity
    use_viewdirs: bool = True
    output_ch: int = 4  # only used when use_viewdirs=False
    # Per-field matmul precision override (None -> module default); lets a
    # pipeline opt into bf16 inputs without mutating global state.
    precision: Optional[jax.lax.Precision] = None

    @property
    def nf_pts(self) -> int:
        return self.multires if self.i_embed == 0 else -1

    @property
    def nf_views(self) -> int:
        return self.multires_views if self.i_embed == 0 else -1

    @property
    def input_ch(self) -> int:
        return embedding_dim(self.nf_pts, 3)

    @property
    def input_ch_views(self) -> int:
        return embedding_dim(self.nf_views, 3) if self.use_viewdirs else 0


def init_vanilla_params(rng: jax.Array, cfg: VanillaNeRFConfig):
    D, W, in_ch = cfg.netdepth, cfg.netwidth, cfg.input_ch
    keys = jax.random.split(rng, 6)
    # Layer i+1 takes W+input_ch when i is a skip (reference model.py:22-23).
    dims = [(in_ch, W)] + [
        ((W + in_ch, W) if i in cfg.skips else (W, W)) for i in range(D - 1)
    ]
    params = {"pts_linears": init_mlp_stack(keys[0], dims)}
    if cfg.use_viewdirs:
        params["views_linears"] = init_mlp_stack(
            keys[1], [(cfg.input_ch_views + W, W // 2)]
        )
        params["feature_linear"] = torch_linear_init(keys[2], W, W)
        params["alpha_linear"] = torch_linear_init(keys[3], W, 1)
        params["rgb_linear"] = torch_linear_init(keys[4], W // 2, 3)
    else:
        params["output_linear"] = torch_linear_init(keys[5], W, cfg.output_ch)
    if safe_init_enabled():
        if cfg.use_viewdirs:
            params["alpha_linear"] = density_bias_floor(params["alpha_linear"])
        else:
            params["output_linear"] = density_bias_floor(params["output_linear"], index=3)
    return params


def apply_vanilla_trunk(params, cfg: VanillaNeRFConfig, pts_emb, views_emb):
    """Run the MLP on already-embedded inputs.

    pts_emb: [..., input_ch]; views_emb: [..., input_ch_views] or None.
    Returns raw [..., 4] (or [..., output_ch] without viewdirs).
    """
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


def load_keras_weights(params, cfg: VanillaNeRFConfig, weights):
    """Import the original TF-NeRF Keras weight list (reference
    model.py:64-91 load_weights_from_keras): alternating [w, b] arrays for
    pts layers, then feature, views, rgb, alpha. Keras stores [in, out] —
    our native layout, so no transposes."""
    assert cfg.use_viewdirs, "Not implemented if use_viewdirs=False"
    import numpy as np

    D = cfg.netdepth
    out = jax.tree.map(lambda x: x, params)
    for i in range(D):
        out["pts_linears"][i] = {
            "w": jnp.asarray(np.asarray(weights[2 * i])),
            "b": jnp.asarray(np.asarray(weights[2 * i + 1])),
        }
    out["feature_linear"] = {
        "w": jnp.asarray(np.asarray(weights[2 * D])),
        "b": jnp.asarray(np.asarray(weights[2 * D + 1])),
    }
    out["views_linears"][0] = {
        "w": jnp.asarray(np.asarray(weights[2 * D + 2])),
        "b": jnp.asarray(np.asarray(weights[2 * D + 3])),
    }
    out["rgb_linear"] = {
        "w": jnp.asarray(np.asarray(weights[2 * D + 4])),
        "b": jnp.asarray(np.asarray(weights[2 * D + 5])),
    }
    out["alpha_linear"] = {
        "w": jnp.asarray(np.asarray(weights[2 * D + 6])),
        "b": jnp.asarray(np.asarray(weights[2 * D + 7])),
    }
    return out


def make_vanilla_field(
    cfg: VanillaNeRFConfig,
    fused: Optional[bool] = None,
    fused_interpret: bool = False,
) -> Field:
    """``fused=None`` auto-selects the Pallas fused trunk on TPU when the
    architecture is supported; True/False force it. ``fused_interpret`` runs
    the kernel in interpreter mode (tests on CPU)."""
    use_fused = fused
    if use_fused is None:
        from swnerf_tpu.ops.pallas.raymarch import supports_config

        use_fused = (
            supports_config(cfg)
            and jax.devices()[0].platform == "tpu"
            and os.environ.get("SWNERF_FUSED", "1") != "0"
            # The fused kernels win in bf16; fp32 parity runs are faster on
            # the XLA path (PERFORMANCE.md), so f32 fused is explicit-only.
            and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
        )

    def init(rng: jax.Array):
        return init_vanilla_params(rng, cfg)

    def apply(params, pts, viewdirs: Optional[jnp.ndarray], times=None):
        del times  # static scene
        if use_fused and cfg.i_embed == 0 and os.environ.get("SWNERF_FUSED_RAW") == "1":
            # Fully fused variant (encoding inside the kernel). Off by
            # default: its backward needs a smaller VMEM tile, which costs
            # more than the fused encoder saves (PERFORMANCE.md).
            from swnerf_tpu.ops.pallas.raymarch import fused_field_raw

            cdt = (
                jnp.bfloat16
                if os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
                else jnp.float32
            )
            vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
            raw = fused_field_raw(
                params, cfg, pts, vd, interpret=fused_interpret, compute_dtype=cdt
            )
            return raw, {}
        pts_emb = positional_encoding(pts, cfg.nf_pts)
        views_emb = None
        if cfg.use_viewdirs:
            # Embed per-RAY then broadcast: viewdirs are constant along a
            # ray, so encoding after the [N,S,3] broadcast would redo the
            # sin/cos S times (reference embeds the flat expanded dirs,
            # run.py:80-83 — wasteful there too).
            ve = positional_encoding(viewdirs, cfg.nf_views)
            views_emb = jnp.broadcast_to(
                ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],)
            )
        if use_fused:
            from swnerf_tpu.ops.pallas.raymarch import fused_trunk

            cdt = (
                jnp.bfloat16
                if os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
                else jnp.float32
            )
            # Static field: embeddings are constants w.r.t. params, so the
            # backward's input-cotangent matmuls are dead work — skip them
            # and stop_gradient the embeddings so position-gradients are
            # UNIFORMLY zero rather than mode-dependent (cf. the sample_pdf
            # decision in ops/sampling.py). SWNERF_FUSED_INPUT_GRADS=1
            # restores full input gradients.
            din = os.environ.get("SWNERF_FUSED_INPUT_GRADS") == "1"
            if not din:
                pts_emb = jax.lax.stop_gradient(pts_emb)
                views_emb = jax.lax.stop_gradient(views_emb)
            raw = fused_trunk(
                params, cfg, pts_emb, views_emb,
                interpret=fused_interpret, compute_dtype=cdt,
                need_input_grads=din,
            )
        else:
            raw = apply_vanilla_trunk(params, cfg, pts_emb, views_emb)
        return raw, {}

    from swnerf_tpu.ops.pallas.raymarch import supports_config

    eval_pass = None
    if cfg.i_embed == 0 and supports_config(cfg) and (
        (use_fused and os.environ.get("SWNERF_FUSED_EVAL", "1") != "0")
        or fused_interpret
    ):
        from swnerf_tpu.render.fused_eval import make_vanilla_eval_pass

        eval_pass = make_vanilla_eval_pass(
            cfg, interpret=fused_interpret,
            compute_dtype=jnp.float32 if fused_interpret else jnp.bfloat16,
        )
    return Field(init, apply, cfg=cfg, eval_pass=eval_pass)
