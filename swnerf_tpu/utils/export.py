"""AOT model export for serving: serialize a compiled renderer to bytes.

``jax.export`` captures the jitted eval render program as versioned
StableHLO — the serving artifact is the blob plus the checkpoint, with no
Python model code, no tracing, and no framework version skew at load time
(the reference's deployment story is "ship the repo + the .tar",
nerf/load_model.py:127-149; this is the TPU-native equivalent with the
model CODE inside the artifact).

The exported callable has the serving-shaped signature

    (params, origins, directions, viewdirs, near, far[, times]) ->
        (rgb, disp, acc, depth)

with a fixed ray-batch size (static shapes — callers tile/pad, exactly as
``render_image`` does internally). Rendering is the deterministic eval
mode of ``render_rays`` (reference render_kwargs_test, run.py:302-304).

Portability note: the exported program contains whatever the field's
``apply`` lowers to. Fields built with ``fused=False`` lower to pure
StableHLO (portable across platforms via ``platforms=[...]``); fused
fields embed Mosaic TPU custom calls, which only run on TPU.

MultiRes is served per level: each pyramid level is a DirectTemporalNeRF
field, so ``export_model --export_mode multires`` writes one artifact per
level (``<out>.L<layer>``) with its own cfg/params; reconstruct with
``ops.pyramid.reconstruct_from_pyramid`` host-side (there is no
single-artifact mode — the per-level ray counts differ).

Determinism contract: the artifact reproduces the JITTED program's pixels
bit-for-bit on the same platform. Eager per-op execution can differ where
XLA fuses differently-rounded paths (concretely: XLA:CPU's fused sin/cos
range reduction at the multires level-0 embedding's 2^19-radian
arguments) — compare served outputs against jitted renders.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _render_fn(field, rcfg, fine_field, with_times: bool):
    from swnerf_tpu.render.core import Rays, render_rays

    ecfg = rcfg.eval_mode()

    def fn(params, origins, directions, viewdirs, near, far, *rest):
        rays = Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            near=near,
            far=far,
            times=rest[0] if with_times else None,
        )
        out = render_rays(
            field,
            params["coarse"],
            rays,
            ecfg,
            rng=None,
            fine_params=params.get("fine"),
            fine_field=fine_field,
        )
        return out["rgb"], out["disp"], out["acc"], out["depth"]

    return fn


def export_renderer(
    field,
    params,
    rcfg,
    n_rays: int,
    fine_field=None,
    platforms: Optional[Sequence[str]] = None,
    with_times: Optional[bool] = None,
) -> bytes:
    """Serialize the eval renderer for ``field`` at a fixed ray-batch size.

    Args:
      field: the coarse Field (use ``fused=False`` builds for portable
        artifacts — see module docstring).
      params: ``{"coarse": ..., "fine": ...-or-None}`` pytree; its SHAPES
        (not values) are baked into the artifact's input spec.
      rcfg: RenderConfig; exported in deterministic eval mode.
      n_rays: static ray-batch size of the artifact.
      fine_field: optional distinct fine Field (run_nerf --netdepth_fine).
      platforms: lowering platforms, e.g. ``["tpu"]`` or
        ``["cpu", "tpu"]``; default = the current backend.
      with_times: the artifact takes a trailing ``times [n_rays, 1]``
        operand (dnerf/tnerf families). Default: autodetect from the
        field's fused eval pass; pass explicitly for ``fused=False``
        time-conditioned fields.

    Returns: the serialized artifact (StableHLO + calling convention).
    """
    from jax import export as jexport

    if with_times is None:
        with_times = _field_takes_times(field)
    fn = _render_fn(field, rcfg, fine_field, with_times)

    f32 = jnp.float32
    args = [
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        jax.ShapeDtypeStruct((n_rays, 3), f32),
        jax.ShapeDtypeStruct((n_rays, 3), f32),
        jax.ShapeDtypeStruct((n_rays, 3), f32),
        jax.ShapeDtypeStruct((n_rays,), f32),
        jax.ShapeDtypeStruct((n_rays,), f32),
    ]
    if with_times:
        args.append(jax.ShapeDtypeStruct((n_rays, 1), f32))
    exported = jexport.export(
        jax.jit(fn), platforms=None if platforms is None else list(platforms)
    )(*args)
    return exported.serialize()


def load_renderer(blob: bytes):
    """Deserialize an ``export_renderer`` artifact into a callable with the
    exported signature. No swnerf model code is consulted — the program is
    self-contained."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)


def _field_takes_times(field) -> bool:
    """Time-conditioned families (dnerf/tnerf) thread rays.times — their
    fused eval passes declare ``supports_times`` (render/fused_eval.py)."""
    return bool(getattr(getattr(field, "eval_pass", None), "supports_times", False))
