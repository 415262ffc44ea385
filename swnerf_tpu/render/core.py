"""The single volumetric render core.

This collapses the four copy-paste render engines of the reference
(nerf/run.py:316-422, d_nerf/run_dnerf.py:354-480, t_nerf/run_tnerf.py:396-499,
multires_dnerf/multires_dnerf.py:357-...) into ONE functional pipeline
parameterized by a field (`swnerf_tpu.models.common.Field`):

  coarse stratified sampling -> field eval -> composite
  [-> inverse-CDF importance resample -> merged fine field eval -> composite]

Coverage of the reference variants:
  * vanilla hierarchical coarse+fine with a separate (or shared) fine network
    and differentiated coarse outputs (run.py:392-407);
  * D-NeRF's shared-model fine mode where the coarse pass runs without
    gradients (run_dnerf.py:445-448) vs ``use_two_models_for_fine``
    (run_dnerf.py:441-443);
  * the external ``z_vals`` override used by the D-NeRF TV loss to re-render
    a neighbor time at identical sample positions (run_dnerf.py:367,408);
  * T-NeRF single-pass rendering (no fine).

TPU-first notes: everything is static-shape and jit-compatible; randomness is
threaded through explicit PRNG keys; full-image rendering replaces the
reference's Python ``chunk`` loop (run.py:90-102) with ``lax.map`` over
padded, statically-shaped ray tiles, so a whole eval image is one XLA
program. Per-chip VMEM-fused coarse/fine field evaluation is delegated to the
field itself (Pallas path in `swnerf_tpu.ops.pallas`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from swnerf_tpu.models.common import Field
from swnerf_tpu.ops.rays import get_rays, ndc_rays
from swnerf_tpu.ops.sampling import merge_z_vals, sample_along_rays, sample_pdf
from swnerf_tpu.ops.volume import composite


class Rays(NamedTuple):
    """A batch of rays. All leading dims [N]."""

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3] (unnormalized; used for deltas)
    viewdirs: Optional[jnp.ndarray]  # [N, 3] unit directions, or None
    near: jnp.ndarray  # [N]
    far: jnp.ndarray  # [N]
    times: Optional[jnp.ndarray]  # [N, 1] frame time, or None


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render options (hashable; safe as a jit static arg)."""

    n_samples: int = 64
    n_importance: int = 0
    perturb: float = 1.0
    lindisp: bool = False
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    use_viewdirs: bool = True
    # Fine-pass gradient policy:
    #   True  -> coarse pass contributes rgb0/disp0/acc0 and gradients
    #            (vanilla run.py:392-407; dnerf use_two_models_for_fine).
    #   False -> coarse pass only guides sampling, under stop_gradient
    #            (dnerf shared-model mode, run_dnerf.py:445-448).
    coarse_contributes: bool = True

    def eval_mode(self) -> "RenderConfig":
        """Deterministic eval variant (reference render_kwargs_test,
        run.py:302-304): no jitter, no density noise."""
        return dataclasses.replace(self, perturb=0.0, raw_noise_std=0.0)


def _split(rng: Optional[jax.Array], n: int):
    if rng is None:
        return (None,) * n
    return jax.random.split(rng, n)


def render_rays(
    field: Field,
    params,
    rays: Rays,
    cfg: RenderConfig,
    rng: Optional[jax.Array] = None,
    fine_params=None,
    z_vals: Optional[jnp.ndarray] = None,
    fine_field: Optional[Field] = None,
) -> Dict[str, Any]:
    """Render a ray batch. Returns a dict of per-ray maps.

    ``fine_field`` carries a distinct fine-network architecture (reference
    ``--netdepth_fine/--netwidth_fine``, run.py:236-246); when None the
    coarse ``field`` serves both passes (shared architecture).

    Keys always present: rgb, disp, acc, weights, depth, z_vals, raw, aux.
    With a fine pass and ``cfg.coarse_contributes``: rgb0, disp0, acc0, aux0,
    z_std.
    """
    k_jit, k_noise0, k_pdf, k_noise1 = _split(rng, 4)
    viewdirs = rays.viewdirs if cfg.use_viewdirs else None
    ffield = field if fine_field is None else fine_field

    if z_vals is not None:
        # External sample positions (D-NeRF TV-loss path): one field pass.
        if fine_params is None:
            p, f = params, field
        else:
            p, f = fine_params, ffield
        pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., :, None]
        raw, aux = f.apply(p, pts, viewdirs, rays.times)
        out = composite(
            raw, z_vals, rays.directions, cfg.raw_noise_std, cfg.white_bkgd, k_noise1
        )
        return {
            "rgb": out.rgb,
            "disp": out.disp,
            "acc": out.acc,
            "weights": out.weights,
            "depth": out.depth,
            "z_vals": z_vals,
            "raw": raw,
            "aux": aux,
        }

    z_vals = sample_along_rays(
        k_jit, rays.near, rays.far, cfg.n_samples, cfg.perturb, cfg.lindisp
    )
    pts = rays.origins[..., None, :] + rays.directions[..., None, :] * z_vals[..., :, None]
    raw, aux = field.apply(params, pts, viewdirs, rays.times)
    out = composite(
        raw, z_vals, rays.directions, cfg.raw_noise_std, cfg.white_bkgd, k_noise0
    )

    ret: Dict[str, Any] = {}
    if cfg.n_importance > 0:
        weights = out.weights
        if not cfg.coarse_contributes:
            weights = jax.lax.stop_gradient(weights)
        else:
            ret.update(
                rgb0=out.rgb, disp0=out.disp, acc0=out.acc, aux0=aux
            )

        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            z_mid,
            weights[..., 1:-1],
            cfg.n_importance,
            rng=k_pdf,
            det=(cfg.perturb == 0.0),
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_vals = merge_z_vals(z_vals, z_samples)

        pts = (
            rays.origins[..., None, :]
            + rays.directions[..., None, :] * z_vals[..., :, None]
        )
        if fine_params is None:
            p, f = params, field
        else:
            p, f = fine_params, ffield
        raw, aux = f.apply(p, pts, viewdirs, rays.times)
        out = composite(
            raw, z_vals, rays.directions, cfg.raw_noise_std, cfg.white_bkgd, k_noise1
        )
        ret["z_std"] = jnp.std(z_samples, axis=-1)

    ret.update(
        rgb=out.rgb,
        disp=out.disp,
        acc=out.acc,
        weights=out.weights,
        depth=out.depth,
        z_vals=z_vals,
        raw=raw,
        aux=aux,
    )
    return ret


def build_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    use_viewdirs: bool = True,
    ndc: bool = False,
    H: int = 0,
    W: int = 0,
    focal: float = 0.0,
    times: Optional[jnp.ndarray] = None,
) -> Rays:
    """Pack raw origins/directions into a Rays batch (reference render()
    packing, run.py:137-158): viewdirs normalized from the pre-NDC
    directions, optional NDC projection, near/far broadcast."""
    viewdirs = None
    if use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    n = rays_o.shape[0]
    return Rays(
        origins=rays_o,
        directions=rays_d,
        viewdirs=viewdirs,
        near=jnp.full((n,), near, dtype=rays_o.dtype),
        far=jnp.full((n,), far, dtype=rays_o.dtype),
        times=times,
    )


def make_rays_from_camera(
    H: int,
    W: int,
    focal_or_K,
    c2w,
    near: float,
    far: float,
    use_viewdirs: bool = True,
    ndc: bool = False,
    time: Optional[float] = None,
    c2w_staticcam=None,
) -> Rays:
    """Full-image ray grid, flattened to [H*W] rays (reference render(),
    run.py:105-158: viewdir normalization, optional NDC projection, near/far
    broadcast, optional static-camera viewdir visualization)."""
    rays_o, rays_d = get_rays(H, W, focal_or_K, c2w)
    viewdirs = None
    if use_viewdirs:
        vd = rays_d
        if c2w_staticcam is not None:
            rays_o, rays_d = get_rays(H, W, focal_or_K, c2w_staticcam)
        viewdirs = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if ndc:
        focal = focal_or_K if isinstance(focal_or_K, (int, float)) else focal_or_K[0][0]
        rays_o, rays_d = ndc_rays(H, W, float(focal), 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    n = rays_o.shape[0]
    times = None
    if time is not None:
        times = jnp.full((n, 1), time, dtype=rays_o.dtype)
    return Rays(
        origins=rays_o,
        directions=rays_d,
        viewdirs=viewdirs,
        near=jnp.full((n,), near, dtype=rays_o.dtype),
        far=jnp.full((n,), far, dtype=rays_o.dtype),
        times=times,
    )


def _pad_rays(rays: Rays, multiple: int):
    n = rays.origins.shape[0]
    pad = (-n) % multiple

    def pad_leaf(x):
        if x is None:
            return None
        return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], 0)

    if pad:
        rays = Rays(*(pad_leaf(x) for x in rays))
    return rays, n


# jit cache for render_image, keyed by the static configuration; shape
# changes re-specialize inside the cached jit as usual.
_RENDER_IMAGE_JITS: Dict[Any, Any] = {}


def _render_image_fn(
    field: Field,
    cfg: RenderConfig,
    chunk: int,
    has_vd: bool,
    has_t: bool,
    fine_field: Optional[Field],
    mesh,
):
    key = (field, cfg, chunk, has_vd, has_t, fine_field, mesh)
    fn = _RENDER_IMAGE_JITS.get(key)
    if fn is not None:
        return fn
    if len(_RENDER_IMAGE_JITS) > 64:  # bound growth if fields are rebuilt per call
        _RENDER_IMAGE_JITS.clear()

    # Forward-only fused whole-pass eval (render/fused_eval.py): one Pallas
    # kernel per pass with the composite in-kernel. Under a mesh the body
    # can't stay in plain GSPMD (Mosaic custom calls aren't partitionable),
    # so the fused pass runs per-device inside shard_map over the tile axis
    # — the same treatment the train side gets (shard_map_train_step).
    # Time-conditioned eval passes (T-NeRF) declare supports_times; the
    # plain vanilla pass must not see a times lane and vice versa (the
    # packed weights expect the [embed(xyz)|embed(t)] input layout).
    use_eval_pass = (
        field.eval_pass is not None and has_vd
        and has_t == bool(getattr(field.eval_pass, "supports_times", False))
    )
    if use_eval_pass and fine_field is not None:
        # The coarse arch was validated when eval_pass was attached; an
        # unsupported FINE architecture (e.g. netwidth_fine % 128 != 0)
        # must fall back to the generic path.
        from swnerf_tpu.render.fused_eval import supports_eval_pass

        use_eval_pass = supports_eval_pass(field.cfg, fine_field, field.eval_pass)

    def run(params, fine_params, xs):
        def body(tile_arrays):
            o, d, vd, nr, fr, tm = tile_arrays
            tile = Rays(o, d, vd if has_vd else None, nr, fr, tm if has_t else None)
            if use_eval_pass:
                return field.eval_pass(params, fine_params, fine_field, tile, cfg)
            out = render_rays(
                field, params, tile, cfg, rng=None, fine_params=fine_params,
                fine_field=fine_field,
            )
            return out["rgb"], out["disp"], out["acc"], out["depth"]

        return jax.lax.map(body, xs)

    if mesh is not None:
        # Eval data parallelism: the tile axis shards over the rays mesh —
        # every chip lax.maps its share of tiles; fetching the output
        # all_gathers the image (SURVEY.md §5 eval collective).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from swnerf_tpu.parallel.mesh import RAYS_AXIS

        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P(RAYS_AXIS))
        if use_eval_pass:
            # Mosaic custom calls inside the body: map the tiles per-device
            # with shard_map so each chip runs its own fused kernels; the
            # fetched output still assembles over the rays axis.
            run_local = jax.shard_map(
                run, mesh=mesh,
                in_specs=(P(), P(), P(RAYS_AXIS)),
                out_specs=P(RAYS_AXIS),
                check_vma=False,
            )
            fn = jax.jit(run_local)
        else:
            fn = jax.jit(run, in_shardings=(rep, rep, shd), out_shardings=shd)
    else:
        fn = jax.jit(run)
    _RENDER_IMAGE_JITS[key] = fn
    return fn


def render_image(
    field: Field,
    params,
    rays: Rays,
    cfg: RenderConfig,
    chunk: int = 8192,
    fine_params=None,
    fine_field: Optional[Field] = None,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Chunked whole-image render: ONE cached-jit program of ``lax.map`` over
    static ray tiles replaces the reference's Python batchify_rays loop
    (run.py:90-102) — compiled once per (field, cfg, chunk, shape), so a
    render path over many poses dispatches one executable per pose.
    Always deterministic (eval mode: the reference's render_kwargs_test,
    run.py:302-304); returns rgb/disp/acc/depth flattened to [N_rays, ...].

    With ``mesh``, tiles shard over the ``rays`` axis — eval rendering time
    drops ~n_devices x (the reference has no eval distribution at all).
    """
    cfg = cfg.eval_mode()
    multiple = chunk
    if mesh is not None:
        # Bound the padding waste: with few rays per device, shrink the tile
        # so the grid still covers every chip without padding a full chunk
        # per device (e.g. 160k rays / 8 chips with chunk=32768).
        ndev = int(mesh.devices.size)
        per_dev = -(-rays.origins.shape[0] // ndev)  # ceil
        chunk = min(chunk, -(-per_dev // 256) * 256 if per_dev > 256 else per_dev)
        multiple = chunk * ndev
    padded, n = _pad_rays(rays, multiple)
    n_chunks = padded.origins.shape[0] // chunk

    def reshape_leaf(x):
        if x is None:
            return None
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    tiles = Rays(*(reshape_leaf(x) for x in padded))
    # lax.map can't carry None leaves; substitute empties and rebuild inside.
    has_vd = tiles.viewdirs is not None
    has_t = tiles.times is not None

    zeros = jnp.zeros((n_chunks, chunk, 0), padded.origins.dtype)
    xs = (
        tiles.origins,
        tiles.directions,
        tiles.viewdirs if has_vd else zeros,
        tiles.near,
        tiles.far,
        tiles.times if has_t else zeros,
    )
    if mesh is not None:
        # Replicate params up front (no-op when already replicated) so
        # committed single-device params don't clash with in_shardings.
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        if fine_params is not None:
            fine_params = jax.device_put(fine_params, rep)
    fn = _render_image_fn(field, cfg, chunk, has_vd, has_t, fine_field, mesh)
    rgb, disp, acc, depth = fn(params, fine_params, xs)
    return {
        "rgb": rgb.reshape(-1, 3)[:n],
        "disp": disp.reshape(-1)[:n],
        "acc": acc.reshape(-1)[:n],
        "depth": depth.reshape(-1)[:n],
    }
