"""Shared pipeline machinery: dataset dispatch, ray sampling strategies,
path rendering, eval metrics dumps.

This is the one implementation of what the reference copy-pastes per runner
(dataset switch run.py:431-511, ray pool run.py:601-650, per-image sampling
with precrop run.py:652-681, render_path run.py:172-219, render_only metrics
run.py:557-596).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models.common import Field
from swnerf_tpu.ops.rays import get_rays_at, get_rays_np
from swnerf_tpu.render.core import (
    RenderConfig,
    build_rays,
    make_rays_from_camera,
    render_image,
)
from swnerf_tpu.utils.media import write_png, write_video
from swnerf_tpu.utils.metrics import calculate_metrics


@dataclasses.dataclass
class Scene:
    """Loaded dataset + camera/bounds metadata."""

    images: np.ndarray  # [N,H,W,3] float32 (already bkgd-composited)
    poses: np.ndarray  # [N,4,4] or [N,3,5]
    render_poses: np.ndarray
    H: int
    W: int
    focal: float
    K: np.ndarray  # [3,3]
    near: float
    far: float
    i_train: np.ndarray
    i_val: np.ndarray
    i_test: np.ndarray
    ndc: bool = False
    times: Optional[np.ndarray] = None  # [N] frame times (dynamic sets)
    render_times: Optional[np.ndarray] = None


def _composite_background(images: np.ndarray, white_bkgd: bool) -> np.ndarray:
    if images.shape[-1] == 4:
        if white_bkgd:
            return images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
        return images[..., :3]
    return images


def load_scene(args) -> Scene:
    """Dataset dispatch (reference run.py:431-511)."""
    K = None
    times = render_times = None
    ndc = False
    if args.dataset_type == "llff":
        from swnerf_tpu.data.llff import load_llff_data

        images, poses, bds, render_poses, i_test = load_llff_data(
            args.datadir, args.factor, recenter=True, bd_factor=0.75, spherify=args.spherify
        )
        hwf = poses[0, :3, -1]
        poses = poses[:, :3, :4]
        if args.llffhold > 0:
            i_test = np.arange(images.shape[0])[:: args.llffhold]
        else:
            i_test = np.array([i_test])
        i_val = i_test
        i_train = np.array(
            [i for i in np.arange(images.shape[0]) if i not in i_test and i not in i_val]
        )
        if args.no_ndc:
            near, far = float(bds.min() * 0.9), float(bds.max() * 1.0)
        else:
            near, far = 0.0, 1.0
            ndc = True
    elif args.dataset_type == "blender":
        from swnerf_tpu.data.blender import load_blender_data

        images, poses, render_poses, hwf, i_split = load_blender_data(
            args.datadir, args.half_res, args.testskip
        )
        i_train, i_val, i_test = i_split
        near, far = 2.0, 6.0
        images = _composite_background(images, args.white_bkgd)
    elif args.dataset_type == "blender_dnerf":
        from swnerf_tpu.data.blender import load_blender_dynamic_data

        images, poses, times, render_poses, render_times, hwf, i_split = (
            load_blender_dynamic_data(args.datadir, args.half_res, args.testskip)
        )
        i_train, i_val, i_test = i_split
        near, far = 2.0, 6.0
        images = _composite_background(images, args.white_bkgd)
    elif args.dataset_type == "LINEMOD":
        from swnerf_tpu.data.linemod import load_linemod_data

        images, poses, render_poses, hwf, K, i_split, near, far = load_linemod_data(
            args.datadir, args.half_res, args.testskip
        )
        i_train, i_val, i_test = i_split
        images = _composite_background(images, args.white_bkgd)
    elif args.dataset_type == "deepvoxels":
        from swnerf_tpu.data.deepvoxels import load_dv_data

        images, poses, render_poses, hwf, i_split = load_dv_data(
            scene=args.shape, basedir=args.datadir, testskip=args.testskip
        )
        i_train, i_val, i_test = i_split
        hemi_r = float(np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1)))
        near, far = hemi_r - 1.0, hemi_r + 1.0
    elif args.dataset_type == "custom":
        from swnerf_tpu.data.custom import load_custom_data

        images, poses, render_poses, K, hwf, i_split = load_custom_data(
            args.datadir, args.half_res, args.testskip
        )
        i_train, i_val, i_test = i_split
        near, far = 1.0, 6.0
        images = _composite_background(images, args.white_bkgd)
    else:
        raise ValueError(f"Unknown dataset type {args.dataset_type!r}")

    H, W, focal = hwf
    H, W = int(H), int(W)
    if K is None:
        K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    K = np.asarray(K, dtype=np.float64)

    if getattr(args, "render_test", False):
        render_poses = np.array(poses[i_test])
        if times is not None:
            render_times = np.array(times[i_test])

    return Scene(
        images=np.asarray(images, np.float32),
        poses=np.asarray(poses, np.float32),
        render_poses=np.asarray(render_poses, np.float32),
        H=H,
        W=W,
        focal=float(focal),
        K=K,
        near=float(near),
        far=float(far),
        i_train=np.asarray(i_train),
        i_val=np.asarray(i_val),
        i_test=np.asarray(i_test),
        ndc=ndc,
        times=times,
        render_times=render_times,
    )


# ---------------------------------------------------------------------------
# Ray sampling strategies
# ---------------------------------------------------------------------------


class RayPoolSampler:
    """Pre-shuffled all-image ray pool (reference use_batching path,
    run.py:601-650). The pool lives on device; the host only walks a numpy
    permutation and ships [N_rand] int32 index slices per step — the gather
    runs inside jit."""

    def __init__(self, scene: Scene, n_rand: int, seed: int = 0):
        rays = np.stack(
            [get_rays_np(scene.H, scene.W, scene.K, p[:3, :4]) for p in scene.poses],
            0,
        )  # [N, 2(o,d), H, W, 3]
        rays = np.transpose(rays, [0, 2, 3, 1, 4])  # [N,H,W,2,3]
        rays = rays[scene.i_train]
        rgb = scene.images[scene.i_train][..., None, :3]  # [Nt,H,W,1,3]
        pool = np.concatenate([rays, rgb], -2).reshape(-1, 3, 3).astype(np.float32)
        self._rng = np.random.default_rng(seed)
        self.pool = jnp.asarray(pool)  # device-resident [Np,3,3]
        self.n = pool.shape[0]
        self.n_rand = n_rand
        self._perm = self._rng.permutation(self.n)
        self._i = 0

    def next_indices(self) -> np.ndarray:
        if self._i + self.n_rand > self.n:
            self._perm = self._rng.permutation(self.n)
            self._i = 0
        idx = self._perm[self._i : self._i + self.n_rand]
        self._i += self.n_rand
        return idx.astype(np.int32)


class ImageSampler:
    """Per-image random pixels with center-crop curriculum (reference
    no_batching path, run.py:652-681). The host picks the image and pixel
    coordinates (seeded numpy choice without replacement); ray generation for
    just those pixels runs on device (ops.rays.get_rays_at)."""

    def __init__(
        self,
        scene: Scene,
        n_rand: int,
        precrop_iters: int,
        precrop_frac: float,
        seed: int = 0,
        precrop_iters_time: int = 0,
    ):
        self.scene = scene
        self.n_rand = n_rand
        self.precrop_iters = precrop_iters
        self.precrop_frac = precrop_frac
        self.precrop_iters_time = precrop_iters_time
        self._rng = np.random.default_rng(seed)
        H, W = scene.H, scene.W
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        ys, xs = np.meshgrid(
            np.arange(H // 2 - dH, H // 2 + dH), np.arange(W // 2 - dW, W // 2 + dW), indexing="ij"
        )
        self._crop_coords = np.stack([ys, xs], -1).reshape(-1, 2).astype(np.int32)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        self._full_coords = np.stack([ys, xs], -1).reshape(-1, 2).astype(np.int32)

    def next(self, step: int) -> Tuple[int, np.ndarray]:
        i_train = self.scene.i_train
        if step >= self.precrop_iters_time:
            img_i = int(self._rng.choice(i_train))
        else:
            # Time curriculum: expand the reachable frame range linearly
            # (reference run_dnerf.py:650-655).
            skip_factor = step / float(self.precrop_iters_time) * len(i_train)
            max_sample = max(int(skip_factor), 3)
            img_i = int(self._rng.choice(i_train[:max_sample]))
        coords = self._crop_coords if step < self.precrop_iters else self._full_coords
        # When the (pre-crop) region holds fewer pixels than N_rand — e.g.
        # the coarsest MultiRes level of a small image — fall back to
        # sampling with replacement (the reference crashes here,
        # run.py:676); batch shape must stay static for jit.
        replace = coords.shape[0] < self.n_rand
        sel = self._rng.choice(coords.shape[0], size=self.n_rand, replace=replace)
        return img_i, coords[sel]


def make_pool_step(train_step, cfg: RenderConfig, scene: Scene, mesh=None,
                   state_shardings=None):
    """Wrap a train step to consume (pool, idx): unpack o/d/rgb, build Rays.

    With ``mesh``, the per-step index slice is sharded over the ``rays``
    axis (pool and params replicated): each chip gathers and renders its
    share of the batch and XLA psums the gradients (greenfield data
    parallelism, SURVEY.md §2.7). ``state_shardings`` keeps the train
    state model-sharded instead (tensor parallelism, parallel/tensor.py)."""

    def step(state, pool, idx, rng, times=None):
        batch = pool[idx]  # [N,3,3]
        rays_o, rays_d, target = batch[:, 0], batch[:, 1], batch[:, 2]
        rays = build_rays(
            rays_o,
            rays_d,
            scene.near,
            scene.far,
            use_viewdirs=cfg.use_viewdirs,
            ndc=scene.ndc,
            H=scene.H,
            W=scene.W,
            focal=scene.focal,
            times=times,
        )
        return train_step(state, rays, target, rng)

    if mesh is not None:
        from swnerf_tpu.parallel import shard_cli_step
        from swnerf_tpu.parallel.multihost import wrap_feeder

        return wrap_feeder(
            shard_cli_step(step, mesh, n_args=4, sharded_argnums=(2,),
                           state_shardings=state_shardings),
            mesh, sharded_argnums=(2,))
    return jax.jit(step, donate_argnums=(0,))


def make_image_step(train_step, cfg: RenderConfig, scene: Scene, mesh=None,
                    state_shardings=None):
    """Wrap a train step to consume (images, poses, img_i, pixels): generate
    rays only at the chosen pixels, gather targets, build Rays.

    With ``mesh``, the pixel-coordinate batch is sharded over ``rays`` and
    everything else replicated (see make_pool_step)."""
    K = scene.K
    H, W = scene.H, scene.W

    def step(state, images, poses, img_i, pixels, rng, time_val=None):
        c2w = poses[img_i][:3, :4]
        rays_o, rays_d = get_rays_at(pixels, H, W, K, c2w)
        target = images[img_i][pixels[:, 0], pixels[:, 1]]
        times = None
        if time_val is not None:
            times = jnp.full((pixels.shape[0], 1), time_val, dtype=jnp.float32)
        rays = build_rays(
            rays_o,
            rays_d,
            scene.near,
            scene.far,
            use_viewdirs=cfg.use_viewdirs,
            ndc=scene.ndc,
            H=H,
            W=W,
            focal=scene.focal,
            times=times,
        )
        return train_step(state, rays, target, rng)

    if mesh is not None:
        from swnerf_tpu.parallel import shard_cli_step
        from swnerf_tpu.parallel.multihost import wrap_feeder

        return wrap_feeder(
            shard_cli_step(step, mesh, n_args=6, sharded_argnums=(4,),
                           state_shardings=state_shardings),
            mesh, sharded_argnums=(4,))
    return jax.jit(step, donate_argnums=(0,), static_argnums=())


def make_time_image_step(train_step, cfg: RenderConfig, scene: Scene, mesh=None,
                         pass_neighbor: bool = False, state_shardings=None):
    """Wrap a ``(state, rays, target[, neighbor_time], rng)`` step with the
    dnerf-family CLI signature (images, poses, times, img_i, pixels,
    neighbor_time, rng); the per-ray frame time rides ``rays.times``.
    Used to swap the fused T-NeRF/D-NeRF steps into run_tnerf/run_dnerf in
    place of make_dnerf_step (``pass_neighbor`` forwards the TV-loss
    neighbor time)."""
    K, H, W = scene.K, scene.H, scene.W

    def step(state, images, poses, times, img_i, pixels, neighbor_time, rng):
        c2w = poses[img_i][:3, :4]
        rays_o, rays_d = get_rays_at(pixels, H, W, K, c2w)
        target = images[img_i][pixels[:, 0], pixels[:, 1]]
        t = jnp.full((pixels.shape[0], 1), times[img_i], jnp.float32)
        rays = build_rays(
            rays_o, rays_d, scene.near, scene.far,
            use_viewdirs=cfg.use_viewdirs, ndc=False, times=t,
        )
        if pass_neighbor:
            return train_step(state, rays, target, neighbor_time, rng)
        return train_step(state, rays, target, rng)

    if mesh is not None:
        from swnerf_tpu.parallel import shard_cli_step
        from swnerf_tpu.parallel.multihost import wrap_feeder

        return wrap_feeder(
            shard_cli_step(step, mesh, n_args=8, sharded_argnums=(5,),
                           state_shardings=state_shardings),
            mesh, sharded_argnums=(5,))
    return jax.jit(step, donate_argnums=(0,))


def steps_per_dispatch(default_tpu: int = 20) -> int:
    """How many train steps to fuse into one dispatch (lax.scan).

    One dispatch per step leaves the device idle during host round-trips —
    especially costly through remote tunnels; a K-step scan amortizes it
    (CLAUDE.md benchmarking note; the reference pays a full Python loop +
    kernel-launch round trip per step, run.py:635-700). Default: 20 on TPU,
    1 elsewhere (CPU tests keep single-step semantics). Override with
    SWNERF_STEPS_PER_DISPATCH."""
    env = os.environ.get("SWNERF_STEPS_PER_DISPATCH")
    if env:
        return max(1, int(env))
    return default_tpu if jax.devices()[0].platform == "tpu" else 1


def _scan_jit(step_k, mesh, sharded_argnums, n_args, state_shardings=None):
    """Jit a K-step scan wrapper; sharded args carry [K, N, ...] batches
    sharded on axis 1 (the rays axis). ``state_shardings`` keeps the train
    state model-sharded across the scan (tensor parallelism)."""
    if mesh is None:
        return jax.jit(step_k, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swnerf_tpu.parallel.mesh import RAYS_AXIS

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(None, RAYS_AXIS))
    in_sh = [shd if i in set(sharded_argnums) else rep for i in range(n_args)]
    out_sh = rep
    if state_shardings is not None:
        in_sh[0] = state_shardings
        out_sh = (state_shardings, rep)
    from swnerf_tpu.parallel.multihost import wrap_feeder

    return wrap_feeder(
        jax.jit(step_k, in_shardings=tuple(in_sh), out_shardings=out_sh,
                donate_argnums=(0,)),
        mesh, sharded_argnums=sharded_argnums, axis=1)


def make_pool_scan_step(train_step, cfg: RenderConfig, scene: Scene, mesh=None,
                        state_shardings=None):
    """K pool steps per dispatch: consumes idx [K, N_rand]; returns the
    final state and the LAST step's metrics (matching what a per-step loop
    would print at the chunk boundary)."""

    def step_k(state, pool, idx_k, rng):
        def body(st, idx):
            batch = pool[idx]
            rays_o, rays_d, target = batch[:, 0], batch[:, 1], batch[:, 2]
            rays = build_rays(
                rays_o, rays_d, scene.near, scene.far,
                use_viewdirs=cfg.use_viewdirs, ndc=scene.ndc,
                H=scene.H, W=scene.W, focal=scene.focal,
            )
            return train_step(st, rays, target, rng)

        state, ms = jax.lax.scan(body, state, idx_k)
        return state, jax.tree.map(lambda x: x[-1], ms)

    return _scan_jit(step_k, mesh, (2,), 4, state_shardings)


def make_image_scan_step(train_step, cfg: RenderConfig, scene: Scene, mesh=None,
                         state_shardings=None):
    """K per-image steps per dispatch: consumes img_i [K] and pixels
    [K, N_rand, 2] (host keeps the precrop curriculum / image choice)."""
    K = scene.K
    H, W = scene.H, scene.W

    def step_k(state, images, poses, img_i_k, pixels_k, rng):
        def body(st, x):
            img_i, pixels = x
            c2w = poses[img_i][:3, :4]
            rays_o, rays_d = get_rays_at(pixels, H, W, K, c2w)
            target = images[img_i][pixels[:, 0], pixels[:, 1]]
            rays = build_rays(
                rays_o, rays_d, scene.near, scene.far,
                use_viewdirs=cfg.use_viewdirs, ndc=scene.ndc,
                H=H, W=W, focal=scene.focal,
            )
            return train_step(st, rays, target, rng)

        state, ms = jax.lax.scan(body, state, (img_i_k, pixels_k))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return _scan_jit(step_k, mesh, (4,), 6, state_shardings)


def chunk_until_event(i: int, n_iters: int, k_max: int, cadences) -> int:
    """Largest k <= k_max such that steps i..i+k-1 cross no cadence boundary
    except at the chunk's END — so checkpoints/videos/logs land on exactly
    the same iterations as a single-step loop."""
    k = min(k_max, n_iters - i)
    for c in cadences:
        if c and c > 0:
            k = min(k, c - ((i - 1) % c))
    return max(1, k)


class DeadInitDetected(RuntimeError):
    """A watchdog-confirmed dead-density init draw, eligible for auto-restart
    (raised only when SWNERF_AUTO_RESEED budget remains — see
    ``auto_reseed_loop``)."""


def reseed_attempt() -> int:
    """Current auto-reseed attempt counter (0 = the original seed)."""
    return int(os.environ.get("SWNERF_RESEED_ATTEMPT", "0") or 0)


def seed_key(offset: int = 0):
    """The CLI PRNG root: PRNGKey(SWNERF_SEED + offset), folded with the
    auto-reseed attempt counter when an SWNERF_AUTO_RESEED restart is in
    flight. Deterministic: attempt k always derives the same key, so a
    recovered run is exactly reproducible with SWNERF_RESEED_ATTEMPT=k."""
    key = jax.random.PRNGKey(int(os.environ.get("SWNERF_SEED", "0")) + offset)
    attempt = reseed_attempt()
    if attempt:
        key = jax.random.fold_in(key, attempt)
    return key


def auto_reseed_loop(train_once, argv=None):
    """Run a trainer, restarting with a fold_in-derived init key when the
    DeadInitWatchdog confirms the dead-density draw.

    Opt-in via SWNERF_AUTO_RESEED=N (max restarts), bounded and
    deterministic. The reference has no equivalent: a negative density-bias
    draw has exactly zero gradients and silently wastes the run's full
    budget rendering the constant background (3/10 reference runs on the
    textured dynamic gate, PARITY_TORCH.md 'Seed pathology'; the reference's
    only remedy is the manual --raw_noise_std 1e0 flag). Restarts only
    happen before the first checkpoint is written (DeadInitWatchdog
    ``restart_until``), so auto-resume can never reload a dead attempt."""
    prev = os.environ.get("SWNERF_RESEED_ATTEMPT")
    budget = int(os.environ.get("SWNERF_AUTO_RESEED", "0") or 0)
    try:
        while True:
            try:
                return train_once(argv)
            except DeadInitDetected:
                attempt = reseed_attempt() + 1
                if attempt > budget:  # defensive; the watchdog pre-checks
                    raise
                print(
                    f"[AUTO-RESEED] attempt {attempt}/{budget}: reinitializing "
                    f"with fold_in(seed, {attempt}) and restarting from iter 0"
                )
                os.environ["SWNERF_RESEED_ATTEMPT"] = str(attempt)
    finally:
        if prev is None:
            os.environ.pop("SWNERF_RESEED_ATTEMPT", None)
        else:
            os.environ["SWNERF_RESEED_ATTEMPT"] = prev


class DeadInitWatchdog:
    """Warn once when a run's PSNR sits flat AT the constant-background floor.

    The torch-default / kaiming init leaves the density head's output at its
    bias on a per-seed coin flip; a negative draw is ReLU-dead with exactly
    zero gradients and the run renders the constant background forever
    (PERFORMANCE.md 'Seed pathology' — the reference shares the init and the
    failure mode; its documented remedy is ``--raw_noise_std 1e0``,
    regression-tested in tests/test_train.py). All four trainer families use
    the same density-head init, so every CLI feeds its printed PSNR here.

    The pathology is flatness AT the floor — a converged run that plateaus
    high must not trip this (the floor is ~11-14 dB on the reference scenes;
    a live run blows past 16 dB within the first few hundred iters).

    With ``restart_until`` > 0 (trainers pass their first-checkpoint
    iteration) and SWNERF_AUTO_RESEED budget remaining, detection raises
    :class:`DeadInitDetected` instead of warning so ``auto_reseed_loop``
    can reinitialize and restart — but only while no checkpoint exists yet,
    so a restart can never auto-resume the dead attempt's weights.
    """

    def __init__(self, print_cadence: int, min_iter: int = 500,
                 window: int = 8, floor_db: float = 16.0,
                 restart_until: int = 0):
        self.print_cadence = int(print_cadence) if print_cadence else 1
        # SWNERF_WATCHDOG_* are TEST-SCALE hooks: tiny scenes have a lower
        # constant-background floor and larger minibatch-PSNR noise than the
        # 400^2 product scenes the defaults are calibrated for.
        self.min_iter = int(os.environ.get("SWNERF_WATCHDOG_MIN_ITER", min_iter))
        self.window = window
        self.floor_db = float(os.environ.get("SWNERF_WATCHDOG_FLOOR", floor_db))
        self.spread_db = float(os.environ.get("SWNERF_WATCHDOG_SPREAD", 0.02))
        self.restart_until = restart_until
        self.history: list = []
        self.warned = False

    def check(self, i: int, psnr: float) -> None:
        self.history.append(float(psnr))
        del self.history[: -self.window]
        if self.warned or i < self.min_iter:
            return
        if (
            len(self.history) >= self.window
            and max(self.history) < self.floor_db
            and max(self.history) - min(self.history) < self.spread_db
        ):
            budget = int(os.environ.get("SWNERF_AUTO_RESEED", "0") or 0)
            if budget and reseed_attempt() < budget and i < self.restart_until:
                print(
                    f"[AUTO-RESEED] PSNR flat at {psnr:.2f} dB through iter {i} "
                    "— dead-density init confirmed; restarting with a "
                    "reseeded init (SWNERF_AUTO_RESEED)"
                )
                raise DeadInitDetected(f"dead init at iter {i} (psnr {psnr:.2f})")
            self.warned = True
            print(
                f"[WARN] PSNR has been flat at {psnr:.2f} dB for "
                f"{self.window * self.print_cadence} iters — this seed likely "
                "drew the dead-density init (zero gradients; the model renders "
                "the constant background). Restart with a different seed, add "
                "`--raw_noise_std 1e0` (the reference's remedy), or set "
                "SWNERF_SAFE_INIT=1 to remove the coin flip at the source "
                "(see PERFORMANCE.md 'Seed pathology')."
            )


# ---------------------------------------------------------------------------
# Path rendering + eval
# ---------------------------------------------------------------------------


def render_path(
    field: Field,
    params,
    fine_params,
    poses: np.ndarray,
    scene: Scene,
    cfg: RenderConfig,
    chunk: int,
    savedir: Optional[str] = None,
    render_factor: int = 0,
    times: Optional[np.ndarray] = None,
    save_also_gt: Optional[np.ndarray] = None,
    fine_field=None,
    mesh=None,
):
    """Render a pose path (reference render_path run.py:172-219). Returns
    (rgbs [T,H,W,3], disps [T,H,W]). With ``mesh``, each image's ray tiles
    shard over the devices (see render_image)."""
    H, W, focal = scene.H, scene.W, scene.focal
    K = scene.K
    if render_factor != 0:
        H, W = H // render_factor, W // render_factor
        focal = focal / render_factor
        K = K / render_factor
        K[2, 2] = 1.0

    ecfg = cfg.eval_mode()
    rgbs, disps = [], []
    t0 = time.time()
    for i, c2w in enumerate(poses):
        t = None if times is None else float(times[i])
        rays = make_rays_from_camera(
            H, W, K, c2w[:3, :4], scene.near, scene.far,
            use_viewdirs=ecfg.use_viewdirs, ndc=scene.ndc, time=t,
        )
        out = render_image(
            field, params, rays, ecfg, chunk=chunk, fine_params=fine_params,
            fine_field=fine_field, mesh=mesh,
        )
        rgb = np.asarray(out["rgb"]).reshape(H, W, 3)
        disp = np.asarray(out["disp"]).reshape(H, W)
        rgbs.append(rgb)
        disps.append(disp)
        if savedir is not None:
            write_png(os.path.join(savedir, f"{i:03d}.png"), rgb)
            if save_also_gt is not None:
                write_png(os.path.join(savedir, f"gt_{i:03d}.png"), save_also_gt[i])
        print(f"render_path {i}/{len(poses)} {time.time() - t0:.2f}s", flush=True)
        t0 = time.time()
    return np.stack(rgbs), np.stack(disps)


def render_only(
    field, params, fine_params, scene: Scene, cfg: RenderConfig, args, start: int,
    fine_field=None, mesh=None,
) -> str:
    """The --render_only path (run.py:557-596): render test poses or the
    spiral path, write video + PNGs, and metrics.json when GT is known."""
    suffix = "test" if args.render_test else "path"
    savedir = os.path.join(args.basedir, args.expname, f"renderonly_{suffix}_{start:06d}")
    os.makedirs(savedir, exist_ok=True)

    gt = scene.images[scene.i_test] if args.render_test else None
    rgbs, _ = render_path(
        field, params, fine_params, scene.render_poses, scene, cfg,
        chunk=args.chunk, savedir=savedir, render_factor=args.render_factor,
        times=scene.render_times, fine_field=fine_field, mesh=mesh,
    )
    write_video(os.path.join(savedir, "video.mp4"), rgbs)

    if gt is not None and args.render_factor == 0:
        psnrs, ssims, lpipss = [], [], []
        for g, p in zip(gt, rgbs):
            a, b, c = calculate_metrics(g, p)
            psnrs.append(a)
            ssims.append(b)
            lpipss.append(c)
        payload = {"psnr": psnrs, "ssim": ssims, "lpips": lpipss}
        if any(v is None for v in lpipss):
            from swnerf_tpu.utils.metrics import LPIPS_UNAVAILABLE_NOTE

            payload["lpips_note"] = LPIPS_UNAVAILABLE_NOTE
        with open(os.path.join(savedir, "metrics.json"), "w") as f:
            json.dump(payload, f, indent=4)
    return savedir
