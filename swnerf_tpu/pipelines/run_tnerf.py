"""T-NeRF trainer CLI (single time-conditioned field, no fine pass).

Usage parity with the reference (`python t_nerf/run_tnerf.py --config
configs/<scene>.txt`): dnerf flag set, dynamic blender loader,
N_importance forced to 0 (reference run_tnerf.py:329 sets it in
render_kwargs regardless of the flag), single-network checkpoint schema
(run_tnerf.py:719-728). The training loop is the dnerf skeleton without the
deformation/TV machinery — here it is literally the same step factory with a
TNeRF field, demonstrating the single-render-core design.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import TNeRFConfig, make_tnerf_field
from swnerf_tpu.pipelines.common import (
    DeadInitWatchdog,
    ImageSampler,
    auto_reseed_loop,
    load_scene,
    render_path,
    seed_key,
)
from swnerf_tpu.pipelines.run_dnerf import make_dnerf_step
from swnerf_tpu.render.core import RenderConfig
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.checkpoint import (
    adam_to_torch_dict,
    ckpt_format,
    find_checkpoints,
    load_tar,
    maybe_save_native,
    params_to_state_dict,
    save_tar,
    tar_enabled,
    try_native_resume,
    state_dict_to_params,
    torch_dict_to_adam,
)
from swnerf_tpu.train.loop import TrainState, exp_decay_schedule, init_train_state
from swnerf_tpu.utils.config import config_parser_dnerf
from swnerf_tpu.utils.logging import ExperimentLogger, snapshot_args
from swnerf_tpu.utils.media import write_video


def create_tnerf(args):
    """TNeRF(depth=netdepth, net_dim=128, skip_layer=4) as wired by the
    reference (run_tnerf.py:264-280), with .tar auto-resume."""
    mcfg = TNeRFConfig(
        netdepth=args.netdepth,
        net_dim=128,
        skip_layer=4,
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
    )
    field = make_tnerf_field(mcfg)
    params = {"coarse": field.init(seed_key()), "fine": None}

    rcfg = RenderConfig(
        n_samples=args.N_samples,
        n_importance=0,  # forced: single model (run_tnerf.py:329)
        perturb=args.perturb,
        lindisp=args.lindisp,
        raw_noise_std=args.raw_noise_std,
        white_bkgd=args.white_bkgd,
        use_viewdirs=True,  # TNeRF always consumes view dirs (model.py:204)
    )

    optimizer = make_optimizer(args.lrate, args.lrate_decay)
    state = init_train_state(params, optimizer)

    start = 0
    ckpt_format()  # fail fast on a typo'd SWNERF_CKPT_FORMAT, not at first save
    ckpts = find_checkpoints(args.basedir, args.expname, args.ft_path)
    native = try_native_resume(ckpts, args.no_reload, state)
    if native is not None:
        state, start = native
        return field, rcfg, optimizer, state, start, mcfg
    if ckpts and not args.no_reload:
        print("Reloading from", ckpts[-1])
        ckpt = load_tar(ckpts[-1])
        start = int(ckpt["global_step"])
        params["coarse"] = state_dict_to_params("tnerf", ckpt["network_fn_state_dict"], params["coarse"])
        opt_state, _ = torch_dict_to_adam(
            ckpt["optimizer_state_dict"], params, [("tnerf", "coarse")], state.opt_state
        )
        state = TrainState(jnp.asarray(start, jnp.int32), params, opt_state)
    return field, rcfg, optimizer, state, start, mcfg


def save_tnerf_ckpt(args, state: TrainState, i: int):
    """.tar with the tnerf schema (run_tnerf.py:719-728), and/or the native
    flax-msgpack snapshot (SWNERF_CKPT_FORMAT=tar|native|both)."""
    path = os.path.join(args.basedir, args.expname, f"{i:06d}.tar")
    if tar_enabled():
        lr = float(exp_decay_schedule(args.lrate, args.lrate_decay)(i))
        save_tar(
            path,
            {
                "global_step": i,
                "network_fn_state_dict": params_to_state_dict("tnerf", state.params["coarse"]),
                "optimizer_state_dict": adam_to_torch_dict(
                    state.opt_state, state.params, [("tnerf", "coarse")], lr
                ),
            },
        )
        print("Saved checkpoints at", path)
    maybe_save_native(path, state, i)


def train(argv=None):
    """Product entry. SWNERF_AUTO_RESEED=N recovers watchdog-confirmed
    dead-density init draws via a fold_in-derived restart
    (common.auto_reseed_loop); the reference has no equivalent."""
    return auto_reseed_loop(_train_impl, argv)


def _train_impl(argv=None):
    from swnerf_tpu.parallel.multihost import initialize_from_env

    initialize_from_env()  # multi-process opt-in; no-op single-host
    args = config_parser_dnerf().parse_args(argv)
    if args.dataset_type != "blender":
        raise ValueError(f"Unknown dataset type {args.dataset_type!r} (tnerf supports blender)")

    args.dataset_type = "blender_dnerf"
    scene = load_scene(args)
    args.dataset_type = "blender"

    os.makedirs(os.path.join(args.basedir, args.expname), exist_ok=True)
    snapshot_args(args.basedir, args.expname, args, args.config)

    field, rcfg, optimizer, state, start, mcfg = create_tnerf(args)

    from swnerf_tpu.parallel import data_parallel_mesh, replicate

    tp = int(os.environ.get("SWNERF_TENSOR_PARALLEL", "0") or 0)
    tp_shardings = None
    if tp > 1:
        from swnerf_tpu.parallel import tensor_parallel_setup

        mesh, tp_shardings, state = tensor_parallel_setup(state, args.N_rand, tp)
    else:
        mesh = data_parallel_mesh(args.N_rand)

    def host_coarse(state):
        # Eval/render-time params: TP runs gather the shards once per call.
        if tp_shardings is None:
            return state.params["coarse"]
        return jax.device_get(state.params["coarse"])

    if args.render_only:
        print("RENDER ONLY")
        suffix = "test" if args.render_test else "path"
        savedir = os.path.join(args.basedir, args.expname, f"renderonly_{suffix}_{start:06d}")
        rgbs, disps = render_path(
            field, host_coarse(state), None, scene.render_poses, scene, rcfg,
            chunk=args.chunk, savedir=savedir, render_factor=args.render_factor,
            times=scene.render_times, mesh=mesh,
        )
        write_video(os.path.join(savedir, "video.mp4"), rgbs)
        return

    logger = ExperimentLogger(args.basedir, args.expname)
    sampler = ImageSampler(
        scene, args.N_rand, args.precrop_iters, args.precrop_frac,
        precrop_iters_time=args.precrop_iters_time,
    )
    # Fused single-kernel T-NeRF step on TPU (train/fused_step.py):
    # ELU trunk + in-kernel [embed(xyz)|embed(t)] encoding + compositing +
    # MSE + backward in one Pallas pass. Same gating as run_nerf.
    from swnerf_tpu.pipelines.common import make_time_image_step
    from swnerf_tpu.train.fused_step import (
        make_fused_tnerf_step,
        supports_fused_tnerf_step,
    )

    interp = os.environ.get("SWNERF_FUSED_STEP") == "force-interpret"
    use_fused_step = tp_shardings is None and supports_fused_tnerf_step(mcfg, rcfg) and (
        interp
        or (
            jax.devices()[0].platform == "tpu"
            and os.environ.get("SWNERF_FUSED", "1") != "0"
            and os.environ.get("SWNERF_FUSED_STEP", "1") != "0"
            and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
        )
    )
    if use_fused_step:
        inner = make_fused_tnerf_step(
            mcfg, rcfg, optimizer,
            interpret=interp,
            compute_dtype=jnp.float32 if interp else jnp.bfloat16,
            axis_name=None if mesh is None else "rays",
        )
        if mesh is not None:
            from swnerf_tpu.parallel.mesh import shard_map_train_step

            inner = shard_map_train_step(inner, mesh)
        step_fn = make_time_image_step(inner, rcfg, scene, mesh=mesh)
        print("Using the fused T-NeRF train step")
    else:
        step_fn = make_dnerf_step(
            field, rcfg, optimizer, scene, add_tv_loss=False, tv_loss_weight=0.0,
            mesh=mesh, state_shardings=tp_shardings,
        )

    # K steps per dispatch (lax.scan over the same CLI-signature step):
    # at ~650 it/s for the fused single-pass step the per-step dispatch
    # through the remote tunnel would dominate the live loop.
    from swnerf_tpu.pipelines.common import chunk_until_event, steps_per_dispatch
    from swnerf_tpu.pipelines.run_dnerf import make_dnerf_scan_step

    k_disp = steps_per_dispatch()
    if k_disp > 1:
        scan_fn = make_dnerf_scan_step(
            field, rcfg, optimizer, scene, False, 0.0, mesh=mesh,
            inner_raw=step_fn.__wrapped__, state_shardings=tp_shardings,
        )

    images_dev = jnp.asarray(scene.images)
    poses_dev = jnp.asarray(scene.poses)
    times_dev = jnp.asarray(scene.times)
    if mesh is not None:
        images_dev, poses_dev, times_dev = replicate(
            mesh, (images_dev, poses_dev, times_dev)
        )
        if tp_shardings is None:
            state = replicate(mesh, state)
    base_rng = seed_key(1)

    n_iters = int(os.environ.get("SWNERF_MAX_ITERS", args.N_iter + 1))
    samples_per_step = args.N_rand * rcfg.n_samples

    # Restarts only before the first checkpoint and never on a resume.
    watchdog = DeadInitWatchdog(
        args.i_print, restart_until=args.i_weights if start == 0 else 0
    )

    def flush_pending(pending):
        # One-boundary-behind metric fetch (see run_nerf.py flush_pending).
        if pending is None:
            return
        j, met = pending
        m = {k: float(v) for k, v in met.items()}
        logger.scalars(j, m)
        logger.throughput(j, samples_per_step, jax.device_count(), synced=k_disp > 1)
        print(f"[TRAIN] Iter: {j} Loss: {m['loss']:.6f} PSNR: {m['psnr']:.3f}")
        watchdog.check(j, m["psnr"])

    cadences = (args.i_weights, args.i_print, args.i_video, args.i_testset)

    print("Begin")
    pending = None
    metrics = {}
    i = start + 1
    while i < n_iters:
        k = chunk_until_event(i, n_iters, k_disp, cadences) if k_disp > 1 else 1
        if k == 1:
            img_i, pixels = sampler.next(i)
            state, metrics = step_fn(
                state, images_dev, poses_dev, times_dev, img_i,
                jnp.asarray(pixels), jnp.float32(0.0), base_rng,
            )
        else:
            picks = [sampler.next(i + j) for j in range(k)]
            img_i_k = np.asarray([p[0] for p in picks], np.int32)
            pixels_k = np.stack([p[1] for p in picks])
            neighbor_k = np.zeros((k,), np.float32)
            state, metrics = scan_fn(
                state, images_dev, poses_dev, times_dev, jnp.asarray(img_i_k),
                jnp.asarray(pixels_k), jnp.asarray(neighbor_k), base_rng,
            )
        i = i + k - 1

        if i % args.i_weights == 0:
            save_tnerf_ckpt(args, state, i)

        if i % args.i_print == 0:
            flush_pending(pending)
            pending = (i, metrics)

        if i % args.i_video == 0 and i > 0:
            savedir = os.path.join(
                args.basedir, args.expname, f"frames_{args.expname}_spiral_{i:06d}_time"
            )
            rgbs, disps = render_path(
                field, host_coarse(state), None, scene.render_poses, scene, rcfg,
                args.chunk, savedir=savedir, times=scene.render_times, mesh=mesh,
            )
            base = os.path.join(args.basedir, args.expname, f"{args.expname}_spiral_{i:06d}_")
            write_video(base + "rgb.mp4", rgbs)
            write_video(base + "disp.mp4", disps / np.max(disps))

        if i % args.i_testset == 0 and i > 0 and len(scene.i_test):
            testsavedir = os.path.join(args.basedir, args.expname, f"testset_{i:06d}")
            render_path(
                field, host_coarse(state), None, scene.poses[scene.i_test], scene,
                rcfg, args.chunk, savedir=testsavedir, times=scene.times[scene.i_test],
                mesh=mesh,
            )
            print("Saved test set")

        i += 1

    flush_pending(pending)
    logger.close()
    return {k: float(v) for k, v in metrics.items()}


if __name__ == "__main__":
    train()
