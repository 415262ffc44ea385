"""Vanilla NeRF trainer CLI.

Usage parity with the reference (`python nerf/run.py --config
configs/<scene>.txt [--render_only --render_test ...]`, README.md:10-30):
same flags (utils.py:16-99), same artifact layout (logs/<exp>/args.txt,
{iter:06d}.tar checkpoints, <exp>_spiral_{iter}_rgb.mp4 videos,
testset_{iter}/ dumps, renderonly_*/metrics.json), same schedule constants
(fixed 200 001 iterations, run.py:625).

TPU-first deltas: one jitted train step (sampling + both field passes +
loss + Adam fused, params donated); ray generation only at sampled pixels;
device-resident ray pool with host-side permutation walking; lax.map tiled
eval rendering; steps/sec + ray-samples/sec/chip throughput logging.
SWNERF_MAX_ITERS / SWNERF_DISABLE_JIT_CACHE env vars exist for testing only.
"""

from __future__ import annotations

import os
import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.pipelines.common import (
    DeadInitWatchdog,
    ImageSampler,
    RayPoolSampler,
    auto_reseed_loop,
    load_scene,
    make_image_step,
    make_pool_step,
    render_only,
    render_path,
    seed_key,
)
from swnerf_tpu.render.core import RenderConfig
from swnerf_tpu.train import make_optimizer, make_train_step
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
from swnerf_tpu.utils.config import config_parser
from swnerf_tpu.utils.logging import ExperimentLogger, snapshot_args
from swnerf_tpu.utils.media import write_video

N_ITERS = 200000 + 1  # fixed in the vanilla runner (reference run.py:625)


def create_vanilla(args):
    """Field + params + render config from CLI args (reference create_nerf,
    run.py:222-311), with .tar auto-resume."""
    output_ch = 5 if args.N_importance > 0 else 4
    mcfg = VanillaNeRFConfig(
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        skips=(4,),
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
        use_viewdirs=args.use_viewdirs,
        output_ch=output_ch,
    )
    field = make_vanilla_field(mcfg)
    fine_field = None
    fcfg = None
    key = seed_key()
    k1, k2 = jax.random.split(key)
    params = {"coarse": field.init(k1), "fine": None}
    if args.N_importance > 0:
        # Distinct fine-network dims (--netdepth_fine/--netwidth_fine,
        # reference run.py:236-246) get their own Field so the fine pass
        # really runs the fine architecture.
        fcfg = VanillaNeRFConfig(
            netdepth=args.netdepth_fine,
            netwidth=args.netwidth_fine,
            skips=(4,),
            multires=args.multires,
            multires_views=args.multires_views,
            i_embed=args.i_embed,
            use_viewdirs=args.use_viewdirs,
            output_ch=output_ch,
        )
        fine_field = make_vanilla_field(fcfg)
        params["fine"] = fine_field.init(k2)

    rcfg = RenderConfig(
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb,
        lindisp=args.lindisp,
        raw_noise_std=args.raw_noise_std,
        white_bkgd=args.white_bkgd,
        use_viewdirs=args.use_viewdirs,
    )

    optimizer = make_optimizer(args.lrate, args.lrate_decay)
    state = init_train_state(params, optimizer)

    start = 0
    ckpt_format()  # fail fast on a typo'd SWNERF_CKPT_FORMAT, not at first save
    ckpts = find_checkpoints(args.basedir, args.expname, args.ft_path)
    native = try_native_resume(ckpts, args.no_reload, state)
    if native is not None:
        state, start = native
        return field, fine_field, rcfg, optimizer, state, start, (mcfg, fcfg)
    if ckpts and not args.no_reload:
        print("Reloading from", ckpts[-1])
        ckpt = load_tar(ckpts[-1])
        start = int(ckpt["global_step"])
        params = dict(params)
        params["coarse"] = state_dict_to_params(
            "vanilla", ckpt["network_fn_state_dict"], params["coarse"]
        )
        groups = [("vanilla", "coarse")]
        if params["fine"] is not None and ckpt.get("network_fine_state_dict"):
            params["fine"] = state_dict_to_params(
                "vanilla", ckpt["network_fine_state_dict"], params["fine"]
            )
            groups.append(("vanilla", "fine"))
        opt_state, _ = torch_dict_to_adam(
            ckpt["optimizer_state_dict"], params, groups, state.opt_state
        )
        state = TrainState(jnp.asarray(start, jnp.int32), params, opt_state)

    return field, fine_field, rcfg, optimizer, state, start, (mcfg, fcfg)


def save_vanilla_ckpt(args, state: TrainState, i: int):
    """.tar with the vanilla schema (run.py:717-723), and/or the native
    flax-msgpack snapshot (SWNERF_CKPT_FORMAT=tar|native|both)."""
    path = os.path.join(args.basedir, args.expname, f"{i:06d}.tar")
    if tar_enabled():
        groups = [("vanilla", "coarse")]
        payload = {
            "global_step": i,
            "network_fn_state_dict": params_to_state_dict("vanilla", state.params["coarse"]),
        }
        if state.params["fine"] is not None:
            payload["network_fine_state_dict"] = params_to_state_dict(
                "vanilla", state.params["fine"]
            )
            groups.append(("vanilla", "fine"))
        lr = float(exp_decay_schedule(args.lrate, args.lrate_decay)(i))
        payload["optimizer_state_dict"] = adam_to_torch_dict(
            state.opt_state, state.params, groups, lr
        )
        save_tar(path, payload)
        print("Saved checkpoints at", path)
    maybe_save_native(path, state, i)


def train(argv=None):
    """Product entry. With SWNERF_AUTO_RESEED=N set, a watchdog-confirmed
    dead-density init draw restarts training (≤N times) with a
    fold_in-derived key — see common.auto_reseed_loop; the reference
    (run.py:426) has no recovery for this pathology."""
    return auto_reseed_loop(_train_impl, argv)


def _train_impl(argv=None):
    # Opt-in multi-process init (SWNERF_COORDINATOR et al.) before the first
    # device query; a no-op on every single-host run (parallel/multihost.py).
    from swnerf_tpu.parallel.multihost import initialize_from_env

    initialize_from_env()
    args = config_parser().parse_args(argv)
    scene = load_scene(args)

    os.makedirs(os.path.join(args.basedir, args.expname), exist_ok=True)
    snapshot_args(args.basedir, args.expname, args, args.config)

    field, fine_field, rcfg, optimizer, state, start, (mcfg, fcfg) = create_vanilla(args)

    # Rays-mesh data parallelism whenever >1 device is visible: training
    # shards the pixel/index batch, eval shards render tiles (SURVEY.md §2.7
    # greenfield mandate; SWNERF_DATA_PARALLEL=0 opts out).
    # SWNERF_TENSOR_PARALLEL=k adds k-way Megatron-style weight sharding on
    # a 2-D (rays, model) mesh for scaled-up --netwidth fields
    # (parallel/tensor.py; the reference is single-GPU either way).
    from swnerf_tpu.parallel import data_parallel_mesh, replicate

    tp = int(os.environ.get("SWNERF_TENSOR_PARALLEL", "0") or 0)
    tp_shardings = None
    if tp > 1:
        from swnerf_tpu.parallel import tensor_parallel_setup

        mesh, tp_shardings, state = tensor_parallel_setup(state, args.N_rand, tp)
    else:
        mesh = data_parallel_mesh(args.N_rand)

    def host_params(state):
        """Eval/render-time params: tensor-parallel runs gather the shards
        once per eval call (the render path manages its own placement)."""
        if tp_shardings is None:
            return state.params["coarse"], state.params["fine"]
        return jax.device_get((state.params["coarse"], state.params["fine"]))

    if args.render_only:
        print("RENDER ONLY")
        pc, pf = host_params(state)
        savedir = render_only(
            field, pc, pf, scene, rcfg, args, start,
            fine_field=fine_field, mesh=mesh,
        )
        print("Done rendering", savedir)
        return

    if os.environ.get("SWNERF_DEBUG_NANS") == "1":
        # Opt-in analog of the reference's always-on anomaly detection
        # (utils.py:2) — a perf foot-gun there, a debug switch here.
        from swnerf_tpu.utils.logging import enable_debug_nans

        enable_debug_nans(True)

    from swnerf_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler()
    logger = ExperimentLogger(args.basedir, args.expname)
    # The two-kernel fused train step (coarse render-loss kernel -> Pallas
    # sample_pdf -> fine render-loss kernel, gradients computed in-VMEM) is
    # the flagship-performance path on TPU (train/fused_step.py;
    # PERFORMANCE.md). Falls back to the autodiff step off-TPU, for
    # unsupported architectures, or with SWNERF_FUSED_STEP=0 / SWNERF_FUSED=0.
    from swnerf_tpu.train.fused_step import make_fused_train_step, supports_fused_step

    interp = os.environ.get("SWNERF_FUSED_STEP") == "force-interpret"
    use_fused_step = tp_shardings is None and supports_fused_step(mcfg, fcfg, rcfg) and (
        interp
        or (
            jax.devices()[0].platform == "tpu"
            and os.environ.get("SWNERF_FUSED", "1") != "0"
            and os.environ.get("SWNERF_FUSED_STEP", "1") != "0"
            and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
        )
    )
    if use_fused_step:
        if mesh is not None:
            from swnerf_tpu.parallel.mesh import RAYS_AXIS, shard_map_train_step

            train_step = shard_map_train_step(
                make_fused_train_step(
                    mcfg, rcfg, optimizer, fcfg=fcfg, axis_name=RAYS_AXIS,
                    interpret=interp,
                    compute_dtype=jnp.float32 if interp else jnp.bfloat16,
                ),
                mesh,
            )
        else:
            train_step = make_fused_train_step(
                mcfg, rcfg, optimizer, fcfg=fcfg, interpret=interp,
                compute_dtype=jnp.float32 if interp else jnp.bfloat16,
            )
        print("Using the fused two-kernel train step")
    else:
        train_step = make_train_step(field, rcfg, optimizer, fine_field=fine_field)

    # Precision warm-start: SWNERF_FUSED_DTYPE_SCHEDULE=f32@K runs the f32
    # autodiff step for iters 1..K, then switches to the fused bf16 step.
    # Both consume the same TrainState (params stay f32 in both paths; only
    # the compute dtype differs), so the switch is pure dispatch. Motivation:
    # bf16's measured -1.3 to -2.2 dB early-convergence lag at 5k iters in
    # the 31 dB LLFF regime (PERFORMANCE.md 'bf16 early-convergence lag'),
    # at ~15% of a 10k run's wall clock for K=2000.
    warm_until = 0
    warm_train_step = None
    sched = os.environ.get("SWNERF_FUSED_DTYPE_SCHEDULE", "")
    if sched and use_fused_step:
        kind, _, at = sched.partition("@")
        if kind != "f32" or not at.isdigit():
            raise ValueError(
                f"SWNERF_FUSED_DTYPE_SCHEDULE={sched!r}: expected 'f32@<iters>'"
            )
        warm_until = int(at)
        warm_train_step = make_train_step(field, rcfg, optimizer, fine_field=fine_field)
        print(f"Precision warm-start: f32 autodiff step through iter {warm_until}, "
              "fused bf16 step after")
    base_rng = seed_key(1)

    # K steps per dispatch: a lax.scan inside one jit amortizes the per-step
    # host round-trip (the reference pays one Python-loop + launch round
    # trip per iteration, run.py:635-700). K=1 keeps exact single-step
    # semantics (CPU default); on TPU the default is 20.
    from swnerf_tpu.pipelines.common import (
        chunk_until_event,
        make_image_scan_step,
        make_pool_scan_step,
        steps_per_dispatch,
    )

    k_disp = steps_per_dispatch()
    use_batching = not args.no_batching
    scan_fn = warm_step_fn = warm_scan_fn = None
    if use_batching:
        sampler = RayPoolSampler(scene, args.N_rand)
        step_fn = make_pool_step(train_step, rcfg, scene, mesh=mesh,
                                 state_shardings=tp_shardings)
        if k_disp > 1:
            scan_fn = make_pool_scan_step(train_step, rcfg, scene, mesh=mesh,
                                          state_shardings=tp_shardings)
        if warm_train_step is not None:
            warm_step_fn = make_pool_step(warm_train_step, rcfg, scene, mesh=mesh,
                                          state_shardings=tp_shardings)
            if k_disp > 1:
                warm_scan_fn = make_pool_scan_step(
                    warm_train_step, rcfg, scene, mesh=mesh,
                    state_shardings=tp_shardings)
        if mesh is not None:
            sampler.pool = replicate(mesh, sampler.pool)
    else:
        sampler = ImageSampler(scene, args.N_rand, args.precrop_iters, args.precrop_frac)
        step_fn = make_image_step(train_step, rcfg, scene, mesh=mesh,
                                  state_shardings=tp_shardings)
        if k_disp > 1:
            scan_fn = make_image_scan_step(train_step, rcfg, scene, mesh=mesh,
                                           state_shardings=tp_shardings)
        if warm_train_step is not None:
            warm_step_fn = make_image_step(warm_train_step, rcfg, scene, mesh=mesh,
                                           state_shardings=tp_shardings)
            if k_disp > 1:
                warm_scan_fn = make_image_scan_step(
                    warm_train_step, rcfg, scene, mesh=mesh,
                    state_shardings=tp_shardings)
        images_dev = jnp.asarray(scene.images)
        poses_dev = jnp.asarray(scene.poses[:, :3, :4])
        if mesh is not None:
            images_dev, poses_dev = replicate(mesh, (images_dev, poses_dev))
    if mesh is not None and tp_shardings is None:
        state = replicate(mesh, state)

    n_iters = int(os.environ.get("SWNERF_MAX_ITERS", N_ITERS))
    samples_per_step = args.N_rand * (
        rcfg.n_samples + (rcfg.n_samples + rcfg.n_importance if rcfg.n_importance else 0)
    )
    # warm_until is a chunk boundary too, so no dispatch mixes dtypes.
    cadences = (args.i_weights, args.i_video, args.i_testset, args.i_print, warm_until)

    print("Training Begin")
    print("TRAIN views are", scene.i_train)
    print("TEST views are", scene.i_test)

    # Auto-reseed restarts are only legal before the first checkpoint
    # exists (and never on a resumed run), so auto-resume can't reload a
    # dead attempt's weights.
    watchdog = DeadInitWatchdog(
        args.i_print, restart_until=args.i_weights if start == 0 else 0
    )

    def flush_pending(pending):
        """Fetch + log the PREVIOUS boundary's metrics. Deferring the fetch
        one print interval keeps the device pipeline full: fetching the
        just-dispatched step blocks until the queue drains and the refill
        bubble costs ~20% at i_print=50 through the remote tunnel
        (PERFORMANCE.md)."""
        if pending is None:
            return
        j, met = pending
        m = {k: float(v) for k, v in met.items()}
        logger.scalars(j, m)
        tp = logger.throughput(j, samples_per_step, jax.device_count(), synced=k_disp > 1)
        rate = ""
        if "ray_samples_per_sec_per_chip" in tp:
            rate = f" {tp['ray_samples_per_sec_per_chip']/1e6:.2f}M samp/s/chip"
        elif "ray_samples_per_sec_per_chip_enqueue" in tp:
            rate = f" {tp['ray_samples_per_sec_per_chip_enqueue']/1e6:.2f}M samp/s/chip (enqueue)"
        print(f"[TRAIN] Iter: {j} Loss: {m['total_loss']:.6f}  PSNR: {m['psnr']:.3f}{rate}")
        watchdog.check(j, m["psnr"])

    pending = None
    metrics = {}
    i = start + 1
    while i < n_iters:
        # Chunks never cross a checkpoint/video/testset/print boundary, so
        # every artifact lands on the same iteration as a per-step loop.
        k = chunk_until_event(i, n_iters, k_disp, cadences) if k_disp > 1 else 1
        profiler.step(i, start)
        # Warm-start dispatch: the whole chunk i..i+k-1 is on one side of
        # warm_until (it's in cadences), so this is a per-chunk choice.
        warm = i <= warm_until
        sf = warm_step_fn if warm else step_fn
        scf = warm_scan_fn if warm else scan_fn
        if use_batching:
            if k == 1:
                idx = jnp.asarray(sampler.next_indices())
                state, metrics = sf(state, sampler.pool, idx, base_rng)
            else:
                idx_k = np.stack([sampler.next_indices() for _ in range(k)])
                state, metrics = scf(state, sampler.pool, jnp.asarray(idx_k), base_rng)
        else:
            if k == 1:
                img_i, pixels = sampler.next(i)
                state, metrics = sf(
                    state, images_dev, poses_dev, img_i, jnp.asarray(pixels), base_rng
                )
            else:
                picks = [sampler.next(i + j) for j in range(k)]
                img_i_k = np.asarray([p[0] for p in picks], np.int32)
                pixels_k = np.stack([p[1] for p in picks])
                state, metrics = scf(
                    state, images_dev, poses_dev, jnp.asarray(img_i_k),
                    jnp.asarray(pixels_k), base_rng,
                )
        i = i + k - 1  # the chunk's last completed iteration

        if i % args.i_weights == 0:
            save_vanilla_ckpt(args, state, i)

        if i % args.i_video == 0 and i > 0:
            pc, pf = host_params(state)
            rgbs, disps = render_path(
                field, pc, pf,
                scene.render_poses, scene, rcfg, args.chunk, fine_field=fine_field,
                mesh=mesh,
            )
            base = os.path.join(args.basedir, args.expname, f"{args.expname}_spiral_{i:06d}_")
            write_video(base + "rgb.mp4", rgbs)
            write_video(base + "disp.mp4", disps / np.max(disps))

        if i % args.i_testset == 0 and i > 0 and len(scene.i_test):
            testsavedir = os.path.join(args.basedir, args.expname, f"testset_{i:06d}")
            os.makedirs(testsavedir, exist_ok=True)
            pc, pf = host_params(state)
            render_path(
                field, pc, pf,
                scene.poses[scene.i_test], scene, rcfg, args.chunk, savedir=testsavedir,
                fine_field=fine_field, mesh=mesh,
            )
            print("Saved test set")

        if i % args.i_print == 0:
            flush_pending(pending)
            pending = (i, metrics)

        i += 1

    flush_pending(pending)
    profiler.close()
    logger.close()
    return {k: float(v) for k, v in metrics.items()}


if __name__ == "__main__":
    train()
