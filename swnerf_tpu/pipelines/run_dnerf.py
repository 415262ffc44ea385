"""D-NeRF trainer CLI (deformation-field dynamic NeRF).

Usage parity with the reference (`python d_nerf/run_dnerf.py --config
configs/bouncingballs.txt`): dnerf flag set (utils.py:101-237), dynamic
blender loader with per-frame times, time curriculum
(run_dnerf.py:650-655), the TV temporal-smoothness loss that re-renders the
same rays at a random interpolated neighbor time with frozen z_vals and
penalizes squared deformation differences (run_dnerf.py:690-725), shared- or
two-model hierarchical rendering (run_dnerf.py:441-453), dnerf checkpoint
schema (run_dnerf.py:757-769), frames_*_spiral_*_time/ video dumps, and the
live render_only path (fixed pose, 120-step time sweep -> time_only/;
the post-return block at run_dnerf.py:583-593 is dead code and not ported).

Notes vs the reference (recorded deltas):
  * reference TV loss with use_two_models_for_fine would KeyError
    (extras_prev never contains position_delta_0, run_dnerf.py:719-724);
    we apply the TV term to the final pass deformation only.
  * ``--do_half_precision`` maps to bf16 matmul inputs (TPU native mixed
    precision) instead of apex AMP.
"""

from __future__ import annotations

import os
import numpy as np
import jax
import jax.numpy as jnp
import optax

from swnerf_tpu.models import DNeRFConfig, make_dnerf_field, make_nerf_original_field
from swnerf_tpu.pipelines.common import (
    DeadInitWatchdog,
    ImageSampler,
    auto_reseed_loop,
    load_scene,
    render_path,
    seed_key,
)
from swnerf_tpu.render.core import RenderConfig, Rays, render_rays
from swnerf_tpu.train import make_optimizer, mse, mse_to_psnr
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


def create_dnerf(args):
    """Field + params + render config (reference create_nerf,
    run_dnerf.py:238-351), with .tar auto-resume."""
    # --do_half_precision (reference apex AMP O1, run_dnerf.py:290-296) maps
    # to bf16 matmul inputs, scoped to THIS pipeline's fields via the config
    # (no global state mutated — safe under in-process composition).
    half_prec = jax.lax.Precision.DEFAULT if args.do_half_precision else None
    mcfg = DNeRFConfig(
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        skips=(4,),
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
        use_viewdirs=args.use_viewdirs,
        output_ch=5 if args.N_importance > 0 else 4,
        zero_canonical=not args.not_zero_canonical,
        precision=half_prec,
    )
    kind = args.nerf_type
    if kind == "original":
        field = make_nerf_original_field(mcfg)
    elif kind == "direct_temporal":
        field = make_dnerf_field(mcfg)
    else:
        raise ValueError(f"nerf_type {kind!r} not recognized")

    key = seed_key()
    k1, k2 = jax.random.split(key)
    params = {"coarse": field.init(k1), "fine": None}
    ffield = None
    if args.use_two_models_for_fine:
        fcfg = DNeRFConfig(
            netdepth=args.netdepth_fine,
            netwidth=args.netwidth_fine,
            skips=(4,),
            multires=args.multires,
            multires_views=args.multires_views,
            i_embed=args.i_embed,
            use_viewdirs=args.use_viewdirs,
            output_ch=5 if args.N_importance > 0 else 4,
            zero_canonical=not args.not_zero_canonical,
            precision=half_prec,
        )
        ffield = make_dnerf_field(fcfg) if kind == "direct_temporal" else make_nerf_original_field(fcfg)
        params["fine"] = ffield.init(k2)

    rcfg = RenderConfig(
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb,
        lindisp=args.lindisp,
        raw_noise_std=args.raw_noise_std,
        white_bkgd=args.white_bkgd,
        use_viewdirs=args.use_viewdirs,
        # shared-model fine: coarse pass only guides sampling, under
        # stop_gradient (run_dnerf.py:445-448); two-model: coarse trains.
        coarse_contributes=args.use_two_models_for_fine,
    )

    optimizer = make_optimizer(args.lrate, args.lrate_decay)
    state = init_train_state(params, optimizer)

    start = 0
    ckpt_format()  # fail fast on a typo'd SWNERF_CKPT_FORMAT, not at first save
    ckpts = find_checkpoints(args.basedir, args.expname, args.ft_path)
    native = try_native_resume(ckpts, args.no_reload, state)
    if native is not None:
        state, start = native
        return field, ffield, kind, rcfg, optimizer, state, start, (
            mcfg, fcfg if args.use_two_models_for_fine else None
        )
    if ckpts and not args.no_reload:
        print("Reloading from", ckpts[-1])
        ckpt = load_tar(ckpts[-1])
        start = int(ckpt["global_step"])
        params["coarse"] = state_dict_to_params(kind, ckpt["network_fn_state_dict"], params["coarse"])
        groups = [(kind, "coarse")]
        if params["fine"] is not None and ckpt.get("network_fine_state_dict"):
            params["fine"] = state_dict_to_params(kind, ckpt["network_fine_state_dict"], params["fine"])
            groups.append((kind, "fine"))
        opt_state, _ = torch_dict_to_adam(ckpt["optimizer_state_dict"], params, groups, state.opt_state)
        state = TrainState(jnp.asarray(start, jnp.int32), params, opt_state)

    return field, ffield, kind, rcfg, optimizer, state, start, (mcfg, fcfg if args.use_two_models_for_fine else None)


def save_dnerf_ckpt(args, kind: str, state: TrainState, i: int):
    """.tar with the dnerf schema (run_dnerf.py:757-769), and/or the native
    flax-msgpack snapshot (SWNERF_CKPT_FORMAT=tar|native|both)."""
    path = os.path.join(args.basedir, args.expname, f"{i:06d}.tar")
    if tar_enabled():
        groups = [(kind, "coarse")]
        payload = {
            "global_step": i,
            "network_fn_state_dict": params_to_state_dict(kind, state.params["coarse"]),
        }
        if state.params["fine"] is not None:
            payload["network_fine_state_dict"] = params_to_state_dict(kind, state.params["fine"])
            groups.append((kind, "fine"))
        lr = float(exp_decay_schedule(args.lrate, args.lrate_decay)(i))
        payload["optimizer_state_dict"] = adam_to_torch_dict(state.opt_state, state.params, groups, lr)
        save_tar(path, payload)
        print("Saved checkpoints at", path)
    maybe_save_native(path, state, i)


def make_dnerf_step(
    field, cfg: RenderConfig, optimizer, scene, add_tv_loss: bool, tv_loss_weight: float,
    fine_field=None, mesh=None, state_shardings=None,
):
    """Jitted step consuming (images, poses, times, img_i, pixels,
    neighbor_time, rng). The TV branch re-renders the same rays at
    ``neighbor_time`` with the first render's (stopped) z_vals and penalizes
    sum((dx - dx_neighbor)^2) * weight."""
    def loss_fn(params, rays: Rays, target, neighbor_time, rng):
        out = render_rays(
            field, params["coarse"], rays, cfg, rng=rng,
            fine_params=params.get("fine"), fine_field=fine_field,
        )
        img_loss = mse(out["rgb"], target)
        loss = img_loss
        metrics = {"loss": img_loss, "psnr": mse_to_psnr(img_loss)}
        if add_tv_loss:
            z_vals = jax.lax.stop_gradient(out["z_vals"])
            n = rays.origins.shape[0]
            rays_n = rays._replace(times=jnp.full((n, 1), neighbor_time, jnp.float32))
            out_n = render_rays(
                field, params["coarse"], rays_n, cfg, rng=rng,
                fine_params=params.get("fine"), z_vals=z_vals, fine_field=fine_field,
            )
            tv = jnp.sum((out["aux"]["dx"] - out_n["aux"]["dx"]) ** 2) * tv_loss_weight
            loss = loss + tv
            metrics["tv"] = tv
        if "rgb0" in out:
            img_loss0 = mse(out["rgb0"], target)
            loss = loss + img_loss0
            metrics["psnr0"] = mse_to_psnr(img_loss0)
        metrics["total_loss"] = loss
        return loss, metrics

    def inner(state: TrainState, rays: Rays, target, neighbor_time, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, rays, target, neighbor_time, step_rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state), metrics

    # The pixels -> Rays construction (and the jit/shard wrapping) is the
    # shared CLI adapter — one copy serves the fused and autodiff steps.
    from swnerf_tpu.pipelines.common import make_time_image_step

    return make_time_image_step(inner, cfg, scene, mesh=mesh, pass_neighbor=True,
                                state_shardings=state_shardings)


def make_dnerf_scan_step(
    field, cfg: RenderConfig, optimizer, scene, add_tv_loss: bool, tv_loss_weight: float,
    fine_field=None, mesh=None, inner_raw=None, state_shardings=None,
):
    """K D-NeRF steps per dispatch: consumes img_i [K], pixels [K, N, 2],
    neighbor_time [K]; returns the final state and the LAST step's metrics.
    Scan semantics are bit-identical to the per-step loop (the per-step RNG
    is fold_in(rng, state.step)). ``inner_raw`` swaps in an alternative
    unjitted CLI-signature step (the fused D-NeRF step)."""
    if inner_raw is None:
        inner = make_dnerf_step(
            field, cfg, optimizer, scene, add_tv_loss, tv_loss_weight,
            fine_field=fine_field, mesh=None,
        )
        # Unwrap the jit: scan over the raw python step for one program.
        inner_raw = inner.__wrapped__
    raw = inner_raw

    def step_k(state, images, poses, times, img_i_k, pixels_k, neighbor_k, rng):
        def body(st, x):
            img_i, pixels, nt = x
            return raw(st, images, poses, times, img_i, pixels, nt, rng)

        state, ms = jax.lax.scan(body, state, (img_i_k, pixels_k, neighbor_k))
        return state, jax.tree.map(lambda x: x[-1], ms)

    if mesh is None:
        return jax.jit(step_k, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swnerf_tpu.parallel.mesh import RAYS_AXIS

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(None, RAYS_AXIS))
    in_sh = [rep, rep, rep, rep, rep, shd, rep, rep]
    out_sh = rep
    if state_shardings is not None:
        in_sh[0] = state_shardings
        out_sh = (state_shardings, rep)
    return jax.jit(step_k, in_shardings=tuple(in_sh), out_shardings=out_sh,
                   donate_argnums=(0,))


def pick_neighbor_time(rng: np.random.Generator, times: np.ndarray, img_i: int) -> float:
    """Random prev/next neighbor, random interpolation toward it
    (run_dnerf.py:690-709)."""
    t = float(times[img_i])
    t_prev = float(times[img_i - 1]) if img_i > 0 else None
    t_next = float(times[img_i + 1]) if img_i < len(times) - 1 else None
    if t_prev is not None and t_next is not None:
        if rng.random() > 0.5:
            t_prev = None
        else:
            t_next = None
    if t_prev is not None:
        return t_prev + (t - t_prev) * float(rng.random())
    return t + (t_next - t) * float(rng.random())


def train(argv=None):
    """Product entry. SWNERF_AUTO_RESEED=N recovers watchdog-confirmed
    dead-density init draws by restarting with a fold_in-derived key
    (common.auto_reseed_loop); the reference d_nerf/run_dnerf.py wastes
    the whole budget on such draws (PARITY_TORCH.md 'Seed pathology')."""
    return auto_reseed_loop(_train_impl, argv)


def _train_impl(argv=None):
    from swnerf_tpu.parallel.multihost import initialize_from_env

    initialize_from_env()  # multi-process opt-in; no-op single-host
    args = config_parser_dnerf().parse_args(argv)
    if args.dataset_type != "blender":
        raise ValueError(f"Unknown dataset type {args.dataset_type!r} (dnerf supports blender)")

    args.dataset_type = "blender_dnerf"
    scene = load_scene(args)
    args.dataset_type = "blender"

    assert float(scene.times[scene.i_train[0]]) == 0.0, "time must start at 0"
    assert float(scene.times[scene.i_train[-1]]) == 1.0, "max time must be 1"

    os.makedirs(os.path.join(args.basedir, args.expname), exist_ok=True)
    snapshot_args(args.basedir, args.expname, args, args.config)

    field, fine_field, kind, rcfg, optimizer, state, start, (mcfg, fcfg) = create_dnerf(args)

    from swnerf_tpu.parallel import data_parallel_mesh, replicate

    tp = int(os.environ.get("SWNERF_TENSOR_PARALLEL", "0") or 0)
    tp_shardings = None
    if tp > 1:
        from swnerf_tpu.parallel import tensor_parallel_setup

        mesh, tp_shardings, state = tensor_parallel_setup(state, args.N_rand, tp)
    else:
        mesh = data_parallel_mesh(args.N_rand)

    def host_params(state):
        # Eval/render-time params: TP runs gather the shards once per call.
        if tp_shardings is None:
            return state.params["coarse"], state.params["fine"]
        return jax.device_get((state.params["coarse"], state.params["fine"]))

    if args.render_only:
        # Live path (run_dnerf.py:553-566): first render pose swept over 120
        # uniformly spaced times.
        print("RENDER ONLY")
        savedir = os.path.join(args.basedir, args.expname, "time_only")
        poses = np.broadcast_to(scene.render_poses[0], (120, 4, 4))
        times = np.linspace(0.0, 1.0, 120).astype(np.float32)
        pc, pf = host_params(state)
        rgbs, disps = render_path(
            field, pc, pf, poses, scene, rcfg,
            chunk=args.chunk, savedir=savedir, render_factor=args.render_factor, times=times,
            fine_field=fine_field, mesh=mesh,
        )
        base = os.path.join(args.basedir, args.expname, "time_")
        write_video(base + "rgb.mp4", rgbs)
        write_video(base + "disp.mp4", disps / np.max(disps))
        return

    if not args.no_batching:
        # use_batching is NotImplementedError in the reference
        # (run_dnerf.py:633-634); per-image sampling is the only live mode.
        pass

    logger = ExperimentLogger(args.basedir, args.expname)
    sampler = ImageSampler(
        scene, args.N_rand, args.precrop_iters, args.precrop_frac,
        precrop_iters_time=args.precrop_iters_time,
    )
    from swnerf_tpu.pipelines.common import chunk_until_event, steps_per_dispatch

    k_disp = steps_per_dispatch()

    # Fused D-NeRF step on TPU (train/fused_step.py): one Pallas render-loss
    # kernel per canonical pass (in-kernel input grads chained through the
    # encode into the fused deformation MLP), composed under jax.grad with
    # the TV loss. Same gating as run_nerf/run_tnerf.
    from swnerf_tpu.pipelines.common import make_time_image_step
    from swnerf_tpu.train.fused_step import (
        make_fused_dnerf_step,
        supports_fused_dnerf_step,
    )

    interp = os.environ.get("SWNERF_FUSED_STEP") == "force-interpret"
    use_fused_step = (
        tp_shardings is None
        and args.nerf_type == "direct_temporal"
        and supports_fused_dnerf_step(mcfg, fcfg, rcfg)
        and (
            interp
            or (
                jax.devices()[0].platform == "tpu"
                and os.environ.get("SWNERF_FUSED", "1") != "0"
                and os.environ.get("SWNERF_FUSED_STEP", "1") != "0"
                and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
            )
        )
    )
    if use_fused_step:
        inner = make_fused_dnerf_step(
            mcfg, rcfg, optimizer, fcfg=fcfg,
            add_tv_loss=args.add_tv_loss, tv_loss_weight=args.tv_loss_weight,
            interpret=interp,
            compute_dtype=jnp.float32 if interp else jnp.bfloat16,
            axis_name=None if mesh is None else "rays",
        )
        if mesh is not None:
            from swnerf_tpu.parallel.mesh import shard_map_train_step

            inner = shard_map_train_step(inner, mesh, n_extra_rep=1)
        step_fn = make_time_image_step(inner, rcfg, scene, mesh=mesh,
                                       pass_neighbor=True)
        print("Using the fused D-NeRF train step")
        if k_disp > 1:
            scan_fn = make_dnerf_scan_step(
                field, rcfg, optimizer, scene, args.add_tv_loss,
                args.tv_loss_weight, fine_field=fine_field, mesh=mesh,
                inner_raw=step_fn.__wrapped__,
            )
    else:
        step_fn = make_dnerf_step(
            field, rcfg, optimizer, scene, args.add_tv_loss, args.tv_loss_weight,
            fine_field=fine_field, mesh=mesh, state_shardings=tp_shardings,
        )
        if k_disp > 1:
            scan_fn = make_dnerf_scan_step(
                field, rcfg, optimizer, scene, args.add_tv_loss, args.tv_loss_weight,
                fine_field=fine_field, mesh=mesh, state_shardings=tp_shardings,
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
    host_rng = np.random.default_rng(0)

    n_iters = int(os.environ.get("SWNERF_MAX_ITERS", args.N_iter + 1))
    samples_per_step = args.N_rand * (
        rcfg.n_samples + (rcfg.n_samples + rcfg.n_importance if rcfg.n_importance else 0)
    )

    cadences = (args.i_weights, args.i_print, args.i_img, args.i_video, args.i_testset)

    # Restarts only before the first checkpoint and never on a resume, so
    # auto-resume can't reload a dead attempt's weights.
    watchdog = DeadInitWatchdog(
        args.i_print, restart_until=args.i_weights if start == 0 else 0
    )

    def flush_pending(pending):
        # One-boundary-behind metric fetch keeps the dispatch pipeline full
        # (see run_nerf.py flush_pending).
        if pending is None:
            return
        j, met = pending
        m = {k: float(v) for k, v in met.items()}
        logger.scalars(j, m)
        logger.throughput(j, samples_per_step, jax.device_count(), synced=k_disp > 1)
        txt = f"[TRAIN] Iter: {j} Loss_fine: {m['loss']:.6f} PSNR: {m['psnr']:.3f}"
        if "tv" in m:
            txt += f" TV: {m['tv']:.6f}"
        print(txt)
        watchdog.check(j, m["psnr"])

    print("Begin")
    pending = None
    metrics = {}
    i = start + 1
    while i < n_iters:
        k = chunk_until_event(i, n_iters, k_disp, cadences) if k_disp > 1 else 1
        if k == 1:
            img_i, pixels = sampler.next(i)
            neighbor_time = (
                pick_neighbor_time(host_rng, scene.times, img_i) if args.add_tv_loss else 0.0
            )
            state, metrics = step_fn(
                state, images_dev, poses_dev, times_dev, img_i,
                jnp.asarray(pixels), jnp.float32(neighbor_time), base_rng,
            )
        else:
            picks = [sampler.next(i + j) for j in range(k)]
            img_i_k = np.asarray([p[0] for p in picks], np.int32)
            pixels_k = np.stack([p[1] for p in picks])
            neighbor_k = np.asarray(
                [
                    pick_neighbor_time(host_rng, scene.times, int(ii))
                    if args.add_tv_loss
                    else 0.0
                    for ii in img_i_k
                ],
                np.float32,
            )
            state, metrics = scan_fn(
                state, images_dev, poses_dev, times_dev, jnp.asarray(img_i_k),
                jnp.asarray(pixels_k), jnp.asarray(neighbor_k), base_rng,
            )
        i = i + k - 1

        if i % args.i_weights == 0:
            save_dnerf_ckpt(args, kind, state, i)

        if i % args.i_print == 0:
            flush_pending(pending)
            pending = (i, metrics)

        if i % args.i_img == 0 and i > 0 and len(scene.i_val):
            img_i = int(np.random.default_rng(i).choice(scene.i_val))
            pc, pf = host_params(state)
            rgbs, disps = render_path(
                field, pc, pf,
                scene.poses[img_i : img_i + 1], scene, rcfg, args.chunk,
                times=scene.times[img_i : img_i + 1], fine_field=fine_field, mesh=mesh,
            )
            logger.image(i, "gt", scene.images[img_i])
            logger.image(i, "rgb", rgbs[0])
            logger.image(i, "disp", disps[0] / max(disps.max(), 1e-8))

        if i % args.i_video == 0 and i > 0:
            savedir = os.path.join(
                args.basedir, args.expname, f"frames_{args.expname}_spiral_{i:06d}_time"
            )
            pc, pf = host_params(state)
            rgbs, disps = render_path(
                field, pc, pf,
                scene.render_poses, scene, rcfg, args.chunk,
                savedir=savedir, times=scene.render_times, fine_field=fine_field, mesh=mesh,
            )
            base = os.path.join(args.basedir, args.expname, f"{args.expname}_spiral_{i:06d}_")
            write_video(base + "rgb.mp4", rgbs)
            write_video(base + "disp.mp4", disps / np.max(disps))

        if i % args.i_testset == 0 and i > 0 and len(scene.i_test):
            testsavedir = os.path.join(args.basedir, args.expname, f"testset_{i:06d}")
            pc, pf = host_params(state)
            render_path(
                field, pc, pf,
                scene.poses[scene.i_test], scene, rcfg, args.chunk,
                savedir=testsavedir, times=scene.times[scene.i_test],
                save_also_gt=scene.images[scene.i_test], fine_field=fine_field, mesh=mesh,
            )
            print("Saved test set")

        i += 1

    flush_pending(pending)
    logger.close()
    return {k: float(v) for k, v in metrics.items()}


if __name__ == "__main__":
    train()
