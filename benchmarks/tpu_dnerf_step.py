"""TPU: fused D-NeRF train-step throughput (the run_dnerf product path)
vs the autodiff step with field-level fused kernels (round-1/2 path).

Workload: the bouncingballs config — N_rand=500, 64+(64+128) samples,
shared-model fine (coarse stop-grad, no mse0), TV loss 1e-4, full-size
DirectTemporalNeRF (D=8/W=256 canonical + deformation MLP)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import optax

STEPS = 150


def main():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.render import RenderConfig, render_rays
    from swnerf_tpu.render.core import Rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import make_fused_dnerf_step
    from swnerf_tpu.train.loop import TrainState, init_train_state, mse

    n = 500
    cfg = DNeRFConfig()
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0,
                        coarse_contributes=False)
    opt = make_optimizer()
    field = make_dnerf_field(cfg)

    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), jnp.asarray(t))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    nt = jnp.float32(0.4)
    sps = n * (2 * rcfg.n_samples + rcfg.n_importance)

    params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}

    def timed(name, step, state, args):
        def run(state):
            def body(st, _):
                st, _m = step(st, *args)
                return st, 0.0
            st, _ = jax.lax.scan(body, state, None, length=STEPS)
            return st

        fn = jax.jit(run)
        t0 = time.time()
        st = fn(state)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        st = fn(st)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        wall = time.time() - t0
        it_s = STEPS / wall
        print(f"{name}: {it_s:7.1f} it/s  {it_s * sps / 1e6:6.2f}M samp/s/chip "
              f"(compile {compile_s:.0f}s)", flush=True)
        return {"it_per_s": it_s, "msamp": it_s * sps / 1e6}

    results = {}

    fused = make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=True,
                                  tv_loss_weight=1e-4)
    state = init_train_state(params, opt)
    results["fused"] = timed("dnerf fused      ", fused, state,
                             (rays, target, nt, key))

    # Autodiff step with field-level fused kernels (the previous path).
    def loss_fn(p, rays_, target_, neighbor_time, rng_):
        out = render_rays(field, p["coarse"], rays_, rcfg, rng=rng_,
                          fine_params=p.get("fine"))
        img_loss = mse(out["rgb"], target_)
        z_vals = jax.lax.stop_gradient(out["z_vals"])
        rays_n = rays_._replace(
            times=jnp.full((rays_.origins.shape[0], 1), neighbor_time, jnp.float32)
        )
        out_n = render_rays(field, p["coarse"], rays_n, rcfg, rng=rng_,
                            fine_params=p.get("fine"), z_vals=z_vals)
        tv = jnp.sum((out["aux"]["dx"] - out_n["aux"]["dx"]) ** 2) * 1e-4
        return img_loss + tv

    def autodiff_step(st, rays_, target_, neighbor_time, key_):
        step_rng = jax.random.fold_in(key_, st.step)
        g = jax.grad(loss_fn)(st.params, rays_, target_, neighbor_time, step_rng)
        updates, opt_state = opt.update(g, st.opt_state, st.params)
        return TrainState(st.step + 1, optax.apply_updates(st.params, updates),
                          opt_state), {}

    state = init_train_state(params, opt)
    results["autodiff"] = timed("dnerf autodiff   ", autodiff_step, state,
                                (rays, target, nt, key))

    with open("/tmp/tpu_dnerf_step.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
