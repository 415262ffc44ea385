"""TPU: single-pass fused T-NeRF train-step throughput (the run_tnerf
product path) vs the autodiff step with the field-level fused kernel.

Workload: reference t_nerf configs — N_rand=1024 (standard config family),
S=64 samples, TNeRF depth=8 / net_dim=128 / skip 4, multires 10/4."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

STEPS = 150


def main():
    from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field
    from swnerf_tpu.render import RenderConfig, render_rays
    from swnerf_tpu.render.core import Rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import make_fused_tnerf_step
    from swnerf_tpu.train.loop import TrainState, init_train_state, mse

    import optax

    n = 1024
    cfg = TNeRFConfig()
    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0, use_viewdirs=True)
    opt = make_optimizer()

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
    sps = n * rcfg.n_samples

    def timed(name, step, state):
        def run(state):
            def body(st, _):
                st, _m = step(st, rays, target, key)
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

    # Product path: single fused render-loss kernel.
    fused = make_fused_tnerf_step(cfg, rcfg, opt)
    params = {"coarse": None, "fine": None}
    field = make_tnerf_field(cfg)  # auto-fused forward for the autodiff path
    params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
    state = init_train_state(params, opt)
    results["fused_single_pass"] = timed("tnerf fused 1-pass", fused, state)

    # Autodiff step with the field-level fused forward/backward kernel.
    def loss_fn(p, rng_):
        out = render_rays(field, p["coarse"], rays, rcfg, rng=rng_)
        return mse(out["rgb"], target)

    def autodiff_step(st, rays_, target_, key_):
        step_rng = jax.random.fold_in(key_, st.step)
        g = jax.grad(loss_fn)(st.params, step_rng)
        updates, opt_state = opt.update(g, st.opt_state, st.params)
        return TrainState(st.step + 1, optax.apply_updates(st.params, updates),
                          opt_state), {}

    state = init_train_state(params, opt)
    results["autodiff_fused_field"] = timed("tnerf autodiff    ", autodiff_step, state)

    with open("/tmp/tpu_tnerf_step.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
