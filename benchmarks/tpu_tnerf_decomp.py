"""Where does the 1.5 ms fused T-NeRF step go? (1024 rays x 64 samples)

Variants isolate the non-kernel glue around the single render-loss kernel:
  full        product fused step (jitter + noise + vd embed + kernel + Adam)
  no_adam     same glue, but params consume grads via p - 1e-9*g (no optax)
  no_sampling perturb=0 / noise=0 (z is deterministic linspace), with Adam
  kernel_only precomputed z/vd_emb/noise; kernel + trivial grad consumption
"""

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
    from swnerf_tpu.ops.embedding import positional_encoding
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
    from swnerf_tpu.ops.sampling import sample_along_rays
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.render.core import Rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import _dists_scaled, make_fused_tnerf_step
    from swnerf_tpu.train.loop import init_train_state

    n = 1024
    cfg = TNeRFConfig()
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
    sps = n * 64

    field = make_tnerf_field(cfg)
    params0 = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}

    def timed(name, step, state):
        def run(state):
            def body(st, _):
                return step(st), 0.0
            st, _ = jax.lax.scan(body, state, None, length=STEPS)
            return st

        fn = jax.jit(run)

        def fetch(st):
            jax.device_get(jax.tree.leaves(st)[0].ravel()[0])
            return st

        t0 = time.time()
        st = fetch(fn(state))
        compile_s = time.time() - t0
        t0 = time.time()
        st = fetch(fn(st))
        wall = time.time() - t0
        it_s = STEPS / wall
        print(f"{name:12s}: {it_s:7.1f} it/s  {1000*wall/STEPS:6.3f} ms/step  "
              f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
        return {"it_per_s": it_s, "ms": 1000 * wall / STEPS}

    results = {}

    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0, use_viewdirs=True)
    fused = make_fused_tnerf_step(cfg, rcfg, opt)
    results["full"] = timed("full", lambda st: fused(st, rays, target, key)[0],
                            init_train_state(params0, opt))

    # --- no_adam: identical loss/grads, trivial param consumption ---------
    def make_raw(rcfg_):
        def raw_step(params):
            step_rng = jax.random.fold_in(key, 0)
            k_jit, k_noise0, _1, _2 = jax.random.split(step_rng, 4)
            z = sample_along_rays(k_jit, rays.near, rays.far, 64,
                                  rcfg_.perturb, False)
            vd = positional_encoding(rays.viewdirs, cfg.nf_views)
            if rcfg_.raw_noise_std > 0:
                noise = jax.random.normal(k_noise0, z.shape) * rcfg_.raw_noise_std
            else:
                noise = jnp.zeros(z.shape)
            _outs, grads = fused_render_pass(
                params["coarse"], cfg, None, vd, z,
                _dists_scaled(z, rays.directions), noise, target,
                True, 1.0 / (3.0 * n), rays_per_tile=8,
                origins=rays.origins, directions=rays.directions,
                times=rays.times, arch="tnerf",
            )
            return {
                "coarse": jax.tree.map(lambda p, g: p - 1e-9 * g,
                                       params["coarse"], grads),
                "fine": None,
            }
        return raw_step

    results["no_adam"] = timed("no_adam", make_raw(rcfg), params0)

    rcfg_det = RenderConfig(n_samples=64, n_importance=0, perturb=0.0,
                            white_bkgd=True, raw_noise_std=0.0, use_viewdirs=True)
    fused_det = make_fused_tnerf_step(cfg, rcfg_det, opt)
    results["no_sampling"] = timed(
        "no_sampling", lambda st: fused_det(st, rays, target, key)[0],
        init_train_state(params0, opt))

    # --- kernel_only: everything precomputed outside the loop -------------
    z0 = sample_along_rays(jax.random.PRNGKey(1), rays.near, rays.far, 64, 1.0, False)
    vd0 = positional_encoding(rays.viewdirs, cfg.nf_views)
    noise0 = jax.random.normal(jax.random.PRNGKey(2), z0.shape)
    dists0 = _dists_scaled(z0, rays.directions)

    def kernel_step(params):
        _outs, grads = fused_render_pass(
            params["coarse"], cfg, None, vd0, z0, dists0, noise0, target,
            True, 1.0 / (3.0 * n), rays_per_tile=8,
            origins=rays.origins, directions=rays.directions,
            times=rays.times, arch="tnerf",
        )
        return {
            "coarse": jax.tree.map(lambda p, g: p - 1e-9 * g,
                                   params["coarse"], grads),
            "fine": None,
        }

    results["kernel_only"] = timed("kernel_only", kernel_step, params0)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
