"""Time the full fused train step (in-kernel encoding) at candidate tiles,
plus bench.py's exact configuration as a cross-check."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.render import Rays, RenderConfig
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.fused_step import make_fused_train_step
from swnerf_tpu.train.loop import init_train_state

N_RAYS, N_C, N_F, STEPS = 1024, 64, 128, 150
SPS = N_RAYS * (N_C + N_C + N_F)

cfg = VanillaNeRFConfig()
rcfg = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=1.0,
                    white_bkgd=True, raw_noise_std=1.0)
opt = make_optimizer()
field = make_vanilla_field(cfg)
params = {"coarse": field.init(jax.random.PRNGKey(0)),
          "fine": field.init(jax.random.PRNGKey(1))}
state = init_train_state(params, opt)

rng = np.random.default_rng(0)
d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
            jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
key = jax.random.PRNGKey(0)

results = {}
for rc, rf in ((8, 2), (8, 4), (16, 2), (16, 4)):
    step = make_fused_train_step(cfg, rcfg, opt, fcfg=cfg,
                                 rays_per_tile_coarse=rc, rays_per_tile_fine=rf)

    def run(state):
        def body(st, _):
            st2, _m = step(st, rays, target, key)
            return st2, 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return st

    fn = jax.jit(run)
    try:
        t0 = time.time()
        st = fn(state)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        st = fn(st)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        wall = time.time() - t0
        it_s = STEPS / wall
        msamp = it_s * SPS / 1e6
        print(f"fused step rc={rc:2d} rf={rf}: {it_s:7.1f} it/s  "
              f"{msamp:6.2f}M samp/s/chip (compile {compile_s:.0f}s)", flush=True)
        results[f"rc{rc}_rf{rf}"] = msamp
    except Exception as e:
        print(f"fused step rc={rc:2d} rf={rf}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        results[f"rc{rc}_rf{rf}"] = None

with open("/tmp/tpu_fused_step2.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results), flush=True)
