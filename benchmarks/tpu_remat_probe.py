"""Remat vs full-cache fused kernel on TPU + full-step timing at the best
combo. Extends tpu_pass_times (dependence-forced scan)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
from swnerf_tpu.render import Rays, RenderConfig
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.fused_step import make_fused_train_step
from swnerf_tpu.train.loop import init_train_state

N_RAYS = 1024
STEPS = 100
cfg = VanillaNeRFConfig()
field = make_vanilla_field(cfg)
params = field.init(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
vemb = positional_encoding(jnp.asarray(d), cfg.nf_views)
tgt = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))


def one_pass(S, R, remat):
    z = np.linspace(2.0, 6.0, S, dtype=np.float32)[None].repeat(N_RAYS, 0)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    dists = np.diff(z, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[:, :1], 1e10)], -1)
    zj, dj, nz = jnp.asarray(z), jnp.asarray(dists), jnp.zeros((N_RAYS, S))
    ptsj = jnp.asarray(pts)

    def body(p, _):
        outs, g = fused_render_pass(p, cfg, None, vemb, zj, dj, nz, tgt,
                                    True, 1.0 / (3 * N_RAYS), rays_per_tile=R,
                                    pts=ptsj, remat=remat)
        p2 = jax.tree.map(lambda a, b: a + 1e-38 * b, p, g)
        return p2, outs["sqerr"][0]

    @jax.jit
    def loop(p):
        p2, s = jax.lax.scan(body, p, None, length=STEPS)
        return p2, s[-1]

    tag = f"S{S} R{R} remat={int(remat)}"
    try:
        t0 = time.time(); out = loop(params); float(out[1]); compile_s = time.time() - t0
        t0 = time.time(); out = loop(out[0]); float(out[1]); wall = time.time() - t0
    except Exception as e:
        print(f"pass {tag}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    ms = wall / STEPS * 1e3
    print(f"pass {tag}: {ms:6.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


results = {}
for S, R, remat in ((64, 8, False), (192, 2, False), (192, 4, False), (64, 16, False)):
    results[f"S{S}_R{R}_full"] = one_pass(S, R, remat)

# Full fused step at the most promising combos (remat per-pass picked by env
# in the product; here explicit).
N_C, N_F, STEPS2 = 64, 128, 150
SPS = N_RAYS * (N_C + N_C + N_F)
rcfg = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=1.0,
                    white_bkgd=True, raw_noise_std=1.0)
opt = make_optimizer()
p2 = {"coarse": field.init(jax.random.PRNGKey(0)),
      "fine": field.init(jax.random.PRNGKey(1))}
state = init_train_state(p2, opt)
rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
            jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)
key = jax.random.PRNGKey(0)

import os
combos = []
if results.get("S192_R4_full"):
    combos.append((8, 4))
if results.get("S192_R2_full"):
    combos.append((8, 2))
for rc, rf in combos:
    os.environ["SWNERF_FUSED_REMAT"] = "0"
    step = make_fused_train_step(cfg, rcfg, opt, fcfg=cfg,
                                 rays_per_tile_coarse=rc, rays_per_tile_fine=rf)

    def run(state):
        def body(st, _):
            st2, _m = step(st, rays, tgt, key)
            return st2, 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS2)
        return st

    fn = jax.jit(run)
    try:
        t0 = time.time(); st = fn(state)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time(); st = fn(st)
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        wall = time.time() - t0
        it_s = STEPS2 / wall
        print(f"full-cache step rc={rc} rf={rf}: {it_s:7.1f} it/s  "
              f"{it_s*SPS/1e6:6.2f}M samp/s/chip (compile {compile_s:.0f}s)", flush=True)
        results[f"step_rc{rc}_rf{rf}_full"] = it_s * SPS / 1e6
    except Exception as e:
        print(f"full-cache step rc={rc} rf={rf}: FAILED {str(e)[:140]}", flush=True)

with open("/tmp/tpu_remat_probe.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results), flush=True)
