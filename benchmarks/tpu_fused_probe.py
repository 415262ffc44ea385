"""TPU probe: compile/time the fused render-loss kernel per PASS (coarse
S=64 vs fine S=192) at candidate ray tiles, to isolate Mosaic tiling/VMEM
failures, then time full fused steps at the surviving combos."""

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
from swnerf_tpu.train import make_optimizer, make_train_step
from swnerf_tpu.train.fused_step import make_fused_train_step
from swnerf_tpu.train.loop import init_train_state

N_RAYS = 1024
cfg = VanillaNeRFConfig()
field = make_vanilla_field(cfg)
params = field.init(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0


def one_pass(S, R):
    z = np.linspace(2.0, 6.0, S, dtype=np.float32)[None].repeat(N_RAYS, 0)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    emb = positional_encoding(jnp.asarray(pts), cfg.nf_pts)
    vemb = positional_encoding(jnp.asarray(d), cfg.nf_views)
    dists = np.diff(z, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[:, :1], 1e10)], -1)
    tgt = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    def f(p):
        outs, grads = fused_render_pass(
            p, cfg, emb, vemb, jnp.asarray(z), jnp.asarray(dists),
            jnp.zeros_like(jnp.asarray(z)), tgt, True, 1.0 / (3 * N_RAYS),
            rays_per_tile=R,
        )
        return outs["sqerr"].sum(), grads

    fn = jax.jit(f)
    try:
        t0 = time.time()
        s, g = fn(params)
        float(s)
        compile_s = time.time() - t0
        iters = 50

        @jax.jit
        def loop(p):
            def body(c, _):
                s, g = f(p)
                return c + s, 0.0
            c, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return c

        float(loop(params))
        t0 = time.time()
        float(loop(params))
        dt = time.time() - t0
        ms = dt / iters * 1e3
        print(f"pass S={S:3d} R={R:2d}: OK  {ms:6.2f} ms/pass (compile {compile_s:.0f}s)",
              flush=True)
        return ms
    except Exception as e:
        print(f"pass S={S:3d} R={R:2d}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


results = {}
for S, R in ((192, 4), (192, 2), (192, 8), (64, 8), (64, 16), (64, 4)):
    results[f"S{S}_R{R}"] = one_pass(S, R)

# Full fused steps at surviving combos
N_C, N_F, STEPS = 64, 128, 150
SPS = N_RAYS * (N_C + N_C + N_F)
rcfg = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=1.0,
                    white_bkgd=True, raw_noise_std=1.0)
opt = make_optimizer()
p2 = {"coarse": field.init(jax.random.PRNGKey(0)),
      "fine": field.init(jax.random.PRNGKey(1))}
state = init_train_state(p2, opt)
rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
            jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
key = jax.random.PRNGKey(0)

ok_c = [rc for rc in (8, 16, 4) if results.get(f"S64_R{rc}")]
ok_f = sorted((rf for rf in (8, 4, 2) if results.get(f"S192_R{rf}")),
              key=lambda rf: results[f"S192_R{rf}"])
combos = [(rc, rf) for rc in ok_c[:2] for rf in ok_f[:2]]

for rc, rf in combos:
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
        print(f"fused step rc={rc} rf={rf}: {it_s:7.1f} it/s  "
              f"{it_s * SPS / 1e6:6.2f}M samp/s/chip (compile {compile_s:.0f}s)",
              flush=True)
        results[f"step_rc{rc}_rf{rf}"] = it_s * SPS / 1e6
    except Exception as e:
        print(f"fused step rc={rc} rf={rf}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

with open("/tmp/tpu_fused_probe.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results), flush=True)
