"""REAL per-pass timings for the fused render-loss kernel (the earlier
probe's scan body was loop-invariant, so XLA hoisted the kernel and the
times were fake). Each scan step feeds the grads back into the params at
1e-38 scale to force sequential dependence."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from swnerf_tpu.models import VanillaNeRFConfig
from swnerf_tpu.models.vanilla import init_vanilla_params
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.render_fused import fused_render_pass

N_RAYS = 1024
STEPS = 100
cfg = VanillaNeRFConfig()
params = init_vanilla_params(jax.random.PRNGKey(0), cfg)

rng = np.random.default_rng(0)
d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
vemb = positional_encoding(jnp.asarray(d), cfg.nf_views)
tgt = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))


def one_pass(S, R):
    z = np.linspace(2.0, 6.0, S, dtype=np.float32)[None].repeat(N_RAYS, 0)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    emb = positional_encoding(jnp.asarray(pts), cfg.nf_pts)
    dists = np.diff(z, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[:, :1], 1e10)], -1)
    zj, dj, nz = jnp.asarray(z), jnp.asarray(dists), jnp.zeros((N_RAYS, S))

    def body(p, _):
        outs, g = fused_render_pass(p, cfg, emb, vemb, zj, dj, nz, tgt,
                                    True, 1.0 / (3 * N_RAYS), rays_per_tile=R)
        # force sequential dependence without changing the numerics
        p2 = jax.tree.map(lambda a, b: a + 1e-38 * b, p, g)
        return p2, outs["sqerr"][0]

    @jax.jit
    def loop(p):
        p2, s = jax.lax.scan(body, p, None, length=STEPS)
        return p2, s[-1]

    try:
        t0 = time.time(); out = loop(params); float(out[1]); compile_s = time.time() - t0
        t0 = time.time(); out = loop(out[0]); float(out[1]); wall = time.time() - t0
    except Exception as e:
        print(f"pass S={S:3d} R={R:2d}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    ms = wall / STEPS * 1e3
    ntiles = -(-N_RAYS // max(R, 8)) * max(1, 8 // R) if R < 8 else N_RAYS // R
    print(f"pass S={S:3d} R={R:2d}: {ms:6.2f} ms  ({ntiles} grid steps, "
          f"{N_RAYS*S/1e3:.0f}k pts, compile {compile_s:.0f}s)", flush=True)
    return ms


results = {}
for S, R in ((64, 8), (64, 4), (64, 2), (192, 2), (192, 1)):
    results[f"S{S}_R{R}"] = one_pass(S, R)

with open("/tmp/tpu_pass_times.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results), flush=True)
