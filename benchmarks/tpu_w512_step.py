"""TPU: vanilla train step at --netwidth 512 (2x reference production
width) — the regime the TP rationale points at (VERDICT r3 stretch #8).

Questions this answers on the real chip:
  * does the VMEM-resident fused kernel still fit at W=512 (activations,
    grad accumulators and both models' weights double/quadruple vs 256)?
  * what samp/s does each path reach, vs the W=256 rows in
    PERFORMANCE.md?

Same harness as tpu_fused_step.py (lego shapes 1024 rays x 64+192,
lax.scan of 150 steps timed as one dispatch).
"""

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
from swnerf_tpu.train import make_optimizer, make_train_step
from swnerf_tpu.train.fused_step import make_fused_train_step
from swnerf_tpu.train.loop import init_train_state

N_RAYS, N_C, N_F = 1024, 64, 128
STEPS = 150
SPS = N_RAYS * (N_C + N_C + N_F)


def scan_timed(name, step, state, args):
    def run(state, *a):
        def body(st, _):
            st2, _m = step(st, *a)
            return st2, 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return (st,)

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        jax.device_get(jax.tree.map(lambda x: x.ravel()[0], leaf))
        return o

    fn = jax.jit(run)
    try:
        t0 = time.time()
        out = fetch(fn(state, *args))
        compile_s = time.time() - t0
        t0 = time.time()
        out = fetch(fn(out[0], *args))
        wall = time.time() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    it_s = STEPS / wall
    msamp = it_s * SPS / 1e6
    print(f"{name}: {it_s:7.1f} it/s  {msamp:6.2f}M samp/s/chip (compile {compile_s:.0f}s)",
          flush=True)
    return {"it_per_s": it_s, "msamp": msamp}


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = VanillaNeRFConfig(netwidth=width)
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

    results = {"width": width}
    results["autodiff_split"] = scan_timed(
        f"W={width} autodiff split-kernel",
        make_train_step(field, rcfg, opt), state, (rays, target, key),
    )
    for rc, rf_ in ((8, 4), (4, 2), (16, 8)):
        step = make_fused_train_step(cfg, rcfg, opt, fcfg=cfg,
                                     rays_per_tile_coarse=rc, rays_per_tile_fine=rf_)
        results[f"fused_rc{rc}_rf{rf_}"] = scan_timed(
            f"W={width} fused rc={rc:2d} rf={rf_}", step, state, (rays, target, key),
        )

    with open(f"/tmp/tpu_w{width}_step.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
