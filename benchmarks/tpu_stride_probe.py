"""TPU: big ray tiles via sparser activation checkpoints (SWNERF_FUSED_STRIDE).

B=768 rows runs the trunk at ~76% of the B=2048 rate (tpu_composite_probe),
and R=8+ tiles used to fail VMEM. With store_stride 3-4 the activation cache
shrinks ~40-60%%, so probe which (tile, stride) combos now compile and what
they buy on the full vanilla / D-NeRF steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

STEPS = 150
results = {}


def timed_scan(name, body_fn, carry, sps):
    def run(c):
        def body(c, _):
            return body_fn(c), 0.0
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c

    fn = jax.jit(run)
    try:
        t0 = time.time()
        c = fn(carry)
        jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
        compile_s = time.time() - t0
        t0 = time.time()
        c = fn(c)
        jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
        wall = time.time() - t0
    except Exception as e:
        print(f"{name:44s}: FAILED {str(e)[:160]}", flush=True)
        results[name] = {"error": str(e)[:160]}
        return
    it_s = STEPS / wall
    ms = 1000.0 / it_s
    print(f"{name:44s}: {it_s:7.1f} it/s  {ms:6.2f} ms  "
          f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
    results[name] = {"it_per_s": it_s, "ms": ms, "msamp": it_s * sps / 1e6}


def rays_of(n, with_t=False, seed=0):
    from swnerf_tpu.render.core import Rays

    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32)) if with_t else None
    tgt = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), t), tgt


def main():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.models.vanilla import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import (
        make_fused_dnerf_step, make_fused_train_step,
    )
    from swnerf_tpu.train.loop import init_train_state

    opt = make_optimizer()
    key = jax.random.PRNGKey(0)

    # ---- vanilla full step ----
    n = 1024
    vcfg = VanillaNeRFConfig()
    vrcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                         white_bkgd=True, raw_noise_std=1.0)
    vfield = make_vanilla_field(vcfg, fused=False)
    vparams = {"coarse": vfield.init(jax.random.PRNGKey(0)),
               "fine": vfield.init(jax.random.PRNGKey(1))}
    vrays, vtarget = rays_of(n)

    for rc, rf, stride in ((8, 4, 2), (16, 8, 3), (16, 8, 4), (32, 16, 4),
                           (8, 8, 3), (16, 4, 3)):
        os.environ["SWNERF_FUSED_STRIDE"] = str(stride)
        step = make_fused_train_step(vcfg, vrcfg, opt,
                                     rays_per_tile_coarse=rc,
                                     rays_per_tile_fine=rf)
        state = init_train_state(vparams, opt)

        def body(st, step=step):
            st, _ = step(st, vrays, vtarget, key)
            return st

        timed_scan(f"vanilla rc{rc}/rf{rf} s{stride}", body, state, n * 256)

    # ---- dnerf full step ----
    n2 = 500
    dcfg = DNeRFConfig()
    drcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                         white_bkgd=True, raw_noise_std=1.0,
                         coarse_contributes=False)
    dparams = {"coarse": make_dnerf_field(dcfg, fused=False).init(jax.random.PRNGKey(0)),
               "fine": None}
    drays, dtarget = rays_of(n2, with_t=True)
    nt = jnp.float32(0.4)

    for rc, rf, stride in ((8, 4, 3), (16, 8, 3), (16, 8, 4), (8, 8, 4)):
        os.environ["SWNERF_FUSED_STRIDE"] = str(stride)
        step = make_fused_dnerf_step(dcfg, drcfg, opt, add_tv_loss=True,
                                     tv_loss_weight=1e-4,
                                     rays_per_tile_coarse=rc,
                                     rays_per_tile_fine=rf)
        state = init_train_state(dparams, opt)

        def body(st, step=step):
            st, _ = step(st, drays, dtarget, nt, key)
            return st

        timed_scan(f"dnerf rc{rc}/rf{rf} s{stride} (TV)", body, state, n2 * 256)

    with open("/tmp/tpu_stride_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
