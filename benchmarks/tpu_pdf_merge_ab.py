"""TPU A/B: fused sample_pdf+merge kernel (SWNERF_PDF_MERGE) on the
vanilla and D-NeRF fused train steps at their adopted default tiles.

The two-op path (Pallas sample_pdf -> XLA sort) measured 0.37 ms isolated /
~0.15 ms marginal in the round-2 ablation (PERFORMANCE.md); the merged
kernel emits the sorted union directly. 3 timed reps per variant, best
reported, like bench.py.

Writes /tmp/tpu_pdf_merge_ab.json.
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
REPS = 3
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
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            c = fn(c)
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            best = min(best, time.time() - t0)
    except Exception as e:
        print(f"{name:44s}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        results[name] = {"error": str(e)[:300]}
        return
    it_s = STEPS / best
    print(f"{name:44s}: {it_s:7.1f} it/s  {1000.0 / it_s:6.2f} ms  "
          f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
    results[name] = {"it_per_s": it_s, "ms": 1000.0 / it_s,
                     "msamp": it_s * sps / 1e6}


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


def vanilla_ab():
    from swnerf_tpu.models.vanilla import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import make_fused_train_step
    from swnerf_tpu.train.loop import init_train_state

    n = 1024
    cfg = VanillaNeRFConfig()
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0)
    opt = make_optimizer()
    field = make_vanilla_field(cfg, fused=False)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    rays, target = rays_of(n)
    key = jax.random.PRNGKey(0)
    sps = n * 256

    for merge in ("0", "1"):
        os.environ["SWNERF_PDF_MERGE"] = merge
        step = make_fused_train_step(cfg, rcfg, opt)
        state = init_train_state(params, opt)

        def body(st, step=step):
            st, _ = step(st, rays, target, key)
            return st

        timed_scan(f"vanilla rc16/rf8 PDF_MERGE={merge}", body, state, sps)


def dnerf_ab():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import make_fused_dnerf_step
    from swnerf_tpu.train.loop import init_train_state

    n = 500
    cfg = DNeRFConfig()
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0,
                        coarse_contributes=False)
    opt = make_optimizer()
    params = {"coarse": make_dnerf_field(cfg, fused=False).init(jax.random.PRNGKey(0)),
              "fine": None}
    rays, target = rays_of(n, with_t=True)
    key = jax.random.PRNGKey(0)
    nt = jnp.float32(0.4)
    sps = n * 256

    for merge in ("0", "1"):
        os.environ["SWNERF_PDF_MERGE"] = merge
        step = make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=True,
                                     tv_loss_weight=1e-4)
        state = init_train_state(params, opt)

        def body(st, step=step):
            st, _ = step(st, rays, target, nt, key)
            return st

        timed_scan(f"dnerf defaults (TV) PDF_MERGE={merge}", body, state, sps)


def main():
    vanilla_ab()
    dnerf_ab()
    with open("/tmp/tpu_pdf_merge_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
