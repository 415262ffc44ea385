"""TPU: ray-tile sweep for the fused render kernels (round 3).

Round 2 recorded "rf8 / rc16 fail to compile — VMEM"; the R4 D-NeRF fine
tile now compiles (benchmarks/tpu_dnerf_ablation.py), so re-probe the whole
tile space for both the vanilla step (1024 rays, 64+192) and the D-NeRF
step (500 rays, 64+192, TV), plus the deformation-net block size.

Writes /tmp/tpu_tile_sweep.json.
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
        print(f"{name:40s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        results[name] = {"error": str(e)[:200]}
        return
    it_s = STEPS / wall
    ms = 1000.0 / it_s
    print(f"{name:40s}: {it_s:7.1f} it/s  {ms:6.2f} ms  "
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


def vanilla_sweep():
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

    for rc, rf in ((8, 4), (16, 8), (32, 8), (16, 16), (32, 16), (64, 32)):
        step = make_fused_train_step(cfg, rcfg, opt,
                                     rays_per_tile_coarse=rc,
                                     rays_per_tile_fine=rf)
        state = init_train_state(params, opt)

        def body(st, step=step):
            st, _ = step(st, rays, target, key)
            return st

        timed_scan(f"vanilla rc{rc}/rf{rf}", body, state, sps)


def dnerf_sweep():
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

    for rc, rf in ((8, 2), (8, 4), (16, 8), (32, 8), (32, 16)):
        step = make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=True,
                                     tv_loss_weight=1e-4,
                                     rays_per_tile_coarse=rc,
                                     rays_per_tile_fine=rf)
        state = init_train_state(params, opt)

        def body(st, step=step):
            st, _ = step(st, rays, target, nt, key)
            return st

        timed_scan(f"dnerf rc{rc}/rf{rf} (TV)", body, state, sps)


def timenet_block_sweep():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.ops.embedding import positional_encoding
    from swnerf_tpu.ops.pallas.raymarch import fused_time_net

    n, S_f = 500, 192
    cfg = DNeRFConfig()
    rng = np.random.default_rng(0)
    pts_f = jnp.asarray(rng.standard_normal((n, S_f, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))
    tp = make_dnerf_field(cfg, fused=False).init(jax.random.PRNGKey(0))["time_net"]

    pe = positional_encoding(pts_f, cfg.nf_pts)
    tb = jnp.broadcast_to(t[..., None, :], pts_f.shape[:-1] + (1,))
    te = positional_encoding(tb, cfg.nf_time)
    pe2 = jnp.concatenate([pe, pe], 0)
    te2 = jnp.concatenate([te, te], 0)
    sps = n * 256

    for block in (2048, 4096, 8192, 16384):
        def loss(tp_, block=block):
            return jnp.sum(fused_time_net(tp_, cfg, pe2, te2, block=block,
                                          compute_dtype=jnp.bfloat16,
                                          need_input_grads=False))

        def body(tp_, loss=loss):
            g = jax.grad(loss)(tp_)
            return jax.tree.map(lambda a, b: a + 0.0 * b, tp_, g)

        timed_scan(f"time-net fwd+bwd block={block}", body, tp, sps)


def main():
    vanilla_sweep()
    dnerf_sweep()
    timenet_block_sweep()
    with open("/tmp/tpu_tile_sweep.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
