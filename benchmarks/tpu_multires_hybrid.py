"""A/B the MultiRes phase-2 step's per-level fused selection on the v5e.

Variants (fused flags per level, patches 32/16/8/4 -> 1024/256/64/16 rays):
  autodiff   [F,F,F,F]   round-2 product default (12.3M)
  hybrid1    [T,F,F,F]   fused kernels on the dominant 1024-ray level only
  hybrid2    [T,T,F,F]   ... and the 256-ray level
  all_fused  [T,T,T,T]   round-2 opt-in (measured 11.05M)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

STEPS = 150


def main():
    from swnerf_tpu.models import make_dnerf_field
    from swnerf_tpu.pipelines.run_multires import (
        BASE_PATCH_SIZE, CHANNEL_LIST, _level_cfg, make_phase2_step,
    )
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.train import make_optimizer

    L = 4
    H = W = 400
    focal = 555.0
    args = argparse.Namespace(netdepth=8, netwidth=256, use_viewdirs=True,
                              N_importance=0, not_zero_canonical=False)
    fields, params_all, opts, opt_states, pyr_hwf, patch_sizes = [], [], [], [], [], []
    key = jax.random.PRNGKey(0)
    for layer in range(L):
        cfg = _level_cfg(args, CHANNEL_LIST[layer])
        f = make_dnerf_field(cfg)
        key, k1 = jax.random.split(key)
        p = {"coarse": f.init(k1), "fine": None}
        opt = make_optimizer()
        fields.append(f)
        params_all.append(p)
        opts.append(opt)
        opt_states.append(opt.init(p))
        s = 2**layer
        pyr_hwf.append([H // s, W // s, focal / s])
        patch_sizes.append(max(BASE_PATCH_SIZE // s, 1))

    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0, white_bkgd=True)

    rng = np.random.default_rng(0)
    pixels_all, targets_all = [], []
    for l in range(L):
        ps = patch_sizes[l]
        ys, xs = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
        pixels_all.append(jnp.asarray(np.stack([ys, xs], -1).reshape(-1, 2).astype(np.int32)))
        targets_all.append(jnp.asarray(rng.uniform(0, 1, (ps, ps, 3)).astype(np.float32)))
    target_full = targets_all[0]
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4].copy())
    key = jax.random.PRNGKey(2)
    sps = sum(ps * ps * 64 for ps in patch_sizes)

    variants = [
        ("autodiff", [False] * 4),
        ("hybrid1", [True, False, False, False]),
        ("hybrid2", [True, True, False, False]),
        ("all_fused", [True] * 4),
    ]
    results = {}
    for name, fused in variants:
        step = make_phase2_step(args, fields, opts, rcfg, pyr_hwf,
                                patch_sizes, 2.0, 6.0, fused=fused)
        raw = step.__wrapped__

        def run(carry):
            def body(c, _):
                p, s = c
                np_, ns_, _ = raw(p, s, pixels_all, targets_all, target_full,
                                  pose, jnp.float32(0.5), jnp.float32(1.0), key)
                return (np_, ns_), 0.0
            c, _ = jax.lax.scan(body, carry, None, length=STEPS)
            return c

        fn = jax.jit(run)

        def fetch(o):
            jax.device_get(jax.tree.map(lambda x: x.ravel()[0], jax.tree.leaves(o)[0]))
            return o

        t0 = time.time()
        out = fetch(fn((params_all, opt_states)))
        compile_s = time.time() - t0
        t0 = time.time()
        out = fetch(fn(out))
        wall = time.time() - t0
        it_s = STEPS / wall
        print(f"{name:10s}: {it_s:7.1f} it/s  {1000*wall/STEPS:6.2f} ms/step  "
              f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
        results[name] = {"it_per_s": it_s, "msamp": it_s * sps / 1e6}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
