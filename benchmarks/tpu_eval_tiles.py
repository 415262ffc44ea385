"""TPU: fused forward-only eval render tile sweep (render_image surface).

The train-step tile optimum (rc16/rf8) was found under the reverse
sweep's VMEM working set; the eval kernels run store=False (no activation
cache, no grad accumulators), so their tile ceiling is much higher and
bigger tiles are pure matmul-row win (plain trunk fwd measured -24% time
from block 768 -> 2048, PERFORMANCE.md). This sweeps the eval tiles on a
400x400 vanilla frame (lego eval shapes: D=8/W=256, 64+128 samples,
chunk=8192) and checks rgb consistency vs the rc8/rf4 baseline.

Timing: render_image is one dispatch per call; per-dispatch timing
through the axon tunnel is noisy, so each setting times REPS back-to-back
calls and divides (queue depth amortizes the tunnel latency).
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

H = W = 400
REPS = 10
SWEEP = [(8, 4), (16, 8), (32, 16), (64, 32), (128, 64)]


def make_rays(n):
    from swnerf_tpu.render import Rays

    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), None)


def main():
    from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.render import RenderConfig, render_image

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = VanillaNeRFConfig(netwidth=width)
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=0.0,
                        white_bkgd=True, raw_noise_std=0.0)
    rays = make_rays(H * W)

    results, base_rgb = {}, None
    for rc, rf in SWEEP:
        os.environ["SWNERF_FUSED_TILE_EVAL_COARSE"] = str(rc)
        os.environ["SWNERF_FUSED_TILE_EVAL_FINE"] = str(rf)
        field = make_vanilla_field(cfg)  # re-attach eval_pass at new tiles
        params = field.init(jax.random.PRNGKey(0))
        fine = field.init(jax.random.PRNGKey(1))
        try:
            t0 = time.time()
            out = render_image(field, params, rays, rcfg, chunk=8192,
                               fine_params=fine, fine_field=field)
            rgb = jax.device_get(out["rgb"])
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(REPS):
                out = render_image(field, params, rays, rcfg, chunk=8192,
                                   fine_params=fine, fine_field=field)
            jax.block_until_ready(out["rgb"])
            ms = (time.time() - t0) / REPS * 1e3
        except Exception as e:
            print(f"rc{rc}/rf{rf}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[f"rc{rc}_rf{rf}"] = None
            continue
        if base_rgb is None:
            base_rgb, diff = rgb, 0.0
        else:
            diff = float(np.max(np.abs(rgb - base_rgb)))
        print(f"rc{rc:3d}/rf{rf:3d}: {ms:7.1f} ms/frame "
              f"(compile {compile_s:.0f}s, max|rgb-base| {diff:.2e})",
              flush=True)
        results[f"rc{rc}_rf{rf}"] = {"ms_per_frame": ms, "rgb_diff": diff}

    results["width"] = width
    with open(f"/tmp/tpu_eval_tiles_w{width}.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
