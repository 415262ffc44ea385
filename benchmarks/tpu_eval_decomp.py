"""TPU: fused eval frame decomposition + chunk sweep (render_image surface).

The round-3 tile sweep (tpu_eval_tiles.py) fixed chunk=8192 and found the
rc32/rf16 kernel-tile optimum; this closes the remaining eval axes:

* chunk sweep — rays per lax.map iteration at the adopted tiles (the CLI
  default --chunk is 32768; render_image's own default 8192);
* pass decomposition — coarse-only (64 samp) and single-pass-192 frames
  attribute the full frame's time between the two kernels and the
  sample_pdf+merge seam, mirroring the train step's decomposition
  (PERFORMANCE.md "where the time actually goes").

Timing: REPS back-to-back render_image calls, divided (amortizes the axon
tunnel latency like tpu_eval_tiles.py). Writes /tmp/tpu_eval_decomp.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

H = W = 400
REPS = 10
CHUNKS = [8192, 4096, 16384, 32768]
results = {}


def make_rays(n):
    from swnerf_tpu.render import Rays

    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    return Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), None)


def timed(name, field, params, rays, rcfg, chunk, samples_per_ray):
    from swnerf_tpu.render import render_image

    out = render_image(field, params, rays, rcfg, chunk=chunk,
                       fine_params=params, fine_field=field)
    jax.block_until_ready(out["rgb"])
    t0 = time.time()
    for _ in range(REPS):
        out = render_image(field, params, rays, rcfg, chunk=chunk,
                           fine_params=params, fine_field=field)
    jax.block_until_ready(out["rgb"])
    ms = (time.time() - t0) / REPS * 1000.0
    msamp = H * W * samples_per_ray / ms / 1e3
    print(f"{name:40s}: {ms:7.1f} ms/frame  {msamp:6.1f}M samp/s", flush=True)
    results[name] = {"ms": ms, "msamp": msamp}
    return np.asarray(out["rgb"])


def main():
    from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.render import RenderConfig

    cfg = VanillaNeRFConfig()
    field = make_vanilla_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    rays = make_rays(H * W)

    full = RenderConfig(n_samples=64, n_importance=128, perturb=0.0,
                        white_bkgd=True, raw_noise_std=0.0)

    # The FIRST timed config after a fresh remote compile reads ~5 ms/frame
    # through the axon tunnel (enqueue artifact — confirmed positional by
    # reordering the sweep); time it once and discard.
    timed("(tunnel warmup, discarded)", field, params, rays, full, CHUNKS[0],
          256)
    results.pop("(tunnel warmup, discarded)", None)

    # Chunk sweep at the adopted rc32/rf16 eval tiles.
    base_rgb = None
    for ch in CHUNKS:
        rgb = timed(f"full 64+128, chunk={ch}", field, params, rays, full,
                    ch, 256)
        if base_rgb is None:
            base_rgb = rgb
        else:
            d = float(np.max(np.abs(rgb - base_rgb)))
            results[f"full 64+128, chunk={ch}"]["max_abs_drgb"] = d
            if d > 2e-2:
                print(f"  WARNING rgb mismatch vs chunk={CHUNKS[0]}: {d}",
                      flush=True)

    # Decomposition at the default chunk: coarse-only and single-pass-192.
    coarse = RenderConfig(n_samples=64, n_importance=0, perturb=0.0,
                          white_bkgd=True, raw_noise_std=0.0)
    timed("coarse-only 64, chunk=8192", field, params, rays, coarse, 8192, 64)
    one192 = RenderConfig(n_samples=192, n_importance=0, perturb=0.0,
                          white_bkgd=True, raw_noise_std=0.0)
    timed("single-pass 192, chunk=8192", field, params, rays, one192, 8192,
          192)

    with open("/tmp/tpu_eval_decomp.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
