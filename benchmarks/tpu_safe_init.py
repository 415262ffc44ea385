"""Does SWNERF_SAFE_INIT rescue a dead VANILLA seed end-to-end (no noise)?

Full-size vanilla model, coarse-only (n_importance=0), synthetic emissive
sphere scene, raw_noise_std=0 (no unsticking crutch), seed 1 — an init
whose density is negative everywhere (ReLU-dead, zero gradients).

Runs the product train step 1,000 iters with the default init and with
SWNERF_SAFE_INIT=1, printing the train-PSNR trajectory and a held-out
eval PSNR for both. (D-NeRF is measured separately and NOT rescued:
benchmarks/tpu_parity_seeds.py seeds 2/3/6 with the knob still collapse
to the background optimum — see PERFORMANCE.md.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def run_one(safe: bool, iters: int = 1000):
    os.environ["SWNERF_SAFE_INIT"] = "1" if safe else "0"
    from swnerf_tpu.data.synthetic import write_blender_scene
    from swnerf_tpu.data.blender import load_blender_data
    from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.ops.rays import get_rays_np
    from swnerf_tpu.render import RenderConfig, render_image
    from swnerf_tpu.render.core import build_rays
    from swnerf_tpu.train import make_optimizer, make_train_step
    from swnerf_tpu.train.loop import init_train_state
    from swnerf_tpu.train.fused_step import make_fused_train_step, supports_fused_step

    data = "/tmp/safeinit_scene"
    if not os.path.isdir(data):
        write_blender_scene(data, n_train=12, n_val=2, n_test=2, size=64)
    images, poses, _rp, hwf, i_split = load_blender_data(data, testskip=1)
    images = images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
    H, W, focal = int(hwf[0]), int(hwf[1]), hwf[2]
    near, far = 2.0, 6.0

    cfg = VanillaNeRFConfig()
    field = make_vanilla_field(cfg)
    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0,
                        white_bkgd=True, raw_noise_std=0.0, use_viewdirs=True)
    opt = make_optimizer()
    params = {"coarse": field.init(jax.random.PRNGKey(1)), "fine": None}
    state = init_train_state(params, opt)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and supports_fused_step(cfg, None, rcfg):
        step = make_fused_train_step(cfg, rcfg, opt)
    else:
        step = make_train_step(field, rcfg, opt)
    jstep = jax.jit(step, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    i_train = i_split[0]
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for i in range(iters):
        img_i = int(rng.choice(i_train))
        ys = rng.integers(0, H, 1024)
        xs = rng.integers(0, W, 1024)
        ro, rd = get_rays_np(H, W, focal, poses[img_i, :3, :4])
        ro, rd = ro[ys, xs], rd[ys, xs]
        target = jnp.asarray(images[img_i, ys, xs])
        rays = build_rays(jnp.asarray(ro), jnp.asarray(rd), near, far,
                          use_viewdirs=True)
        state, metrics = jstep(state, rays, target, key)
        if i % 200 == 0 or i == iters - 1:
            print(f"  [{'safe' if safe else 'dead'}] iter {i}: "
                  f"psnr {float(metrics['psnr']):.2f}", flush=True)

    # Held-out eval.
    ro, rd = get_rays_np(H, W, focal, poses[i_split[2][0], :3, :4])
    rays = build_rays(jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
                      near, far, use_viewdirs=True)
    out = render_image(field, state.params["coarse"], rays, rcfg, chunk=8192)
    gt = images[i_split[2][0]]
    mse = float(jnp.mean((out["rgb"].reshape(H, W, 3) - gt) ** 2))
    psnr = -10.0 * np.log10(mse)
    print(f"{'safe' if safe else 'dead'}: eval PSNR {psnr:.2f} dB "
          f"({time.time()-t0:.0f}s)", flush=True)
    return psnr


def main():
    dead = run_one(safe=False)
    safe = run_one(safe=True)
    print(f"RESULT seed1 vanilla no-noise 1k iters: default {dead:.2f} dB, "
          f"SWNERF_SAFE_INIT=1 {safe:.2f} dB")


if __name__ == "__main__":
    main()
