"""Where does the MultiRes phase-2 joint step spend its time?

Times autodiff steps that render only a SUBSET of the pyramid levels
(grad + Adam for the included levels; the excluded renders are DCE'd by
jax.grad), at the product patch shapes 32/16/8/4 -> 1024/256/64/16 rays,
64 samples, DirectTemporalNeRF per level (deformation + canonical MLP
per point). Reference schedule: multires_dnerf.py:905-1008.

Variants:
  full        all 4 levels + pyramid-reconstruction term (= product step)
  no_recon    all 4 levels, per-level MSE only
  level0      only the 1024-ray level
  levels123   only the 3 small levels (256/64/16 rays)
  level3      only the 16-ray identity-embed level
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
import optax

STEPS = 150


def main():
    from swnerf_tpu.models import make_dnerf_field
    from swnerf_tpu.ops.rays import get_rays_at
    from swnerf_tpu.ops.pyramid import reconstruct_from_pyramid
    from swnerf_tpu.pipelines.run_multires import BASE_PATCH_SIZE, CHANNEL_LIST, _level_cfg
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.render.core import build_rays, render_rays
    from swnerf_tpu.train import make_optimizer, mse

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
    near, far = 2.0, 6.0

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

    def make_step(levels, with_recon):
        levels = list(levels)

        def loss_fn(params_sub, pixels_all, targets_all, target_full, poses, t, rng):
            total = 0.0
            outs = []
            for j, l in enumerate(levels):
                H_l, W_l, focal_l = pyr_hwf[l]
                ps = patch_sizes[l]
                rays_o, rays_d = get_rays_at(pixels_all[l], int(H_l), int(W_l), float(focal_l), poses)
                times = jnp.full((ps * ps, 1), t, jnp.float32)
                rays = build_rays(rays_o, rays_d, near, far,
                                  use_viewdirs=rcfg.use_viewdirs, times=times)
                out = render_rays(fields[l], params_sub[j]["coarse"], rays, rcfg, rng=rng)
                rgb = out["rgb"].reshape(ps, ps, 3)
                total = total + mse(rgb, targets_all[l])
                outs.append(rgb[None])
            if with_recon:
                recon = reconstruct_from_pyramid(outs)[0]
                total = total + mse(recon, target_full)
            return total

        def step(params_sub, opt_sub, pixels_all, targets_all, target_full, pose, t, rng):
            grads = jax.grad(loss_fn)(params_sub, pixels_all, targets_all,
                                      target_full, pose, t, rng)
            new_p, new_s = [], []
            for j, l in enumerate(levels):
                updates, st = opts[l].update(grads[j], opt_sub[j], params_sub[j])
                new_p.append(optax.apply_updates(params_sub[j], updates))
                new_s.append(st)
            return new_p, new_s

        def run(carry):
            def body(c, _):
                p, s = c
                return step(p, s, pixels_all, targets_all, target_full,
                            pose, jnp.float32(0.5), key), 0.0
            c, _ = jax.lax.scan(body, carry, None, length=STEPS)
            return c

        p_sub = [params_all[l] for l in levels]
        s_sub = [opt_states[l] for l in levels]
        return jax.jit(run), (p_sub, s_sub)

    sps_full = sum(ps * ps * 64 for ps in patch_sizes)
    variants = [
        ("full", (0, 1, 2, 3), True),
        ("no_recon", (0, 1, 2, 3), False),
        ("level0", (0,), False),
        ("levels123", (1, 2, 3), False),
        ("level3", (3,), False),
    ]
    results = {}
    for name, levels, recon in variants:
        fn, carry = make_step(levels, recon)

        def fetch(o):
            jax.device_get(jax.tree.map(lambda x: x.ravel()[0], jax.tree.leaves(o)[0]))
            return o

        t0 = time.time()
        out = fetch(fn(carry))
        compile_s = time.time() - t0
        t0 = time.time()
        out = fetch(fn(out))
        wall = time.time() - t0
        it_s = STEPS / wall
        ms = 1000.0 * wall / STEPS
        sps = sum(patch_sizes[l] ** 2 * 64 for l in levels)
        print(f"{name:10s}: {it_s:7.1f} it/s  {ms:6.2f} ms/step  "
              f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
        results[name] = {"it_per_s": it_s, "ms_per_step": ms}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
