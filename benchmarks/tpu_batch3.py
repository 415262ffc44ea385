"""TPU batch 3: D-NeRF and MultiRes training-step throughput with the
current kernel stack (VERDICT round-1: D-NeRF 10.8M marginal, MultiRes
unmeasured)."""

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


def scan_timed(name, step, state, args, samples_per_step):
    def run(state, *a):
        def body(st, _):
            return step(st, *a), 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return (st,)

    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        jax.device_get(jax.tree.map(lambda x: x.ravel()[0], leaf))
        return o

    fn = jax.jit(run)
    t0 = time.time()
    out = fetch(fn(state, *args))
    compile_s = time.time() - t0
    t0 = time.time()
    out = fetch(fn(out[0], *args))
    wall = time.time() - t0
    it_s = STEPS / wall
    msamp = it_s * samples_per_step / 1e6
    print(f"{name}: {it_s:7.1f} it/s  {msamp:6.2f}M samp/s/chip (compile {compile_s:.0f}s)",
          flush=True)
    return {"it_per_s": it_s, "msamp": msamp}


def dnerf_bench(results):
    """bouncingballs workload: N_rand=500, 64+128 samples, TV loss, shared
    model (coarse stop-grad), direct_temporal, full-size canonical."""
    import optax

    from swnerf_tpu.models import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.render import Rays, RenderConfig, render_rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.loop import init_train_state

    n_rand = 500
    cfg = DNeRFConfig()
    field = make_dnerf_field(cfg)
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, coarse_contributes=False)
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rand, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n_rand, 3), np.float32); o[:, 2] = 4.0
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n_rand,), 2.0), jnp.full((n_rand,), 6.0),
                jnp.full((n_rand, 1), 0.5))
    target = jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32))
    opt = make_optimizer()
    params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
    state = init_train_state(params, opt)
    key = jax.random.PRNGKey(1)
    import optax

    def step(state, rays, target, key):
        def loss(p):
            out = render_rays(field, p["coarse"], rays, rcfg, rng=key)
            l = jnp.mean((out["rgb"] - target) ** 2)
            # TV: re-render at neighbor time with frozen z_vals
            z = jax.lax.stop_gradient(out["z_vals"])
            rays_n = rays._replace(times=jnp.full((n_rand, 1), 0.6))
            out_n = render_rays(field, p["coarse"], rays_n, rcfg, rng=key, z_vals=z)
            return l + 1e-3 * jnp.sum((out["aux"]["dx"] - out_n["aux"]["dx"]) ** 2)
        grads = jax.grad(loss)(state.params)
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return state._replace(params=optax.apply_updates(state.params, updates),
                              opt_state=ost)

    # samples/step: coarse 64 + fine 192 + TV re-render at 192
    sps = n_rand * (64 + 192 + 192)
    results["dnerf_tv"] = scan_timed("dnerf_tv (500 rays)", step, state,
                                     (rays, target, key), sps)


def multires_bench(results):
    """Phase-2 joint patch step throughput (4 levels, 32/16/8/4 patches,
    64 samples, no fine pass)."""
    from swnerf_tpu.pipelines.run_multires import (
        BASE_PATCH_SIZE, CHANNEL_LIST, _level_cfg, make_phase2_step,
    )
    from swnerf_tpu.models import make_dnerf_field
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
        fields.append(f); params_all.append(p); opts.append(opt)
        opt_states.append(opt.init(p))
        s = 2**layer
        pyr_hwf.append([H // s, W // s, focal / s])
        patch_sizes.append(max(BASE_PATCH_SIZE // s, 1))

    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0, white_bkgd=True)
    step = make_phase2_step(args, fields, opts, rcfg, pyr_hwf, patch_sizes, 2.0, 6.0)
    # step is jitted (donated args) — wrap the RAW python fn in the scan.
    raw = step.__wrapped__

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

    class MState:
        pass

    def step1(carry, pixels_all, targets_all, target_full, pose, key):
        params_all, opt_states = carry
        np_, ns_, _ = raw(params_all, opt_states, pixels_all, targets_all,
                          target_full, pose, jnp.float32(0.5), jnp.float32(1.0), key)
        return (np_, ns_)

    sps = sum(ps * ps * 64 for ps in patch_sizes)
    results["multires_phase2"] = scan_timed(
        "multires_phase2    ", step1, (params_all, opt_states),
        (pixels_all, targets_all, target_full, pose, key), sps,
    )


def main():
    results = {}
    dnerf_bench(results)
    multires_bench(results)
    with open("/tmp/tpu_batch3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
