"""Step-time ablation ladder on the real TPU: where do the 11.4 ms of a
lego train step go? Each variant is one lax.scan-wrapped jit (single
dispatch, CLAUDE.md benchmarking rule), timed over STEPS iterations.

Ladder (lego shapes: 1024 rays x 64 coarse + 192 fine, D=8/W=256 bf16
fused kernels):
  A. trunk fwd+bwd only (both passes, fixed pts/viewdirs, mse loss + Adam)
  B. A + positional encoding inside the step (embed XLA, grads flow)
  C. B + compositing (coarse + fine) — no resampling (fixed fine z)
  D. C + Pallas sample_pdf + merge sort (= the full render path)
  E. full train step via make_train_step (reference point = bench.py)
Deltas between rungs attribute the cost of each stage.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
from swnerf_tpu.ops.sampling import merge_z_vals, sample_along_rays, sample_pdf
from swnerf_tpu.ops.volume import composite
from swnerf_tpu.render import Rays, RenderConfig, render_rays
from swnerf_tpu.train import make_optimizer, make_train_step
from swnerf_tpu.train.loop import init_train_state

N_RAYS, N_C, N_F = 1024, 64, 128
STEPS = 150


def _fetch(out):
    # block_until_ready through the axon tunnel can return early; fetching a
    # concrete leaf forces real completion (CLAUDE.md benchmarking rule).
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jax.tree.map(lambda x: x.ravel()[0], leaf))
    return out


def timed(name, fn, state, args):
    # compile + warm
    t0 = time.time()
    out = _fetch(fn(state, *args))
    compile_s = time.time() - t0
    state = out[0]
    t0 = time.time()
    out = _fetch(fn(state, *args))
    wall = time.time() - t0
    it_s = STEPS / wall
    samp = it_s * N_RAYS * (N_C + N_C + N_F)
    print(f"{name}: {it_s:7.1f} it/s  {samp/1e6:6.2f}M samp/s/chip  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return {"it_per_s": it_s, "msamp": samp / 1e6}


def scan_wrap(step):
    def run(state, *args):
        def body(st, _):
            return step(st, *args), 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return (st,)
    return jax.jit(run, donate_argnums=())


def main():
    cfg = VanillaNeRFConfig()
    field = make_vanilla_field(cfg)
    rcfg = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0)
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    params = {"coarse": field.init(key), "fine": field.init(jax.random.PRNGKey(1))}
    state = init_train_state(params, opt)

    rng = np.random.default_rng(0)
    d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)
    target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
    pts_c = rays.origins[:, None, :] + rays.directions[:, None, :] * jnp.linspace(2, 6, N_C)[None, :, None]
    pts_f = rays.origins[:, None, :] + rays.directions[:, None, :] * jnp.linspace(2, 6, N_C + N_F)[None, :, None]

    results = {}

    # --- A: trunk-only (embeds precomputed outside the grad) -------------
    from swnerf_tpu.ops.embedding import positional_encoding

    emb_c = positional_encoding(pts_c, cfg.nf_pts)
    emb_f = positional_encoding(pts_f, cfg.nf_pts)
    vd_c = positional_encoding(jnp.broadcast_to(rays.viewdirs[:, None, :], pts_c.shape), cfg.nf_views)
    vd_f = positional_encoding(jnp.broadcast_to(rays.viewdirs[:, None, :], pts_f.shape), cfg.nf_views)
    from swnerf_tpu.ops.pallas.raymarch import fused_trunk

    def step_a(state, emb_c, vd_c, emb_f, vd_f, target):
        def loss(p):
            raw0 = fused_trunk(p["coarse"], cfg, emb_c, vd_c, compute_dtype=jnp.bfloat16)
            raw1 = fused_trunk(p["fine"], cfg, emb_f, vd_f, compute_dtype=jnp.bfloat16)
            return jnp.mean((jax.nn.sigmoid(raw0[..., :3]).mean(1) - target) ** 2) + \
                   jnp.mean((jax.nn.sigmoid(raw1[..., :3]).mean(1) - target) ** 2)
        g, _ = jax.value_and_grad(loss), None
        grads = jax.grad(loss)(state.params)
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return state._replace(params=optax.apply_updates(state.params, updates), opt_state=ost)

    results["A_trunk_only"] = timed("A trunk-only     ", scan_wrap(step_a), state,
                                    (emb_c, vd_c, emb_f, vd_f, target))

    # --- B: + encoding inside ---------------------------------------------
    def step_b(state, pts_c, pts_f, vd, target):
        def loss(p):
            ec = positional_encoding(pts_c, cfg.nf_pts)
            ef = positional_encoding(pts_f, cfg.nf_pts)
            vc = positional_encoding(jnp.broadcast_to(vd[:, None, :], pts_c.shape), cfg.nf_views)
            vf = positional_encoding(jnp.broadcast_to(vd[:, None, :], pts_f.shape), cfg.nf_views)
            raw0 = fused_trunk(p["coarse"], cfg, ec, vc, compute_dtype=jnp.bfloat16)
            raw1 = fused_trunk(p["fine"], cfg, ef, vf, compute_dtype=jnp.bfloat16)
            return jnp.mean((jax.nn.sigmoid(raw0[..., :3]).mean(1) - target) ** 2) + \
                   jnp.mean((jax.nn.sigmoid(raw1[..., :3]).mean(1) - target) ** 2)
        grads = jax.grad(loss)(state.params)
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return state._replace(params=optax.apply_updates(state.params, updates), opt_state=ost)

    results["B_plus_encode"] = timed("B +encode        ", scan_wrap(step_b), state,
                                     (pts_c, pts_f, rays.viewdirs, target))

    # --- C: + composite (fixed z, no resample) ----------------------------
    z_c = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N_C), (N_RAYS, N_C))
    z_f = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N_C + N_F), (N_RAYS, N_C + N_F))

    def step_c(state, pts_c, pts_f, vd, target, key):
        def loss(p):
            ec = positional_encoding(pts_c, cfg.nf_pts)
            ef = positional_encoding(pts_f, cfg.nf_pts)
            vc = positional_encoding(jnp.broadcast_to(vd[:, None, :], pts_c.shape), cfg.nf_views)
            vf = positional_encoding(jnp.broadcast_to(vd[:, None, :], pts_f.shape), cfg.nf_views)
            raw0 = fused_trunk(p["coarse"], cfg, ec, vc, compute_dtype=jnp.bfloat16)
            raw1 = fused_trunk(p["fine"], cfg, ef, vf, compute_dtype=jnp.bfloat16)
            o0 = composite(raw0, z_c, rays.directions, 1.0, True, key)
            o1 = composite(raw1, z_f, rays.directions, 1.0, True, key)
            return jnp.mean((o0.rgb - target) ** 2) + jnp.mean((o1.rgb - target) ** 2)
        grads = jax.grad(loss)(state.params)
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return state._replace(params=optax.apply_updates(state.params, updates), opt_state=ost)

    results["C_plus_composite"] = timed("C +composite     ", scan_wrap(step_c), state,
                                        (pts_c, pts_f, rays.viewdirs, target, key))

    # --- D: full render path (render_rays) --------------------------------
    def step_d(state, rays, target, key):
        def loss(p):
            out = render_rays(field, p["coarse"], rays, rcfg, rng=key, fine_params=p["fine"])
            return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)
        grads = jax.grad(loss)(state.params)
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return state._replace(params=optax.apply_updates(state.params, updates), opt_state=ost)

    results["D_full_render"] = timed("D full render    ", scan_wrap(step_d), state,
                                     (rays, target, key))

    # --- E: the product train step (rng folding, metrics) ------------------
    tstep = make_train_step(field, rcfg, opt)

    def step_e(state, rays, target, key):
        st, _ = tstep(state, rays, target, key)
        return st

    results["E_train_step"] = timed("E make_train_step", scan_wrap(step_e), state,
                                    (rays, target, key))

    print(json.dumps(results), flush=True)
    with open("/tmp/tpu_step_ablation.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
