"""Where does the fused two-kernel step's time go? 104 it/s = 9.6 ms/step
but the two render-loss kernels are only ~1.4 ms — ablate the rest.

Ladder (each timed as a 150-step lax.scan, one dispatch):
  A kernels+adam : coarse+fine fused_render_pass on precomputed inputs
  B +embed/pts   : pts, positional encodings, dists computed in-step
  C +sampling    : stratified z jitter + density noise draws (threefry)
  D +pdf/merge   : sample_pdf kernel + z merge = the full fused step
  D0 full, no rng: full step with perturb=0, noise=0 (isolates threefry)
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

from swnerf_tpu.models import VanillaNeRFConfig
from swnerf_tpu.models.vanilla import init_vanilla_params
from swnerf_tpu.ops.embedding import positional_encoding
from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
from swnerf_tpu.ops.sampling import merge_z_vals, sample_along_rays, sample_pdf
from swnerf_tpu.render import Rays, RenderConfig
from swnerf_tpu.train import make_optimizer
from swnerf_tpu.train.fused_step import make_fused_train_step, _dists_scaled
from swnerf_tpu.train.loop import TrainState, init_train_state

N_RAYS, N_C, N_F = 1024, 64, 128
STEPS = 150
SPS = N_RAYS * (N_C + N_C + N_F)
RC, RF = 8, 2


def timed(name, step, state, args):
    def run(state, *a):
        def body(st, _):
            return step(st, *a), 0.0
        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return st

    fn = jax.jit(run)

    def fetch(st):
        jax.device_get(jax.tree.leaves(st.params)[0].ravel()[0])
        return st

    try:
        t0 = time.time(); st = fetch(fn(state, *args)); compile_s = time.time() - t0
        t0 = time.time(); st = fetch(fn(st, *args)); wall = time.time() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    ms = wall / STEPS * 1e3
    print(f"{name}: {ms:6.2f} ms/step  {STEPS/wall:6.1f} it/s  "
          f"{STEPS/wall*SPS/1e6:6.2f}M samp/s (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    cfg = VanillaNeRFConfig()
    rcfg = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0)
    opt = make_optimizer()
    params = {"coarse": init_vanilla_params(jax.random.PRNGKey(0), cfg),
              "fine": init_vanilla_params(jax.random.PRNGKey(1), cfg)}
    state = init_train_state(params, opt)

    rng = np.random.default_rng(0)
    d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)
    target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    scale = 1.0 / (3.0 * N_RAYS)
    results = {}

    z_c = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N_C), (N_RAYS, N_C))
    z_f = jnp.sort(jnp.concatenate(
        [z_c, jnp.asarray(rng.uniform(2, 6, (N_RAYS, N_F)).astype(np.float32))], -1), -1)
    vd_emb = positional_encoding(rays.viewdirs, cfg.nf_views)

    def emb_of(z):
        pts = rays.origins[:, None, :] + rays.directions[:, None, :] * z[..., None]
        return positional_encoding(pts, cfg.nf_pts)

    emb_c, emb_f = emb_of(z_c), emb_of(z_f)
    dists_c = _dists_scaled(z_c, rays.directions)
    dists_f = _dists_scaled(z_f, rays.directions)
    nz_c, nz_f = jnp.zeros_like(z_c), jnp.zeros_like(z_f)

    def adam(state, grads_c, grads_f):
        grads = {"coarse": grads_c, "fine": grads_f}
        updates, ost = opt.update(grads, state.opt_state, state.params)
        return TrainState(state.step + 1, optax.apply_updates(state.params, updates), ost)

    # --- A: kernels + adam on precomputed inputs --------------------------
    def step_a(state, emb_c, emb_f):
        _, gc = fused_render_pass(state.params["coarse"], cfg, emb_c, vd_emb, z_c,
                                  dists_c, nz_c, target, True, scale, rays_per_tile=RC)
        _, gf = fused_render_pass(state.params["fine"], cfg, emb_f, vd_emb, z_f,
                                  dists_f, nz_f, target, True, scale, rays_per_tile=RF)
        return adam(state, gc, gf)

    results["A_kernels_adam"] = timed("A kernels+adam ", step_a, state, (emb_c, emb_f))

    # --- B: + pts/embedding in-step ----------------------------------------
    def step_b(state, z_c, z_f):
        _, gc = fused_render_pass(state.params["coarse"], cfg, emb_of(z_c), vd_emb,
                                  z_c, _dists_scaled(z_c, rays.directions), nz_c,
                                  target, True, scale, rays_per_tile=RC)
        _, gf = fused_render_pass(state.params["fine"], cfg, emb_of(z_f), vd_emb,
                                  z_f, _dists_scaled(z_f, rays.directions), nz_f,
                                  target, True, scale, rays_per_tile=RF)
        return adam(state, gc, gf)

    results["B_plus_embed"] = timed("B +embed/pts   ", step_b, state, (z_c, z_f))

    # --- C: + stratified jitter + noise draws ------------------------------
    def step_c(state, key):
        k = jax.random.fold_in(key, state.step)
        k_jit, k_n0, k_n1 = jax.random.split(k, 3)
        z1 = sample_along_rays(k_jit, rays.near, rays.far, N_C, 1.0, False)
        n0 = jax.random.normal(k_n0, z1.shape)
        n1 = jax.random.normal(k_n1, z_f.shape)
        _, gc = fused_render_pass(state.params["coarse"], cfg, emb_of(z1), vd_emb,
                                  z1, _dists_scaled(z1, rays.directions), n0,
                                  target, True, scale, rays_per_tile=RC)
        _, gf = fused_render_pass(state.params["fine"], cfg, emb_of(z_f), vd_emb,
                                  z_f, _dists_scaled(z_f, rays.directions), n1,
                                  target, True, scale, rays_per_tile=RF)
        return adam(state, gc, gf)

    results["C_plus_rng"] = timed("C +jitter/noise", step_c, state, (key,))

    # --- D: the full fused step -------------------------------------------
    full = make_fused_train_step(cfg, rcfg, opt, fcfg=cfg,
                                 rays_per_tile_coarse=RC, rays_per_tile_fine=RF)

    def step_d(state, rays, target, key):
        st, _ = full(state, rays, target, key)
        return st

    results["D_full"] = timed("D full step    ", step_d, state, (rays, target, key))

    # --- D0: full but deterministic (no threefry, det pdf) ------------------
    rcfg0 = RenderConfig(n_samples=N_C, n_importance=N_F, perturb=0.0,
                         white_bkgd=True, raw_noise_std=0.0)
    full0 = make_fused_train_step(cfg, rcfg0, opt, fcfg=cfg,
                                  rays_per_tile_coarse=RC, rays_per_tile_fine=RF)

    def step_d0(state, rays, target, key):
        st, _ = full0(state, rays, target, key)
        return st

    results["D0_full_no_rng"] = timed("D0 full, no rng", step_d0, state, (rays, target, key))

    # --- E: sample_pdf + merge alone ---------------------------------------
    w = jnp.asarray(rng.uniform(0.01, 1, (N_RAYS, N_C)).astype(np.float32))

    def step_e(state, w, key):
        k = jax.random.fold_in(key, state.step)
        zm = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
        zs = sample_pdf(zm, w[..., 1:-1], N_F, rng=k, det=False)
        za = merge_z_vals(z_c, jax.lax.stop_gradient(zs))
        g = jax.tree.map(lambda x: jnp.zeros_like(x) + za.sum() * 0, state.params)
        updates, ost = opt.update(g, state.opt_state, state.params)
        return TrainState(state.step + 1, optax.apply_updates(state.params, updates), ost)

    results["E_pdf_merge"] = timed("E pdf+merge    ", step_e, state, (w, key))

    with open("/tmp/tpu_fused_ablation.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
