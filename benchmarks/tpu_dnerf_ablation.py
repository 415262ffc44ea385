"""TPU: D-NeRF fused-step time decomposition (round-3 perf work).

Measures, on the bouncingballs shape (500 rays, 64 + 192 samples, shared
fine, TV 1e-4):
  1. the product fused step (baseline);
  2. - TV loss (isolates the 2x-batch deformation eval + its backward);
  3. - density noise (isolates the threefry noise draws);
  4. fine tile R=4 (expected VMEM fail — records the error);
  5. deformation-net microbenches: fwd-only and fwd+bwd on the fine-pass
     point count (the step's dominant non-render cost);
  6. fine render-loss kernel alone (input grads) at R=2.

One process so jit caches carry over. Writes /tmp/tpu_dnerf_ablation.json.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

STEPS = 150
results = {}


def timed_scan(name, body_fn, carry, sps):
    """body_fn(carry) -> carry; times STEPS iterations in one dispatch."""
    def run(c):
        def body(c, _):
            return body_fn(c), 0.0
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c

    fn = jax.jit(run)
    t0 = time.time()
    c = fn(carry)
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    c = fn(c)
    jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
    wall = time.time() - t0
    it_s = STEPS / wall
    ms = 1000.0 / it_s
    print(f"{name:44s}: {it_s:7.1f} it/s  {ms:6.2f} ms  "
          f"{it_s * sps / 1e6:6.2f}M samp/s (compile {compile_s:.0f}s)",
          flush=True)
    results[name] = {"it_per_s": it_s, "ms": ms, "msamp": it_s * sps / 1e6}


def main():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.ops.embedding import positional_encoding
    from swnerf_tpu.ops.pallas.raymarch import fused_time_net
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.render.core import Rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import _dists_scaled, make_fused_dnerf_step
    from swnerf_tpu.train.loop import init_train_state

    n = 500
    cfg = DNeRFConfig()
    opt = make_optimizer()
    field = make_dnerf_field(cfg)
    del field

    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    t = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((n,), 2.0), jnp.full((n,), 6.0), jnp.asarray(t))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    nt = jnp.float32(0.4)
    sps = n * 256  # rendered samples per step (64 coarse + 192 fine)

    params = {"coarse": make_dnerf_field(cfg, fused=False).init(jax.random.PRNGKey(0)),
              "fine": None}

    def step_variant(name, rcfg, add_tv, fine_tile=None):
        kw = {}
        if fine_tile is not None:
            kw["rays_per_tile_fine"] = fine_tile
        step = make_fused_dnerf_step(cfg, rcfg, opt, add_tv_loss=add_tv,
                                     tv_loss_weight=1e-4 if add_tv else 0.0, **kw)
        state = init_train_state(params, opt)

        def body(st):
            st, _ = step(st, rays, target, nt, key)
            return st

        try:
            timed_scan(name, body, state, sps)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            results[name] = {"error": str(e)[:300]}

    base = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0,
                        coarse_contributes=False)
    step_variant("fused baseline (TV, noise, rf2)", base, True)
    step_variant("fused no-TV", base, False)
    step_variant("fused no-noise",
                 RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                              white_bkgd=True, raw_noise_std=0.0,
                              coarse_contributes=False), True)
    step_variant("fused rf4 (VMEM probe)", base, True, fine_tile=4)

    # --- deformation-net microbenches on the fine point count ---
    S_f = 192
    pts_f = jnp.asarray(rng.standard_normal((n, S_f, 3)).astype(np.float32))
    tcol = jnp.asarray(t)
    tp = params["coarse"]["time_net"]

    pe = positional_encoding(pts_f, cfg.nf_pts)
    tb = jnp.broadcast_to(tcol[..., None, :], pts_f.shape[:-1] + (1,))
    te = positional_encoding(tb, cfg.nf_time)
    pe2 = jnp.concatenate([pe, pe], 0)
    te2 = jnp.concatenate([te, te], 0)
    npts2 = 2 * n * S_f

    def dx_fwd(tp_):
        return jnp.sum(fused_time_net(tp_, cfg, pe2, te2,
                                      compute_dtype=jnp.bfloat16,
                                      need_input_grads=False))

    def fwd_body(tp_):
        s = dx_fwd(tp_)
        return jax.tree.map(lambda x: x + s * 0.0, tp_)

    timed_scan(f"time-net fwd 2x-batch ({npts2} pts)", fwd_body, tp, sps)

    def bwd_body(tp_):
        g = jax.grad(dx_fwd)(tp_)
        return jax.tree.map(lambda a, b: a + 0.0 * b, tp_, g)

    timed_scan(f"time-net fwd+bwd 2x-batch ({npts2} pts)", bwd_body, tp, sps)

    # --- fine render kernel alone (input grads, R=2) ---
    z_all = jnp.sort(jnp.asarray(rng.uniform(2.0, 6.0, (n, S_f)).astype(np.float32)), -1)
    vd_emb = positional_encoding(rays.viewdirs, cfg.nf_views)
    dists = _dists_scaled(z_all, rays.directions)
    noise = jnp.zeros(z_all.shape)

    def fine_kernel_body(pc):
        res, grads = fused_render_pass(
            pc, cfg, None, vd_emb, z_all, dists, noise, target, True,
            1.0 / (3 * n), rays_per_tile=2, compute_dtype=jnp.bfloat16,
            pts=pts_f, need_input_grads=True, need_param_grads=True,
        )
        s = jnp.sum(res["sqerr"]) + jnp.sum(res["dx8"])
        return jax.tree.map(lambda a, g: a + 0.0 * (g + s), pc, grads)

    timed_scan("fine render kernel alone (R2, input grads)",
               fine_kernel_body, params["coarse"]["canonical"], sps)

    def fine_kernel_body_r4(pc):
        res, grads = fused_render_pass(
            pc, cfg, None, vd_emb, z_all, dists, noise, target, True,
            1.0 / (3 * n), rays_per_tile=4, compute_dtype=jnp.bfloat16,
            pts=pts_f, need_input_grads=True, need_param_grads=True,
        )
        s = jnp.sum(res["sqerr"]) + jnp.sum(res["dx8"])
        return jax.tree.map(lambda a, g: a + 0.0 * (g + s), pc, grads)

    try:
        timed_scan("fine render kernel alone (R4, input grads)",
                   fine_kernel_body_r4, params["coarse"]["canonical"], sps)
    except Exception as e:
        print("R4 fine kernel FAILED:", str(e)[:300], flush=True)
        results["fine R4"] = {"error": str(e)[:300]}

    with open("/tmp/tpu_dnerf_ablation.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
