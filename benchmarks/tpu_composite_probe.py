"""TPU: isolate the fused render kernel's composite cost.

The plain trunk kernel (no composite) measures ~88% of the bf16 roof while
the render kernels sit at 43-56% — probe whether the per-ray composite
machinery (segmented [B,1] scans + segment matmuls) is the gap:

  1. fine render kernel R4, full (param+input grads)      [baseline]
  2. fine render kernel R4, param grads only              [- input grads]
  3. fine render kernel R4, forward-only                  [fwd + composite]
  4. plain fused trunk forward, same points, block=B      [fwd, no composite]

(4 vs 3) = composite forward cost; (1 vs 2) = input-grad cost.
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


def timed_scan(name, body_fn, carry, npts):
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
        print(f"{name:46s}: FAILED {str(e)[:160]}", flush=True)
        results[name] = {"error": str(e)[:160]}
        return
    ms = 1000.0 * wall / STEPS
    print(f"{name:46s}: {ms:6.2f} ms  {npts / ms / 1e3:6.1f} Mpts/s (compile {compile_s:.0f}s)",
          flush=True)
    results[name] = {"ms": ms}


def main():
    from swnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_field
    from swnerf_tpu.ops.embedding import positional_encoding
    from swnerf_tpu.ops.pallas.raymarch import fused_field_raw
    from swnerf_tpu.ops.pallas.render_fused import fused_render_pass
    from swnerf_tpu.train.fused_step import _dists_scaled

    n, S = 500, 192
    cfg = DNeRFConfig()
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    pts = jnp.asarray(o)[:, None, :] + jnp.asarray(d)[:, None, :] * jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, (n, S)).astype(np.float32)), -1
    )[..., None]
    z = jnp.sort(jnp.asarray(rng.uniform(2.0, 6.0, (n, S)).astype(np.float32)), -1)
    vd_emb = positional_encoding(jnp.asarray(d), cfg.nf_views)
    dists = _dists_scaled(z, jnp.asarray(d))
    noise = jnp.zeros(z.shape)
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    params = make_dnerf_field(cfg, fused=False).init(jax.random.PRNGKey(0))["canonical"]
    npts = n * S

    def variant(name, need_in, need_par):
        def body(pc):
            res, grads = fused_render_pass(
                pc, cfg, None, vd_emb, z, dists, noise, target, True,
                1.0 / (3 * n), rays_per_tile=4, compute_dtype=jnp.bfloat16,
                pts=pts, need_input_grads=need_in, need_param_grads=need_par,
            )
            s = jnp.sum(res["sqerr"]) + jnp.sum(res["rgb"])
            if need_in:
                s = s + jnp.sum(res["dx8"])
            if need_par:
                return jax.tree.map(lambda a, g: a + 0.0 * (g + s), pc, grads)
            return jax.tree.map(lambda a: a + 0.0 * s, pc)

        timed_scan(name, body, params, npts)

    variant("fine R4 full (param+input grads)", True, True)
    variant("fine R4 param grads only", False, True)
    variant("fine R4 forward-only", False, False)

    # Plain trunk forward on the same points (no composite): viewdirs per
    # point, raw [.., 4] out.
    vd_pts = jnp.broadcast_to(jnp.asarray(d)[:, None, :], pts.shape)

    def plain_body(pc):
        raw = fused_field_raw(pc, cfg, pts, vd_pts, block=768,
                              compute_dtype=jnp.bfloat16)
        return jax.tree.map(lambda a: a + 0.0 * jnp.sum(raw), pc)

    timed_scan("plain trunk fwd (block=768, no composite)", plain_body, params, npts)

    def plain_body2(pc):
        raw = fused_field_raw(pc, cfg, pts, vd_pts, block=2048,
                              compute_dtype=jnp.bfloat16)
        return jax.tree.map(lambda a: a + 0.0 * jnp.sum(raw), pc)

    timed_scan("plain trunk fwd (block=2048, no composite)", plain_body2, params, npts)

    with open("/tmp/tpu_composite_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
