"""TPU batch 2: step ablation ladder + fused-vs-XLA T-NeRF throughput.
Run after tpu_cli_throughput.py (serialize TPU use)."""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

N_RAYS = 1024
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


def tnerf_bench(results):
    import optax

    from swnerf_tpu.models.tnerf import TNeRFConfig, make_tnerf_field
    from swnerf_tpu.render import Rays, RenderConfig, render_rays
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.loop import init_train_state

    cfg = TNeRFConfig()  # depth 8, net_dim 128 (reference run_tnerf wiring)
    rcfg = RenderConfig(n_samples=64, n_importance=0, perturb=1.0, white_bkgd=True)
    rng = np.random.default_rng(0)
    d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((N_RAYS, 3), np.float32); o[:, 2] = 4.0
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0),
                jnp.full((N_RAYS, 1), 0.5))
    target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)

    for tag, fused in (("tnerf_xla", False), ("tnerf_fused", True)):
        field = make_tnerf_field(cfg, fused=fused)
        params = {"coarse": field.init(jax.random.PRNGKey(0)), "fine": None}
        state = init_train_state(params, opt)

        def step(state, rays, target, key):
            def loss(p):
                out = render_rays(field, p["coarse"], rays, rcfg, rng=key)
                return jnp.mean((out["rgb"] - target) ** 2)
            grads = jax.grad(loss)(state.params)
            updates, ost = opt.update(grads, state.opt_state, state.params)
            return state._replace(params=optax.apply_updates(state.params, updates),
                                  opt_state=ost)

        results[tag] = scan_timed(f"{tag:17s}", step, state, (rays, target, key),
                                  N_RAYS * 64)


def main():
    results = {}
    # Rung ladder (separate process keeps its own jit cache irrelevant).
    r = subprocess.run([sys.executable, "/root/repo/benchmarks/tpu_step_ablation.py"],
                       capture_output=True, text=True)
    print(r.stdout, flush=True)
    if r.returncode != 0:
        print("ablation FAILED:\n", r.stderr[-3000:], flush=True)
    else:
        try:
            results["ablation"] = json.load(open("/tmp/tpu_step_ablation.json"))
        except Exception:
            pass

    tnerf_bench(results)

    # CLI rerun with the per-ray viewdir-embed fix (image path, K=1).
    import os
    env = dict(os.environ)
    env.update(PYTHONPATH="/root/repo:" + env.get("PYTHONPATH", ""),
               CLI_BENCH_OUT="/tmp/tpu_cli_bench2")
    code = (
        "import sys; sys.path.insert(0,'/root/repo');"
        "from benchmarks.tpu_cli_throughput import write_scene, run_cli;"
        "import os, json;"
        "out=os.environ['CLI_BENCH_OUT']; data=os.path.join(out,'data'); logs=os.path.join(out,'logs');"
        "os.makedirs(out, exist_ok=True); write_scene(data);"
        "r1=run_cli(data, logs, 'img_k1_fix', 1, 400, ['--no_batching']);"
        "r2=run_cli(data, logs, 'img_k1_quiet', 1, 1000, ['--no_batching','--i_print','500']);"
        "print(json.dumps({'img_k1_fix': r1, 'img_k1_quiet': r2}))"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True)
    print(r.stdout, flush=True)
    if r.returncode != 0:
        print("cli rerun FAILED:\n", r.stderr[-3000:], flush=True)

    with open("/tmp/tpu_batch2.json", "w") as f:
        json.dump(results, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
