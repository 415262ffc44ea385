"""Benchmark: training-step throughput on the reference lego workload.

Metric: ray-samples/sec/chip on the full lego config — 1024 rays x (64
coarse + 64+128 fine) = 262144 MLP point-evals per optimizer step (reference
nerf/configs/lego.txt:13-19, nerf/run.py:389-407). Baseline (north star,
BASELINE.json): 10M ray-samples/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_RAY_SAMPLES_PER_SEC = 10e6  # BASELINE.json north star


def main():
    import os

    import jax
    import jax.numpy as jnp

    from swnerf_tpu.models import common as mcommon

    # Performance mode: bf16 MXU passes with fp32 accumulation (matches the
    # fused kernel's compute dtype). SWNERF_MATMUL_PRECISION=HIGHEST restores
    # full-fp32 parity mode.
    prec = os.environ.get("SWNERF_MATMUL_PRECISION", "DEFAULT").upper()
    mcommon.set_matmul_precision(getattr(jax.lax.Precision, prec))

    from swnerf_tpu.data.synthetic import render_gt
    from swnerf_tpu.models import VanillaNeRFConfig
    from swnerf_tpu.train import make_optimizer, make_train_step
    from swnerf_tpu.train.fused_step import make_fused_train_step, supports_fused_step
    from swnerf_tpu.train.loop import init_train_state
    from __graft_entry__ import _flagship

    field, params, rcfg, rays = _flagship()
    n_rays = rays.origins.shape[0]
    samples_per_step = n_rays * (2 * rcfg.n_samples + rcfg.n_importance)

    target = render_gt(rays, n_samples=64)
    opt = make_optimizer()
    state = init_train_state(params, opt)
    mcfg = VanillaNeRFConfig()  # _flagship's model config (D=8, W=256)
    use_fused_step = (
        jax.devices()[0].platform == "tpu"
        and prec == "DEFAULT"
        and os.environ.get("SWNERF_FUSED", "1") != "0"
        and os.environ.get("SWNERF_FUSED_STEP", "1") != "0"
        # Same dtype gate as the pipelines (run_nerf.py): the fused kernels
        # are bf16-trunk; SWNERF_FUSED_DTYPE=f32 must fall through to the
        # XLA step or an "f32 bench" silently measures bf16.
        and os.environ.get("SWNERF_FUSED_DTYPE", "bf16") == "bf16"
        and supports_fused_step(mcfg, mcfg, rcfg)
    )
    if use_fused_step:
        # The product path (run_nerf wiring): coarse render-loss kernel ->
        # Pallas sample_pdf -> fine render-loss kernel, grads in-VMEM.
        step = make_fused_train_step(mcfg, rcfg, opt, fcfg=mcfg)
    else:
        step = make_train_step(field, rcfg, opt)
    key = jax.random.PRNGKey(0)

    iters = 100

    # K steps inside one lax.scan = one dispatch; immune to async-dispatch
    # timing artifacts and representative of a production step loop.
    @jax.jit
    def run_steps(state):
        def body(s, _):
            s, m = step(s, rays, target, key)
            return s, m["loss"]

        state, losses = jax.lax.scan(body, state, None, length=iters)
        return state, losses

    # Warmup / compile.
    state, losses = run_steps(state)
    float(losses[-1])

    # Best of 3 timed reps: each is one dispatch of `iters` scan steps, so
    # the min is the steady-state device rate with the least tunnel/host
    # scheduling jitter (the axon remote backend adds per-dispatch latency
    # noise that a single rep can eat).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state)
        final_loss = float(losses[-1])  # host transfer forces full execution
        dt = min(dt, time.perf_counter() - t0)
        assert jnp.isfinite(final_loss)

    steps_per_sec = iters / dt
    value = steps_per_sec * samples_per_step / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "train ray-samples/sec/chip (lego 1024x(64+192))",
                "value": round(value, 1),
                "unit": "ray-samples/s/chip",
                "vs_baseline": round(value / BASELINE_RAY_SAMPLES_PER_SEC, 4),
                "extra": {
                    "iters_per_sec": round(steps_per_sec, 3),
                    "n_devices": jax.device_count(),
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
