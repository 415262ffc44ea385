"""Measure the LIVE run_nerf CLI loop on the real TPU at the FERN workload
shape (nerf/configs/fern.txt: N_rand=1024, 64+64 hierarchical, D=8/W=256,
LLFF dataset -> NDC projection + pooled epoch-shuffled ray batching) — the
reference's second headline workload family, whose training path differs
from lego in three ways: the ray pool replaces per-image sampling, rays are
NDC-projected inside the jitted step, and there is no white-background
composite. Reports steady-state ray-samples/sec/chip from the trainer's own
throughput counter (metrics.jsonl), K=1 and K=20 dispatch.

Run on the axon TPU (NO platform overrides):
    python /root/repo/benchmarks/tpu_llff_throughput.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = os.environ.get("CLI_BENCH_OUT", "/tmp/tpu_llff_bench")


def write_scene(data):
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="", PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
        PYTHONPATH="/root/repo",
    )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from swnerf_tpu.data.synthetic import write_llff_scene;"
        f"write_llff_scene({data!r}, n_images=20, size=100, n_samples=64)"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def run_cli(data, logs, exp, k, iters):
    env = dict(os.environ)
    env.update(
        # PREPEND to PYTHONPATH: /root/.axon_site must stay on it or the
        # sitecustomize that registers the axon TPU backend never runs.
        PYTHONPATH="/root/repo:" + env.get("PYTHONPATH", ""),
        SWNERF_MAX_ITERS=str(iters + 1),
        SWNERF_STEPS_PER_DISPATCH=str(k),
    )
    args = [
        sys.executable, "-m", "swnerf_tpu.pipelines.run_nerf",
        "--expname", exp, "--basedir", logs, "--datadir", data,
        "--dataset_type", "llff", "--factor", "1", "--llffhold", "8",
        "--use_viewdirs",
        "--netdepth", "8", "--netwidth", "256",
        "--netdepth_fine", "8", "--netwidth_fine", "256",
        "--multires", "10", "--multires_views", "4",
        "--N_rand", "1024", "--N_samples", "64", "--N_importance", "64",
        "--lrate", "5e-4", "--raw_noise_std", "1e0",
        "--chunk", "32768", "--precrop_iters", "0",
        "--i_weights", "1000000", "--i_print", "50",
        "--i_video", "1000000", "--i_testset", "1000000",
    ]
    t0 = time.time()
    r = subprocess.run(args, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        print(f"[{exp}] FAILED rc={r.returncode}\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}")
        return None
    rates = []
    with open(os.path.join(logs, exp, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "ray_samples_per_sec_per_chip" in rec:
                rates.append(rec["ray_samples_per_sec_per_chip"])
    best = max(rates) if rates else 0.0
    steady = max(rates[1:]) if len(rates) > 1 else best
    print(
        f"[{exp}] K={k}: steady {steady/1e6:.2f}M samp/s/chip "
        f"(best {best/1e6:.2f}M, {len(rates)} windows, wall {wall:.0f}s)",
        flush=True,
    )
    return steady


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    data = os.path.join(OUT, "data")
    logs = os.path.join(OUT, "logs")
    write_scene(data)
    print("scene written", flush=True)

    results = {}
    results["llff_k1"] = run_cli(data, logs, "llff_k1", 1, 400)
    results["llff_k20"] = run_cli(data, logs, "llff_k20", 20, 600)

    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
