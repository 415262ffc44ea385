"""Full reference-scale training run on the real TPU.

Every parity/throughput study so far ran 2k-10k iterations; the
reference's headline workloads are *200,000* (lego, nerf/configs/lego.txt:13-19
with run.py:625's hardcoded N_iters) and 800,000 (bouncingballs,
d_nerf/configs/bouncingballs.txt:14-21). This script runs the COMPLETE
workload — reference constants, reference periodic-artifact cadence
(i_weights/i_video/i_testset), the real CLI trainer — on the synthetic
textured scene at the reference's 400x400 half-res image size, and
records wall clock + final test PSNR/SSIM through the product surface
(render_only --render_test -> metrics.json).

The reference cannot run this comparison on this host (its measured
5k-iter LLFF run took 8,273 s on the one CPU core; 200k iters of the
heavier lego shape extrapolates to ~2 weeks). The point of this artifact
is end-to-end proof at full scale: 200k optimizer steps of the fused
bf16 kernels, LR decayed over the reference schedule, periodic
checkpoint/video/testset artifacts at reference cadence, finite and
converged at the end — in ~half an hour on one chip.

Usage:
  FS_MODE=nerf  FS_ITERS=200000 python benchmarks/tpu_full_scale.py
  FS_MODE=dnerf FS_ITERS=200000 python benchmarks/tpu_full_scale.py

Knobs: FS_SIZE (image side, default 400), FS_NTRAIN (default 100),
FS_OUT (default /tmp/full_scale).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = os.environ.get("FS_MODE", "nerf")
ITERS = int(os.environ.get("FS_ITERS", "200000"))
SIZE = int(os.environ.get("FS_SIZE", "400"))
N_TRAIN = int(os.environ.get("FS_NTRAIN", "100"))
OUT = os.environ.get("FS_OUT", "/tmp/full_scale")
# Smoke-test shape overrides (leave unset for the reference constants):
N_RAND = os.environ.get("FS_NRAND")
N_SAMP = os.environ.get("FS_SAMPLES")


def lego_scale_config(data):
    """nerf/configs/lego.txt constants (the BASELINE.md lego row): 1024
    rays x (64+128) samples, white background, precrop 500@0.5, exp LR
    decay over 500k steps. half_res is False because the scene is written
    directly at the 400px half-res size."""
    return {
        "datadir": data,
        "dataset_type": "blender",
        "no_batching": "True",
        "use_viewdirs": "True",
        "white_bkgd": "True",
        "lrate": "5e-4",
        "lrate_decay": "500",
        "N_rand": "1024",
        "N_samples": "64",
        "N_importance": "128",
        "netdepth": "8",
        "netwidth": "256",
        "netdepth_fine": "8",
        "netwidth_fine": "256",
        "multires": "10",
        "multires_views": "4",
        "raw_noise_std": "0",
        "precrop_iters": "500",
        "precrop_frac": "0.5",
        "testskip": "1",
        # Reference periodic cadence (utils.py defaults used by lego.txt),
        # clamped so short FS_ITERS smokes still land a final checkpoint.
        # FS_IVIDEO/FS_ITEST/FS_IWEIGHTS override for the 800k runs, where
        # the reference cadence would spend ~45 min rendering 20 spiral
        # videos — the checkpoint chain keeps the 10k cadence regardless:
        "i_weights": os.environ.get("FS_IWEIGHTS", str(min(10000, ITERS))),
        "i_print": "1000",
        "i_video": os.environ.get("FS_IVIDEO", str(min(50000, 2 * ITERS))),
        "i_testset": os.environ.get("FS_ITEST", str(min(50000, 2 * ITERS))),
        "i_img": "10000000",
        "half_res": "False",
    }


def bouncingballs_scale_config(data):
    """d_nerf/configs/bouncingballs.txt constants: 500 rays x (64+128),
    tv_loss 1e-4, testskip 1, half_res 400px (written directly)."""
    cfg = lego_scale_config(data)
    cfg.update(
        N_rand="500",
        nerf_type="direct_temporal",
        N_iter=str(ITERS),
        add_tv_loss="True",
        tv_loss_weight="1e-4",
        precrop_iters="0",
        precrop_iters_time="0",
        use_two_models_for_fine="False",
        raw_noise_std="1e0",
    )
    return cfg


def tnerf_scale_config(data):
    """t_nerf/configs/bouncingballs.txt shape: single time-conditioned
    net, N_importance forced 0 (reference run_tnerf.py:329), no TV."""
    cfg = bouncingballs_scale_config(data)
    cfg.update(N_importance="0", add_tv_loss="False")
    return cfg


def main():
    os.makedirs(OUT, exist_ok=True)
    dyn = MODE in ("dnerf", "tnerf")
    data = os.path.join(OUT, f"data_{'dyn' if dyn else MODE}_{SIZE}")
    if not os.path.isdir(data):
        from swnerf_tpu.data.synthetic import write_blender_scene

        t0 = time.time()
        write_blender_scene(
            data,
            n_train=N_TRAIN,
            n_val=5,
            n_test=25,
            size=SIZE,
            dynamic=dyn,
            scene="textured",
            white_bkgd=True,
        )
        print(f"scene written: {data} ({time.time() - t0:.1f}s)", flush=True)

    cfg = {
        "nerf": lego_scale_config,
        "dnerf": bouncingballs_scale_config,
        "tnerf": tnerf_scale_config,
    }[MODE](data)
    # dataset_type stays "blender" for the dnerf/tnerf runners — they
    # route to the dynamic loader internally (run_dnerf.py/run_tnerf.py
    # reject anything else, mirroring the reference's blender-only
    # dynamic trainers).
    if N_RAND:
        cfg["N_rand"] = N_RAND
    if N_SAMP:
        cfg["N_samples"] = N_SAMP
        if int(cfg["N_importance"]):
            cfg["N_importance"] = N_SAMP
    exp = f"full_{MODE}_{ITERS // 1000}k"
    basedir = os.path.join(OUT, "logs")
    cfgp = os.path.join(OUT, f"{exp}.txt")
    with open(cfgp, "w") as f:
        f.write(f"expname = {exp}\nbasedir = {basedir}\n")
        for k, v in cfg.items():
            f.write(f"{k} = {v}\n")

    os.environ["SWNERF_MAX_ITERS"] = str(ITERS + 1)
    os.environ.setdefault("SWNERF_SEED", "0")
    if MODE == "nerf":
        from swnerf_tpu.pipelines.run_nerf import train
    elif MODE == "tnerf":
        from swnerf_tpu.pipelines.run_tnerf import train
    else:
        from swnerf_tpu.pipelines.run_dnerf import train

    t0 = time.time()
    train(["--config", cfgp])
    train_s = time.time() - t0
    n_rand = int(cfg["N_rand"])
    n_s, n_i = int(cfg["N_samples"]), int(cfg["N_importance"])
    spr = n_s + (n_s + n_i if n_i else 0)  # coarse + (coarse+fine re-eval)
    print(
        f"TRAIN DONE: {ITERS} iters in {train_s:.1f}s "
        f"({ITERS / train_s:.1f} it/s, "
        f"{ITERS * n_rand * spr / train_s / 1e6:.2f}M ray-samples/s)",
        flush=True,
    )

    # Final eval through the product surface: render_only --render_test
    # writes renderonly dirs + metrics.json (PSNR/SSIM per frame).
    t1 = time.time()
    train(["--config", cfgp, "--render_only", "--render_test"])
    eval_s = time.time() - t1

    expdir = os.path.join(basedir, exp)
    metrics = {}
    for root, _dirs, files in os.walk(expdir):
        if "metrics.json" in files:
            with open(os.path.join(root, "metrics.json")) as f:
                metrics = json.load(f)

    # Deterministic test-split PSNR via the parity harness's shared
    # evaluator (the dnerf/tnerf render_only paths follow the reference's
    # no-GT time-sweep semantics, so metrics.json only exists for nerf).
    import argparse as ap
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity_vs_torch", "/root/repo/benchmarks/parity_vs_torch.py"
    )
    pv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pv)
    scene_args = ap.Namespace(
        dataset_type="blender" if MODE == "nerf" else "blender_dnerf",
        datadir=data, half_res=False, testskip=1, white_bkgd=True,
        render_test=False,
    )
    tar = os.path.join(expdir, f"{ITERS:06d}.tar")
    test_psnr, test_frames, test_ssim, test_ssim_frames = pv.eval_ckpt(
        MODE, tar, scene_args, f"full-{MODE}")
    artifacts = sorted(
        os.path.relpath(os.path.join(r, x), expdir)
        for r, _d, fs in os.walk(expdir)
        for x in fs
    )
    result = {
        "mode": MODE,
        "iters": ITERS,
        "size": SIZE,
        "n_train": N_TRAIN,
        "train_s": round(train_s, 1),
        "it_per_s": round(ITERS / train_s, 2),
        "ray_samples_per_s": round(ITERS * n_rand * spr / train_s, 0),
        "eval_s": round(eval_s, 1),
        "test_psnr": test_psnr,
        "test_frames": test_frames,
        "test_ssim": test_ssim,
        "test_ssim_frames": test_ssim_frames,
        "metrics": metrics,
        "artifacts": artifacts,
    }
    with open(os.path.join(OUT, f"result_{exp}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "artifacts"}))
    print("artifacts:", len(artifacts), "files under", expdir)


if __name__ == "__main__":
    main()
