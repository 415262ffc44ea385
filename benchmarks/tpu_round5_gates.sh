#!/bin/bash
# Round-5 quality-gate batch on the real TPU, serialized (one TPU process
# at a time). Four stages:
#  A) LLFF 5k bf16, seeds 0/1/3    — SSIM baselines for the recorded round-4
#                                    PSNR rows (30.97/28.90/29.68)
#  B) LLFF 5k warm-start f32@2000, seeds 0/1/3 — the bf16 early-convergence
#                                    mitigation measurement (VERDICT r4 #2)
#  C) D-NeRF textured 5k, seeds 0-5, SWNERF_AUTO_RESEED=2 — SSIM re-quote of
#     the round-4 table + product-scale dead-seed-2 auto-recovery proof
#  D) T-NeRF textured 5k, seeds 0-5 — SSIM re-quote
set -u
OUT=/tmp/gates_r5
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1; shift
  local log="$OUT/log_$name.txt"
  echo "=== $name start $(date -u +%FT%TZ) ===" | tee -a "$log"
  env "$@" stdbuf -oL python -u benchmarks/tpu_parity_seeds.py 2>&1 \
    | python -u -c 'import sys,time
for line in sys.stdin:
    sys.stdout.write(f"{int(time.time())} {line}")
    sys.stdout.flush()' >> "$log"
  echo "=== $name exit rc=$? $(date -u +%FT%TZ) ===" | tee -a "$log"
}

run llff_bf16 PARITY_MODE=llff PARITY_ITERS=5000 PARITY_SEEDS=0,1,3 \
    PARITY_OUT=$OUT/llff_bf16
run llff_warm PARITY_MODE=llff PARITY_ITERS=5000 PARITY_SEEDS=0,1,3 \
    PARITY_OUT=$OUT/llff_warm SWNERF_FUSED_DTYPE_SCHEDULE=f32@2000
# SWNERF_WATCHDOG_SPREAD=0.3: the parity config trains with the
# reference's raw_noise_std=1e0, whose sigma-noise jitters the train-batch
# render, so a collapsed background-only plateau (seed 2: 12.2 dB) shows
# ~0.1-0.3 dB print-to-print spread rather than the noise-free <0.02;
# alive seeds cross the 16 dB floor within the first prints, so the wider
# spread cannot false-trip them.
run dnerf_tex PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=5000 \
    PARITY_SEEDS=0,1,2,3,4,5 PARITY_OUT=$OUT/dnerf_tex SWNERF_AUTO_RESEED=2 \
    SWNERF_WATCHDOG_SPREAD=0.3
run tnerf_tex PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=5000 \
    PARITY_SEEDS=0,1,2,3,4,5 PARITY_OUT=$OUT/tnerf_tex
echo "GATES DONE $(date -u +%FT%TZ)" > "$OUT/DONE"
