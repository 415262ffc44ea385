#!/bin/bash
# Round-4 parity queue RESUME (stage 1 of round4_queue.sh completed:
# ours-LLFF 6 seeds, mean 30.628 dB — /tmp/r4queue/ours_llff.log).
# The original queue died with its launching session at ref-llff-s0
# iter 1000; this resume reorders the remainder so the cheap stages bank
# results first and the expensive dnerf refs absorb whatever wall clock
# is left:
#   a. ours D-NeRF textured (TPU, 6 seeds)   ~15 min
#   b. ours T-NeRF textured (TPU, 4 seeds)   ~10 min
#   c. ref  LLFF seeds 0,1 (CPU)             ~2h/seed   <- VERDICT item #1
#   d. ref  T-NeRF textured seeds 0,1 (CPU)  ~10-30 min/seed
#   e. ref  D-NeRF textured seeds 0,1 (CPU)  ~1.7h/seed <- VERDICT item #6
# Serialized: one CPU core, one TPU tunnel (CLAUDE.md).
set -u
cd /root/repo
LOG=${R4_LOG:-/tmp/r4queue}
mkdir -p "$LOG"
ITERS=${R4_ITERS:-5000}

CPUENV="SWNERF_FUSED=0 SWNERF_MATMUL_PRECISION=HIGHEST JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="

stamp() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue.log"; }

# ---- a. ours D-NeRF textured on TPU -------------------------------------
stamp "stage 3: ours dnerf textured tpu"
PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
  PARITY_SEEDS=0,1,2,3,4,5 \
  timeout 5000 python benchmarks/tpu_parity_seeds.py \
  > "$LOG/ours_dnerf_tex.log" 2>&1
stamp "stage 3 done rc=$?"

# ---- b. ours T-NeRF textured on TPU -------------------------------------
stamp "stage 5: ours tnerf textured tpu"
PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
  PARITY_SEEDS=0,1,2,3 \
  timeout 4000 python benchmarks/tpu_parity_seeds.py \
  > "$LOG/ours_tnerf_tex.log" 2>&1
stamp "stage 5 done rc=$?"

# ---- c. ref LLFF on CPU (item #1, highest priority) ----------------------
for s in 0 1; do
  stamp "stage 2: ref llff seed $s"
  env $CPUENV PARITY_MODE=llff PARITY_ITERS=$ITERS PARITY_RUN=ref \
    PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 14000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_llff_s$s.log" 2>&1
  stamp "stage 2 seed $s done rc=$?"
done

# ---- d. ref T-NeRF textured on CPU (cheap; bank it before the long pole) -
for s in 0 1; do
  stamp "stage 6: ref tnerf textured seed $s"
  env $CPUENV PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
    PARITY_RUN=ref PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 8000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_tnerf_tex_s$s.log" 2>&1
  stamp "stage 6 seed $s done rc=$?"
done

# ---- e. ref D-NeRF textured on CPU (the long pole: ~6200s/seed) ----------
for s in 0 1; do
  stamp "stage 4: ref dnerf textured seed $s"
  env $CPUENV PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
    PARITY_RUN=ref PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 14000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_dnerf_tex_s$s.log" 2>&1
  stamp "stage 4 seed $s done rc=$?"
done

stamp "QUEUE COMPLETE"
