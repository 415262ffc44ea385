#!/bin/bash
# Round-4 parity queue (VERDICT r3 items #1 and #6), fully serialized:
# this host has ONE CPU core and one TPU tunnel, so ours-on-TPU and
# reference-on-CPU stages must not overlap (CLAUDE.md "one TPU-side
# process at a time").
#
# Stages, in VERDICT priority order:
#   1. ours  LLFF/NDC (TPU product path), 6 seeds @ 5k iters
#   2. ref   LLFF/NDC (torch CPU fp32), seeds 0,1 @ 5k     <- item #1
#   3. ours  D-NeRF textured dynamic (TPU), 6 seeds @ 5k
#   4. ref   D-NeRF textured dynamic (CPU), seeds 0,1 @ 5k <- item #6
#   5. ours  T-NeRF textured dynamic (TPU), 4 seeds @ 5k
#   6. ref   T-NeRF textured dynamic (CPU), seeds 0,1 @ 5k <- item #6
#
# Scene data is deterministic (numpy Generator seed 0) so the /tmp/parity
# (ref) and /tmp/parity_tpu (ours) copies are bit-identical.
set -u
cd /root/repo
LOG=${R4_LOG:-/tmp/r4queue}
mkdir -p "$LOG"
ITERS=${R4_ITERS:-5000}

CPUENV="SWNERF_FUSED=0 SWNERF_MATMUL_PRECISION=HIGHEST JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="

stamp() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG/queue.log"; }

# ---- 1. ours LLFF on the real TPU --------------------------------------
stamp "stage 1: ours llff tpu"
PARITY_MODE=llff PARITY_ITERS=$ITERS PARITY_SEEDS=0,1,2,3,4,5 \
  timeout 4000 python benchmarks/tpu_parity_seeds.py \
  > "$LOG/ours_llff.log" 2>&1
stamp "stage 1 done rc=$?"

# ---- 2. ref LLFF on CPU -------------------------------------------------
for s in 0 1; do
  stamp "stage 2: ref llff seed $s"
  env $CPUENV PARITY_MODE=llff PARITY_ITERS=$ITERS PARITY_RUN=ref \
    PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 14000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_llff_s$s.log" 2>&1
  stamp "stage 2 seed $s done rc=$?"
done

# ---- 3. ours D-NeRF textured on TPU ------------------------------------
stamp "stage 3: ours dnerf textured tpu"
PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
  PARITY_SEEDS=0,1,2,3,4,5 \
  timeout 5000 python benchmarks/tpu_parity_seeds.py \
  > "$LOG/ours_dnerf_tex.log" 2>&1
stamp "stage 3 done rc=$?"

# ---- 4. ref D-NeRF textured on CPU (the long pole: ~6200s/seed) --------
for s in 0 1; do
  stamp "stage 4: ref dnerf textured seed $s"
  env $CPUENV PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
    PARITY_RUN=ref PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 14000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_dnerf_tex_s$s.log" 2>&1
  stamp "stage 4 seed $s done rc=$?"
done

# ---- 5. ours T-NeRF textured on TPU ------------------------------------
stamp "stage 5: ours tnerf textured tpu"
PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
  PARITY_SEEDS=0,1,2,3 \
  timeout 4000 python benchmarks/tpu_parity_seeds.py \
  > "$LOG/ours_tnerf_tex.log" 2>&1
stamp "stage 5 done rc=$?"

# ---- 6. ref T-NeRF textured on CPU --------------------------------------
for s in 0 1; do
  stamp "stage 6: ref tnerf textured seed $s"
  env $CPUENV PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=$ITERS \
    PARITY_RUN=ref PARITY_SEED=$s PARITY_REF_SEED=$s PARITY_REF_NPSEED=$s \
    timeout 8000 python benchmarks/parity_vs_torch.py \
    > "$LOG/ref_tnerf_tex_s$s.log" 2>&1
  stamp "stage 6 seed $s done rc=$?"
done

stamp "QUEUE COMPLETE"
