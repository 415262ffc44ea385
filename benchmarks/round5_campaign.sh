#!/bin/bash
# Round-5 serialized TPU campaign (one TPU process at a time, CLAUDE.md):
#   1. quality gates (LLFF SSIM baselines, warm-start mitigation study,
#      textured dnerf/tnerf SSIM re-quotes + product-scale auto-reseed)
#      -> benchmarks/tpu_round5_gates.sh
#   2. one recorded end-to-end SW chain (train -> extract_mesh 128 ->
#      transform_mesh) -> benchmarks/tpu_sw_chain.py
#   3. d-nerf bouncingballs constants, 800,000 iterations
#   4. t-nerf bouncingballs constants, 800,000 iterations
# The 800k stages keep the reference i_weights=10000 checkpoint chain but
# thin i_video/i_testset to 200k (4 events) — the reference's own 40-50k
# cadence would spend ~45 min of the wall-clock budget re-rendering spiral
# videos; the per-event cost is already recorded from the 200k vanilla run.
# Small artifacts (result jsons, timestamped logs, rss samples) are copied
# into benchmarks/round5_artifacts/ after every stage so nothing rides on
# /tmp surviving.
set -u
R5=/root/repo/benchmarks/round5_artifacts
OUT=/tmp/full_scale
mkdir -p "$R5" "$OUT"

snap_small() {
  cp /tmp/gates_r5/log_*.txt "$R5/" 2>/dev/null
  for d in llff_bf16 llff_warm dnerf_tex tnerf_tex; do
    cp /tmp/gates_r5/$d/seed_spread_*.json "$R5/gates_${d}.json" 2>/dev/null
  done
  cp /tmp/sw_chain/result_sw_chain.json "$R5/" 2>/dev/null
  cp "$OUT"/result_full_*.json "$R5/" 2>/dev/null
  cp "$OUT"/log_*.txt "$OUT"/rss_*.txt "$R5/" 2>/dev/null
}

stamp() {
  python -u -c 'import sys,time
for line in sys.stdin:
    sys.stdout.write(f"{int(time.time())} {line}")
    sys.stdout.flush()'
}

echo "CAMPAIGN START $(date -u +%FT%TZ)" | tee "$R5/campaign_status.txt"

bash /root/repo/benchmarks/tpu_round5_gates.sh
echo "gates done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

cd /root/repo && stdbuf -oL -eL python -u benchmarks/tpu_sw_chain.py 2>&1 \
  | stamp >> "$R5/log_sw_chain.txt"
echo "sw_chain done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

run_stage() {
  local mode=$1 iters=$2
  local log="$OUT/log_${mode}_${iters}.txt"
  echo "=== stage $mode $iters start $(date -u +%FT%TZ) ===" | tee -a "$log"
  cd /root/repo
  FS_MODE=$mode FS_ITERS=$iters FS_OUT=$OUT \
    FS_IVIDEO=200000 FS_ITEST=200000 \
    stdbuf -oL -eL python -u benchmarks/tpu_full_scale.py 2>&1 \
    | stamp >> "$log" &
  local pid=$!
  (
    sleep 30
    pypid=$(ps -eo pid,cmd | grep -F "tpu_full_scale.py" | grep -v grep | awk '{print $1}' | head -1)
    while [ -n "${pypid:-}" ] && kill -0 "$pypid" 2>/dev/null; do
      rss=$(grep VmRSS /proc/$pypid/status 2>/dev/null | awk '{print $2}')
      echo "$(date +%s) RSS_KB $rss" >> "$OUT/rss_${mode}_${iters}.txt"
      sleep 60
    done
  ) &
  local rsspid=$!
  wait "$pid"
  echo "=== stage $mode $iters exit $(date -u +%FT%TZ) ===" | tee -a "$log"
  kill "$rsspid" 2>/dev/null
}

run_stage dnerf 800000
echo "dnerf done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

run_stage tnerf 800000
echo "tnerf done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

echo "CAMPAIGN DONE $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
