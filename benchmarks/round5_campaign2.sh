#!/bin/bash
# Round-5 campaign, reordered after the 00:04-00:35Z tunnel stall: the
# flagship 800k full-scale stages go FIRST so they land inside the
# wall-clock window; quality gates and the SW chain follow. Gates stage A
# (LLFF bf16 SSIM baselines) already completed in the first campaign and
# its results are banked. The 400^2 dynamic scene is pre-written on CPU
# (/tmp/prewrite_dyn.py) so the first TPU touch is the train step itself.
set -u
R5=/root/repo/benchmarks/round5_artifacts
OUT=/tmp/full_scale
GOUT=/tmp/gates_r5
mkdir -p "$R5" "$OUT" "$GOUT"

stamp() {
  python -u -c 'import sys,time
for line in sys.stdin:
    sys.stdout.write(f"{int(time.time())} {line}")
    sys.stdout.flush()'
}

snap_small() {
  cp "$GOUT"/log_*.txt "$R5/" 2>/dev/null
  for d in llff_bf16 llff_warm dnerf_tex tnerf_tex; do
    cp "$GOUT"/$d/seed_spread_*.json "$R5/gates_${d}.json" 2>/dev/null
  done
  cp /tmp/sw_chain/result_sw_chain.json "$R5/" 2>/dev/null
  cp "$OUT"/result_full_*.json "$OUT"/log_*.txt "$OUT"/rss_*.txt "$R5/" 2>/dev/null
}

bank_fullscale() {  # $1 = expname (e.g. full_dnerf_800k)
  local e=$1 src="$OUT/logs/$1" dst="$R5/$1"
  mkdir -p "$dst"
  cp "$src"/metrics.jsonl "$src"/args.txt "$src"/config.txt "$dst/" 2>/dev/null
  cp "$src"/800000.tar "$dst/" 2>/dev/null
  python /root/repo/benchmarks/audit_full_scale.py "$src" \
    "$OUT"/rss_${e#full_}*.txt > "$dst/audit.json" 2>/dev/null \
    || python /root/repo/benchmarks/audit_full_scale.py "$src" > "$dst/audit.json" 2>/dev/null
}

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

gate() {
  local name=$1; shift
  local log="$GOUT/log_$name.txt"
  echo "=== $name start $(date -u +%FT%TZ) ===" | tee -a "$log"
  cd /root/repo
  env "$@" stdbuf -oL python -u benchmarks/tpu_parity_seeds.py 2>&1 \
    | stamp >> "$log"
  echo "=== $name exit $(date -u +%FT%TZ) ===" | tee -a "$log"
}

echo "CAMPAIGN2 START $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"

# Wait for the CPU scene pre-write if it is still going.
while [ -f /tmp/prewrite.pid ] && kill -0 "$(cat /tmp/prewrite.pid)" 2>/dev/null; do
  sleep 15
done

run_stage dnerf 800000
echo "dnerf done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small; bank_fullscale full_dnerf_800k

run_stage tnerf 800000
echo "tnerf done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small; bank_fullscale full_tnerf_800k

# Gates B: warm-start mitigation (scene copied from completed stage A).
mkdir -p "$GOUT/llff_warm"
cp -r "$GOUT/llff_bf16/data_llff_textured" "$GOUT/llff_warm/" 2>/dev/null
gate llff_warm PARITY_MODE=llff PARITY_ITERS=5000 PARITY_SEEDS=0,1,3 \
    PARITY_OUT=$GOUT/llff_warm SWNERF_FUSED_DTYPE_SCHEDULE=f32@2000
echo "llff_warm done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

# Gates C/D: textured dynamic SSIM re-quotes (+ product-scale auto-reseed).
gate dnerf_tex PARITY_MODE=dnerf PARITY_SCENE=textured PARITY_ITERS=5000 \
    PARITY_SEEDS=0,1,2,3,4,5 PARITY_OUT=$GOUT/dnerf_tex SWNERF_AUTO_RESEED=2 \
    SWNERF_WATCHDOG_SPREAD=0.3
echo "dnerf_tex done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

gate tnerf_tex PARITY_MODE=tnerf PARITY_SCENE=textured PARITY_ITERS=5000 \
    PARITY_SEEDS=0,1,2,3,4,5 PARITY_OUT=$GOUT/tnerf_tex
echo "tnerf_tex done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

cd /root/repo && stdbuf -oL -eL python -u benchmarks/tpu_sw_chain.py 2>&1 \
  | stamp >> "$R5/log_sw_chain.txt"
echo "sw_chain done $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
snap_small

echo "CAMPAIGN2 DONE $(date -u +%FT%TZ)" | tee -a "$R5/campaign_status.txt"
