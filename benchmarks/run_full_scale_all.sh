#!/bin/bash
# Round-5 full-scale campaign (VERDICT item 1): run the reference's
# headline workloads end-to-end on the real TPU, serialized (one TPU
# process at a time per CLAUDE.md).
#   stage 1: vanilla nerf, lego constants, 200k iters (run.py:625)
#   stage 2: t-nerf, bouncingballs constants, 800k iters (configs/bouncingballs.txt:17)
#   stage 3: d-nerf, bouncingballs constants, 800k iters
# Each stage runs from a frozen repo snapshot (/tmp/fs_repo) so live
# edits in /root/repo can't break a later stage's import. Output lines
# are timestamped (epoch seconds) for the long-horizon it/s audit, and
# host RSS is sampled every 60s per stage.
set -u
SNAP=/tmp/fs_repo
OUT=/tmp/full_scale
mkdir -p "$OUT"
rm -rf "$SNAP"
mkdir -p "$SNAP"
(cd /root/repo && git ls-files -z | tar --null -T - -cf - && tar -cf - benchmarks/tpu_full_scale.py benchmarks/run_full_scale_all.sh 2>/dev/null) | tar -xf - -C "$SNAP" 2>/dev/null
# Also carry any not-yet-committed working-tree state of the package:
rsync -a --exclude .git --exclude __pycache__ /root/repo/swnerf_tpu "$SNAP/" 2>/dev/null || cp -r /root/repo/swnerf_tpu "$SNAP/"
cp /root/repo/benchmarks/tpu_full_scale.py "$SNAP/benchmarks/"
sed -i 's#/root/repo#/tmp/fs_repo#g' "$SNAP/benchmarks/tpu_full_scale.py"

run_stage() {
  local mode=$1 iters=$2
  local log="$OUT/log_${mode}_${iters}.txt"
  echo "=== stage $mode $iters start $(date -u +%FT%TZ) ===" | tee -a "$log"
  cd "$SNAP"
  # Line timestamper: epoch-seconds prefix for the long-horizon it/s audit
  # (mawk lacks systime(); a tiny unbuffered python filter is the portable way).
  FS_MODE=$mode FS_ITERS=$iters FS_OUT=$OUT \
    stdbuf -oL -eL python -u benchmarks/tpu_full_scale.py 2>&1 \
    | python -u -c 'import sys,time
for line in sys.stdin:
    sys.stdout.write(f"{int(time.time())} {line}")
    sys.stdout.flush()' >> "$log" &
  local pid=$!
  # RSS sampler: find the python child of the pipeline
  (
    sleep 20
    pypid=$(pgrep -P "$pid" -x python | head -1 || true)
    [ -z "${pypid:-}" ] && pypid=$(ps -eo pid,cmd | grep -F "tpu_full_scale.py" | grep -v grep | awk '{print $1}' | head -1)
    while [ -n "${pypid:-}" ] && kill -0 "$pypid" 2>/dev/null; do
      rss=$(grep VmRSS /proc/$pypid/status 2>/dev/null | awk '{print $2}')
      echo "$(date +%s) RSS_KB $rss" >> "$OUT/rss_${mode}_${iters}.txt"
      sleep 60
    done
  ) &
  local rsspid=$!
  wait "$pid"
  local rc=$?
  kill "$rsspid" 2>/dev/null
  echo "=== stage $mode $iters exit rc=$rc $(date -u +%FT%TZ) ===" | tee -a "$log"
  return 0
}

run_stage nerf 200000
run_stage tnerf 800000
run_stage dnerf 800000
echo "ALL STAGES DONE $(date -u +%FT%TZ)" > "$OUT/DONE"
