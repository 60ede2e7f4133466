#!/bin/bash
# Round-5 at-scale quiet-window scaling recorder.
#
# Session N (the first all-quiet session) showed that at 200k files the
# 8-core build takes only ~49 s, so the fixed ~32 s per-build driver
# overhead dominates the 2v8 ratio (pair median 0.489) while the parallel
# region scales at ~1.0 (per-core rates equal to 0.3%). The north-rule gate
# is therefore evidenced at the corpus sizes where build time dominates
# overhead:
#   P-1M6-quiet  strong scaling, SAME 1.6M-file input at 2 and 8 cores
#                (model predicts eff ~0.85)
#   O-eqexp-quiet weak scaling, 200k@2c vs 800k@8c (equal wall-time
#                exposure; model predicts eff ~1.0)
# Waits for a confirmed quiet window (8-way multi-core control AND solo
# control at calibration), then runs both sessions quiet-gated.
set -u
cd /root/repo
OUT=BENCH/r5_quiet
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watcher2.log"; }

log "watcher2 start"
deadline=$(( $(date +%s) + ${WATCH_DEADLINE_SEC:-16200} ))   # give up after 4.5h
while true; do
  reading=$(python3 -c "
import bench, json
r = bench.cpu_control_reading()
print(json.dumps(r))" 2>/dev/null)
  med=$(echo "$reading" | python3 -c "import sys,json; r=json.load(sys.stdin); print(r['multi8_med'], r.get('solo_med',''))")
  quiet=$(echo "$reading" | python3 -c "import sys,json; print(json.load(sys.stdin)['quiet'])")
  log "probe multi8_med/solo_med=$med quiet=$quiet"
  if [ "$quiet" = "True" ]; then
    sleep 20
    q2=$(python3 -c "
import bench
print(bench.cpu_control_reading()['quiet'])" 2>/dev/null)
    log "confirm probe quiet=$q2"
    if [ "$q2" = "True" ]; then break; fi
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    log "DEADLINE hit without sustained quiet window; exiting"
    exit 1
  fi
  sleep 90
done

log "quiet window confirmed; running P-1M6-quiet (3 pairs, 1.6M files strong scaling)"
python3 BENCH/scaling_session.py seq --pairs 3 --quiet-gate --label P-1M6-quiet \
  --lo-files 1600000 --hi-files 1600000 \
  > "$OUT/sessionP.json" 2> "$OUT/sessionP.log"
log "P exit=$? : $(tail -n 1 "$OUT/sessionP.json")"

log "running O-eqexp-quiet (4 pairs, 200k@2c vs 800k@8c weak scaling)"
python3 BENCH/scaling_session.py seq --pairs 4 --quiet-gate --label O-eqexp-quiet \
  --lo-files 200000 --hi-files 800000 \
  > "$OUT/sessionO.json" 2> "$OUT/sessionO.log"
log "O exit=$? : $(tail -n 1 "$OUT/sessionO.json")"
log "watcher2 done"
