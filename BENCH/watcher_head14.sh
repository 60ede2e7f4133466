#!/bin/bash
# Round-5 pool growth: push the 1v4@400k bootstrap CI90 lower bound
# (0.798 at the 31-pair cut) over the 0.8 gate. Wait for a confirmed
# dual-criterion quiet window, then run one quiet-gated 4-pair
# constant-corpus session on HEAD.
set -u
cd /root/repo
OUT=BENCH/r5_quiet
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watcher_head14.log"; }
log "HEAD14 watcher start"
deadline=$(( $(date +%s) + ${WATCH_DEADLINE_SEC:-9000} ))
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
  sleep 75
done
log "quiet window confirmed; 1v4 session at 400k (4 pairs)"
python3 BENCH/scaling_session.py seq --lo 1 --hi 4 --pairs 4 --quiet-gate \
  --lo-files 400000 --hi-files 400000 --label V14-400k-HEAD14 \
  > "$OUT/session_1v4_head14.log" 2>&1
log "400k exit=$? : $(tail -n 1 "$OUT/session_1v4_head14.log")"
log "HEAD14 watcher done"
