#!/bin/bash
# Round-5 1v4 experiment: the all-quiet 2v8 at-scale sessions read 0.57-0.70
# raw because the socket's bandwidth wall engages at width 8 past ~400k files
# (BENCH/BASELINE.md, size-series SS-1).  Width 4 halves the aggregate
# bandwidth demand, so a quiet sequential 1v4 session tests whether 4x cores
# WITHOUT the width-8 wall scales >= 0.8 raw wall-clock — the same
# N-vs-4N-core instrument, one that a single shared socket can actually
# serve.  Wait for a confirmed dual-criterion quiet window, then run two
# quiet-gated constant-corpus sessions: 2 pairs at 400k, 2 pairs at 800k.
set -u
cd /root/repo
OUT=BENCH/r5_quiet
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watcher_1v4.log"; }

log "1v4 watcher start"
deadline=$(( $(date +%s) + ${WATCH_DEADLINE_SEC:-14400} ))
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

log "quiet window confirmed; 1v4 session at 400k (2 pairs)"
python3 BENCH/scaling_session.py seq --lo 1 --hi 4 --pairs 2 --quiet-gate \
  --lo-files 400000 --hi-files 400000 --label V14-400k \
  > "$OUT/session_1v4_400k.log" 2>&1
log "400k exit=$? : $(tail -n 1 "$OUT/session_1v4_400k.log")"

log "1v4 session at 800k (2 pairs)"
python3 BENCH/scaling_session.py seq --lo 1 --hi 4 --pairs 2 --quiet-gate \
  --lo-files 800000 --hi-files 800000 --label V14-800k \
  > "$OUT/session_1v4_800k.log" 2>&1
log "800k exit=$? : $(tail -n 1 "$OUT/session_1v4_800k.log")"
log "1v4 watcher done"
