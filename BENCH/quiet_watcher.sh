#!/bin/bash
# Round-5 quiet-window recorder: wait for the multi-core CPU control to read
# quiet, then (1) record a calibrated driver bench and (2) run a quiet-gated
# 3-pair scaling session. All output under BENCH/r5_quiet/.
set -u
cd /root/repo
OUT=BENCH/r5_quiet
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/watcher.log"; }

log "watcher start"
deadline=$(( $(date +%s) + ${WATCH_DEADLINE_SEC:-14400} ))   # default: give up after 4h
while true; do
  reading=$(python3 -c "
import bench, json
r = bench.cpu_control_reading()
print(json.dumps(r))" 2>/dev/null)
  med=$(echo "$reading" | python3 -c "import sys,json; r=json.load(sys.stdin); print(r['multi8_med'], r.get('solo_med',''))")
  quiet=$(echo "$reading" | python3 -c "import sys,json; print(json.load(sys.stdin)['quiet'])")
  log "probe multi8_med=$med quiet=$quiet"
  if [ "$quiet" = "True" ]; then
    # confirm with a second probe 20s later: phases flip on minute scales
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

log "quiet window confirmed; running calibrated driver bench"
SPARK_GRAFT_BENCH_ATTEMPTS=2 SPARK_GRAFT_BENCH_DEADLINE_SEC=1200 \
  python3 bench.py > "$OUT/bench_quiet.json" 2> "$OUT/bench_quiet.err"
log "bench exit=$? : $(tail -c 400 "$OUT/bench_quiet.json")"

log "running quiet-gated scaling session (3 pairs)"
python3 BENCH/scaling_session.py seq --pairs 3 --quiet-gate --label R5Q \
  > "$OUT/scaling_quiet.json" 2> "$OUT/scaling_quiet.err"
log "scaling exit=$? : $(tail -c 400 "$OUT/scaling_quiet.json")"
log "watcher done"
