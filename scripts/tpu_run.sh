#!/bin/bash
# Robust TPU job launcher: retries on silent claim-wedges AND on TPU-worker
# crashes/restarts.  Wedge detection is two-tier:
#   - no output at all within the grace period (claim never succeeded), or
#   - output stalled: the log has not grown for STALL_S seconds (claim
#     succeeded, then the tunnel wedged mid-run — kernels compile silently
#     for minutes, so this threshold is generous).
# usage: tpu_run.sh <logfile> <grace_seconds> <cmd...>
LOG=$1; GRACE=$2; shift 2
STALL_S=${TPU_RUN_STALL_S:-900}
for attempt in 1 2 3 4; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  SECS=0
  WEDGED=0
  LAST_SIZE=0
  LAST_GROW=0
  while kill -0 $PID 2>/dev/null; do
    sleep 20
    SECS=$((SECS+20))
    LINES=$(grep -cvE "WARNING|Warning" "$LOG")
    SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$SIZE" -ne "$LAST_SIZE" ]; then
      LAST_SIZE=$SIZE
      LAST_GROW=$SECS
    fi
    if { [ "$LINES" -eq 0 ] && [ "$SECS" -ge "$GRACE" ]; } || \
       { [ "$LINES" -gt 0 ] && [ $((SECS - LAST_GROW)) -ge "$STALL_S" ]; }; then
      echo "[tpu_run] attempt $attempt wedged after ${SECS}s (lines=$LINES, stalled=$((SECS - LAST_GROW))s); retrying" >> "$LOG.launcher"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      WEDGED=1
      sleep 600
      break
    fi
  done
  if [ "$WEDGED" -eq 1 ]; then continue; fi
  wait $PID; RC=$?
  if [ "$RC" -eq 0 ]; then exit 0; fi
  if grep -q "TPU worker process crashed" "$LOG"; then
    echo "[tpu_run] attempt $attempt hit worker crash; cooling down" >> "$LOG.launcher"
    sleep 600
    continue
  fi
  if grep -q "Unable to initialize backend" "$LOG"; then
    echo "[tpu_run] attempt $attempt failed to claim the chip; retrying" >> "$LOG.launcher"
    sleep 120
    continue
  fi
  exit $RC
done
echo "[tpu_run] giving up" >> "$LOG.launcher"
exit 1
