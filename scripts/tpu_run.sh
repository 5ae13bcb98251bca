#!/bin/bash
# Robust TPU job launcher: retries if the job produces no output within
# the grace period (works around wedged device claims on this host).
# usage: tpu_run.sh <logfile> <grace_seconds> <cmd...>
LOG=$1; GRACE=$2; shift 2
for attempt in 1 2 3 4; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  SECS=0
  while kill -0 $PID 2>/dev/null; do
    sleep 20
    SECS=$((SECS+20))
    LINES=$(grep -cvE "WARNING|Warning" "$LOG")
    if [ "$LINES" -gt 0 ]; then
      wait $PID
      exit $?
    fi
    if [ "$SECS" -ge "$GRACE" ]; then
      echo "[tpu_run] attempt $attempt wedged after ${SECS}s; retrying" >> "$LOG.launcher"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      sleep 160   # let the stale claim expire
      break
    fi
  done
  if ! kill -0 $PID 2>/dev/null && [ "$(grep -cvE 'WARNING|Warning' "$LOG")" -gt 0 ]; then
    exit 0
  fi
done
echo "[tpu_run] giving up" >> "$LOG.launcher"
exit 1
