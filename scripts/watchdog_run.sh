#!/bin/bash
# Stall watchdog for chip jobs (round-4 operational finding): the remote-TPU
# relay in this environment occasionally drops a dispatch — the client then
# blocks forever with zero CPU and NO exception, so exception-based retry
# supervisors (train/elastic.py) never fire and only a coarse `timeout`
# bound (hours) reclaims the queue.  This wrapper kills the job as soon as
# its OUTPUT stalls, which together with row-level-resumable scripts turns
# a multi-hour hang into a ~minutes retry.
#
# Usage: watchdog_run.sh <stall_seconds> <max_attempts> <logfile> cmd args...
# The command's stdout/stderr append to <logfile>; a run is considered
# stalled when the logfile stops growing for <stall_seconds>.  Exit code:
# the command's (0 on first success), 1 when all attempts stalled/failed.
set -u
STALL=$1; ATTEMPTS=$2; LOG=$3; shift 3

for attempt in $(seq 1 "$ATTEMPTS"); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=-1
  stalled=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      idle=0
    else
      idle=$((idle + 15))
      if [ "$idle" -ge "$STALL" ]; then
        echo "[watchdog] output stalled ${STALL}s — killing pid $PID (attempt $attempt/$ATTEMPTS)" >> "$LOG"
        kill "$PID" 2>/dev/null
        sleep 5
        kill -9 "$PID" 2>/dev/null
        stalled=1
        break
      fi
    fi
  done
  if [ "$stalled" = 0 ]; then
    wait "$PID"
    rc=$?
    [ "$rc" = 0 ] && exit 0
    echo "[watchdog] attempt $attempt/$ATTEMPTS exited rc=$rc, retrying" >> "$LOG"
  fi
  sleep 10
done
exit 1
