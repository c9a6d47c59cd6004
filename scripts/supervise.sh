#!/bin/bash
# Stall-supervised runner for long TPU jobs on flaky tunnels.
#
#   scripts/supervise.sh <logfile> <stall_seconds> <max_attempts> -- cmd...
#
# Restarts cmd when no NEW "[...]"-prefixed progress line appears in the log
# for stall_seconds (a wedged tunnel RPC parks every thread silently; the
# faulthandler stall dumps refresh the file mtime, so mtime is NOT a usable
# progress signal).  cmd must be resumable from its own checkpoints — every
# stage driver in this repo is (start_from semantics).
LOG=$1; STALL=$2; MAX=$3; shift 4
for i in $(seq 1 "$MAX"); do
  echo "[supervise] attempt $i: $*" >> "$LOG.sup"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  LASTN=0; LASTT=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    N=$(grep -c "^\[" "$LOG" 2>/dev/null || echo 0)
    NOW=$(date +%s)
    if [ "$N" -gt "$LASTN" ]; then LASTN=$N; LASTT=$NOW; fi
    if [ $((NOW - LASTT)) -gt "$STALL" ]; then
      echo "[supervise] no progress for $((NOW - LASTT))s — killing $PID" \
        >> "$LOG.sup"
      kill -9 "$PID" 2>/dev/null; sleep 3; break
    fi
  done
  wait "$PID" 2>/dev/null; RC=$?
  if [ "$RC" -eq 0 ]; then echo "[supervise] success" >> "$LOG.sup"; exit 0; fi
  echo "[supervise] exit $RC — retrying" >> "$LOG.sup"
done
echo "[supervise] giving up after $MAX attempts" >> "$LOG.sup"
exit 1
