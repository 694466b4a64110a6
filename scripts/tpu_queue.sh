#!/bin/bash
# Serial TPU job queue. Pops one line at a time from runs/queue.txt and runs
# it; exits when the queue is empty. NEVER run two instances: the TPU tunnel
# serializes under contention (a 4s epoch becomes 145s — CLAUDE.md).
#
#   echo "<shell command>" >> runs/queue.txt   # enqueue (works while running)
#   bash scripts/tpu_queue.sh                  # drain
#
# Each job is bounded by JOB_TIMEOUT (default 100 min) so a hang cannot eat
# the round. Per-job stdout/stderr goes to runs/q/<ts>.log; the schedule is
# recorded in runs/q/queue.log.
set -u
cd /root/repo
QUEUE=runs/queue.txt
LOGDIR=runs/q
JOB_TIMEOUT=${JOB_TIMEOUT:-6000}
mkdir -p "$LOGDIR"
touch "$QUEUE"
while [ -s "$QUEUE" ]; do
  job=$(head -n1 "$QUEUE")
  tail -n +2 "$QUEUE" > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
  [ -z "$job" ] && continue
  ts=$(date +%Y%m%d-%H%M%S)
  echo "=== $ts RUN: $job" >> "$LOGDIR/queue.log"
  timeout "$JOB_TIMEOUT" bash -c "$job" > "$LOGDIR/$ts.log" 2>&1
  rc=$?
  echo "=== $(date +%Y%m%d-%H%M%S) EXIT $rc: $job" >> "$LOGDIR/queue.log"
done
echo "queue drained"
