#!/bin/bash
# Serial TPU job queue. Pops one line at a time from runs/queue.txt and runs
# it; exits when the queue is empty or the tunnel goes down. NEVER two
# instances: the TPU tunnel serializes under contention (a 4s epoch becomes
# 145s — CLAUDE.md). Enforced with a flock on /tmp/tpu_queue.lock, so the
# watcher and a manual drain mutually exclude.
#
#   echo "<shell command>" >> runs/queue.txt   # enqueue (works while running)
#   bash scripts/tpu_queue.sh                  # drain
#
# Outage hardening (round 5, per VERDICT r4):
#  - before EACH job, the relay-listener probe (see tpu_watcher.sh) is
#    re-checked; if the tunnel is down the drain exits 2 WITHOUT popping, and
#    the watcher re-invokes when listeners return — jobs are never consumed
#    by a dead tunnel.
#  - rc 124/143 (timeout / SIGTERM, the tunnel-hang signatures) re-queues the
#    job at the HEAD of the queue, capped at MAX_RETRIES extra attempts per
#    job (tracked by command hash in runs/q/retries.txt).
#  - a nonzero exit whose log shows a backend-unavailable error (half-dead
#    tunnel: listeners up, remote gone) re-queues WITHOUT burning a retry
#    and pauses the drain (exit 3) for the watcher to resume later.
#  - a line may start with "TIMEOUT=<secs> " to override JOB_TIMEOUT for that
#    job only (long ablation arms need >100 min).
#
# Each job is bounded by JOB_TIMEOUT (default 100 min) so a hang cannot eat
# the round. Per-job stdout/stderr goes to runs/q/<ts>.log; the schedule is
# recorded in runs/q/queue.log.
set -u
cd /root/repo
QUEUE=${QUEUE:-runs/queue.txt}
LOGDIR=${LOGDIR:-runs/q}
JOB_TIMEOUT=${JOB_TIMEOUT:-6000}
MAX_RETRIES=${MAX_RETRIES:-2}
mkdir -p "$LOGDIR"
touch "$QUEUE"

LOCKFILE=${LOCKFILE:-/tmp/tpu_queue.lock}
exec 9>"$LOCKFILE"
if ! flock -n 9; then
  echo "tpu_queue: another drain holds $LOCKFILE; refusing (one process on the tunnel)" >&2
  exit 1
fi

tunnel_up() { ss -tln 2>/dev/null | grep -qE ':(808[2-9]|809[0-9]|81[01][0-9])\b'; }
note() { echo "=== $(date +%Y%m%d-%H%M%S) $*" >> "$LOGDIR/queue.log"; }

while [ -s "$QUEUE" ]; do
  if ! tunnel_up; then
    note "TUNNEL DOWN: pausing drain (queue intact, $(wc -l < "$QUEUE") jobs)"
    exit 2
  fi
  job=$(head -n1 "$QUEUE")
  tail -n +2 "$QUEUE" > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
  [ -z "$job" ] && continue
  jt=$JOB_TIMEOUT
  case "$job" in
    TIMEOUT=*) jt=${job%% *}; jt=${jt#TIMEOUT=}; job=${job#* } ;;
  esac
  ts=$(date +%Y%m%d-%H%M%S)
  note "RUN (timeout ${jt}s): $job"
  timeout "$jt" bash -c "$job" > "$LOGDIR/$ts.log" 2>&1
  rc=$?
  note "EXIT $rc: $job"
  # Half-dead tunnel (relay listeners alive, remote backend gone — the
  # 20260817-1953 bench failure mode): the job dies with a backend-
  # unavailable error, rc!=124/143. That's an outage, not the job's fault:
  # requeue at head WITHOUT burning a retry and pause the drain (exit 3);
  # the watcher re-invokes when it next polls. The ~25-min PJRT retry
  # inside the failing attempt is itself the backoff.
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ] && \
     grep -qE "Unable to initialize backend 'axon'|UNAVAILABLE: TPU backend" \
       "$LOGDIR/$ts.log" 2>/dev/null; then
    { printf 'TIMEOUT=%s %s\n' "$jt" "$job"; cat "$QUEUE"; } > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
    note "BACKEND UNAVAILABLE (rc $rc): requeued, pausing drain ($(wc -l < "$QUEUE") jobs)"
    exit 3
  fi
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 143 ]; then
    key=$(printf '%s' "$job" | md5sum | cut -d' ' -f1)
    n=$(grep -c "^$key\$" "$LOGDIR/retries.txt" 2>/dev/null) || n=0
    if [ "$n" -lt "$MAX_RETRIES" ]; then
      echo "$key" >> "$LOGDIR/retries.txt"
      { printf 'TIMEOUT=%s %s\n' "$jt" "$job"; cat "$QUEUE"; } > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
      note "REQUEUE (retry $((n + 1))/$MAX_RETRIES): $job"
    else
      note "GIVE UP after $((n + 1)) retries: $job"
    fi
  fi
done
echo "queue drained"
