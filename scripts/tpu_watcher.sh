#!/bin/bash
# Tunnel watcher: waits for the axon TPU tunnel relay to come back, then
# drains the serial job queue (scripts/tpu_queue.sh). Survives the builder
# session (launch with setsid/nohup). Single-instance via a pidfile lock.
#
# Health check is cheap and process-free: the relay (/root/.tpu_init.py)
# listens on localhost 8082-8117 and dies on remote EOF, so the presence of
# those listeners tracks tunnel liveness without touching jax (a jax probe
# on a dead tunnel sleeps ~25 min in the PJRT reconnect loop).
set -u
cd /root/repo
LOCK=/tmp/tpu_watcher.pid
LOG=runs/q/watcher.log
mkdir -p runs/q
if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "watcher already running (pid $(cat "$LOCK"))"; exit 0
fi
echo $$ > "$LOCK"
echo "$(date -u +%FT%TZ) watcher start (pid $$)" >> "$LOG"
while true; do
  if ss -tln 2>/dev/null | grep -qE ':(808[2-9]|809[0-9]|81[01][0-9])\b'; then
    if [ -s runs/queue.txt ]; then
      echo "$(date -u +%FT%TZ) tunnel up, draining queue" >> "$LOG"
      bash scripts/tpu_queue.sh >> "$LOG" 2>&1
      echo "$(date -u +%FT%TZ) queue pass done" >> "$LOG"
    fi
  fi
  sleep 30
done
