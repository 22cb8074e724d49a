#!/bin/bash
# Tunnel watcher: probe the TPU every 5 min; the moment it answers, run the
# one-shot hardware-evidence queue (tools/hw_queue.sh) and exit.  Detach with
#   nohup bash tools/watch_tunnel.sh > /tmp/hwq/watch.log 2>&1 &
# Logs land in /tmp/hwq/.  Stop with: kill $(cat /tmp/hwq/watch.pid)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/hwq
echo $$ > /tmp/hwq/watch.pid
echo "== watch_tunnel start $(date -u +%FT%TZ) pid=$$ =="

probe() {
  timeout 560 python -c "
import jax, time
t0 = time.time()
x = jax.numpy.ones((64, 64))
print('probe ok', float(jax.numpy.sum(x @ x)), f'{time.time()-t0:.1f}s')
" >/tmp/hwq/probe.log 2>&1
}

n=0
while true; do
  n=$((n+1))
  if probe; then
    echo "probe #$n OK $(date -u +%T) — launching hw_queue"
    cat /tmp/hwq/probe.log
    # exit only when the queue actually ran: its own probe can flake on a
    # marginal tunnel window, and that must not kill the watcher
    if bash tools/hw_queue.sh; then
      echo "== watch_tunnel done $(date -u +%FT%TZ) =="
      exit 0
    fi
    echo "hw_queue aborted (marginal window?); watching on"
  fi
  echo "probe #$n failed $(date -u +%T); sleeping 300s"
  sleep 300
done
