#!/bin/bash
# One-shot hardware-evidence queue (round 4). Run from the repo root the
# moment the TPU tunnel answers:  bash tools/hw_queue.sh
#
# Probes the tunnel first, then runs every pending hardware validation in
# priority order, logging to /tmp/hwq/. Each step is individually bounded
# and failures don't stop later steps (the tunnel may flake mid-queue).
# Review the logs afterwards: flip defaults / update PERF.md per each
# tool's instructions.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/hwq
echo "== hw_queue $(date -u +%FT%TZ) =="

probe() {
  timeout 120 python -c "
import jax, time
t0 = time.time()
x = jax.numpy.ones((64, 64))
print('probe ok', float(jax.numpy.sum(x @ x)), f'{time.time()-t0:.1f}s')
" >/tmp/hwq/probe.log 2>&1
}

if ! probe; then
  echo "TUNNEL STILL HUNG (probe failed) — aborting"; exit 1
fi
echo "tunnel alive:"; cat /tmp/hwq/probe.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "-- $name ($(date -u +%T)) --"
  timeout "$t" "$@" >"/tmp/hwq/$name.log" 2>&1
  local rc=$?
  echo "   rc=$rc  (log: /tmp/hwq/$name.log)"
  tail -n 15 "/tmp/hwq/$name.log" | sed 's/^/   | /'
}

# 1. (done r4) BLA fe kernel validated on hardware and DELETED: bit-equal
#    but 60.3 ms vs the twin's 44.7 ms on its most favorable view.
# 2. Driver-grade bench capture: headline + tiers + long tail + compile walls
run bench 3000 python bench.py --repeats 3
# 3. p32 op-count floor probe (VERDICT r3 #4): productionize winner or refute
run lean_probe 1800 python tools/lean_probe.py
# 4. Fern scatter-floor probe (VERDICT r3 #6)
run fern_scatter 1800 python tools/fern_scatter_probe.py
# 5. Burning-ship FMA-pin parity on the v5e (the CPU test's hardware twin)
run bship_parity 1800 python tools/bship_hw_check.py

echo "== queue done $(date -u +%FT%TZ) =="
echo "Next: update PERF.md ledger rows (driver/session-r4), README numbers,"
echo "commit."
