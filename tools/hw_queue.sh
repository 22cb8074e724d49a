#!/bin/bash
# One-shot hardware-evidence queue (round 4, post-commit refresh). Run from
# the repo root the moment the TPU tunnel answers:  bash tools/hw_queue.sh
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
  # the tunnel's good-but-slow windows answer a tiny op in ~2 min; a 120s
  # probe flakes on them, so give it 300s
  timeout 300 python -c "
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

# (done r4, evidence/r4/: lean_probe, fern_scatter, bship_parity,
#  validate_fe_bla — all measured; the fe-BLA kernel was deleted after
#  losing to the twin 60.3 vs 44.7 ms on its best view.)
#
# 1. Fresh driver-grade bench of the COMMITTED state: the dist-only p32
#    route (expect headline ~151 ms, was 160.65) and the batched fern
#    scatter (expect fern_100M ~844 ms, was 1082) are now the defaults.
run bench_fresh 3600 python bench.py --repeats 3

echo "== queue done $(date -u +%FT%TZ) =="
echo "Next: copy /tmp/hwq/bench_fresh.log into evidence/r4/, update the"
echo "PERF.md ledger rows that moved (headline p32, fern), commit."
