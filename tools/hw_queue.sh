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

# Round-5 queue (VERDICT r4 #3 #5 + fresh committed capture):
#
# 1. The real Pallas fern-histogram attempt (r4 #5): serialized SMEM-
#    streamed kernel vs the production scatter on the same resident
#    stream, plus the within-batch duplicate fraction (sort+segment-sum
#    ceiling).
run fern_hist 1200 python tools/fern_hist_pallas.py --steps 100
# 2. Compile-wall chunk sweep for the dist-only p32 kernel (r4 #3): true
#    first-ever Mosaic compile per chunk (no-cache fresh subprocesses) vs
#    warm runtime on the real headline.  chunk 64 alone is ~5 min cold.
run compile_wall 2400 python tools/compile_wall_probe.py
# 3. Fresh driver-grade bench of the COMMITTED state: compact <=1,800 B
#    line, nres fields (expect 0 everywhere), mp100 device row, julia
#    sweep p50-of-repeats.
run bench_fresh 3600 python bench.py --repeats 3

echo "== queue done $(date -u +%FT%TZ) =="
echo "Next: copy /tmp/hwq/bench_fresh.log into evidence/r5/, update the"
echo "PERF.md ledger + fern/compile sections from fern_hist/compile_wall,"
echo "flip PERT_CHUNK or document the tradeoff, commit."
