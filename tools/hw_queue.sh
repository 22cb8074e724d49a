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
  # the tunnel's good-but-slow windows answer a tiny op in up to ~4.5 min
  # (observed 265 s on 2026-08-20); give the probe the same 560 s budget
  # as the job preflights so a marginal window isn't wasted
  timeout 560 python -c "
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

# Round-5b queue (the 2026-08-20 00:01Z run delivered compile_wall +
# bench_fresh — evidence/r5/ — but fern_hist lost its window to a 280 s
# preflight on a slow tunnel; preflights are 560 s now):
#
# 1. The real Pallas fern-histogram attempt (r4 #5): serialized SMEM-
#    streamed kernel vs the production scatter on the same resident
#    stream, plus the within-batch duplicate fraction (sort+segment-sum
#    ceiling).
run fern_hist 2400 python tools/fern_hist_pallas.py --steps 100
# 2. Extend the r5 chunk sweep upward: warm runtime was still improving
#    monotonically at the chunk-64 default (150.8 ms) with flat ~11 s
#    compiles — measure 128/256 for a possible free headline win.
run compile_wall_ext 1800 python tools/compile_wall_probe.py --chunks 128,256

echo "== queue done $(date -u +%FT%TZ) =="
echo "Next: copy /tmp/hwq/{fern_hist,compile_wall_ext}.log into"
echo "evidence/r5/, update PERF.md's fern + compile sections, flip"
echo "PERT_CHUNK if 128/256 wins >=3% with sane compile, commit."
