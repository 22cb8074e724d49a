"""Hardware probe: Mosaic compile wall vs runtime for the p32 dist-only
kernel (VERDICT r4 #3).

The default headline kernel (dist-only v2, chunk 64) measured a 271–326 s
FIRST-EVER Mosaic compile in r4 (then persistent-cached; warm process
0.17 s).  Mosaic compile time is super-linear in the unrolled body size
(the fe kernel's chunk sweep in r3: chunk 16 = 583 s cold / 37.5 ms run,
chunk 8 = 24 s / 40.8 ms → default chunk 8).  This probe runs the same
sweep for the dist-only p32 kernel on the REAL headline workload
(3000²@1e6×, 4000 iters): per chunk, a FRESH subprocess with the
persistent XLA cache disabled pays the true first-ever compile, then
times warm repeats in-process.

Budget rule being applied (VERDICT r4 #3): first-ever compile ≤ 60 s
unless the deeper unroll buys ≥ 1.2× runtime.

EXPERIMENT-ONLY: a measured knee changes PERT_CHUNK for the dist-only
route (with tests re-pinned) in a separate commit.

Run on a live TPU:  python tools/compile_wall_probe.py
"""
from __future__ import annotations

import argparse
import json
import os as _os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

CHUNKS = (8, 16, 32, 64)


def child(chunk: int, repeats: int = 3):
    import jax
    import jax.numpy as jnp

    from bench import headline_scene
    from fractal_tpu.ops import perturb as pt
    from fractal_tpu.render import _color_and_downsample_dist

    scene = headline_scene().replace(precision="p32")
    h, w, on_accel, ref_px, orbit, P, ns, dev = pt._perturb_setup(
        scene, True)
    planes = dev  # fast-tier setup returns the plane tuple on accelerators

    def call(P_):
        d, cnt = pt.perturb_pallas_v2(
            planes, P_, ns, iterations=scene.iterations, height=h, width=w,
            julia=False, glitch=False, dist_only=True, chunk=chunk)
        img = _color_and_downsample_dist(scene, d, cnt)
        return float(jnp.sum(img, dtype=jnp.int32))  # tunnel-reliable fence

    t0 = time.perf_counter()
    call(P)
    cold = time.perf_counter() - t0
    times = []
    for i in range(repeats):
        # bust the tunnel's identical-dispatch dedupe: P[4] (limit²) gets a
        # per-repeat f32-visible nudge — no recompile (traced leaf)
        P_ = P.at[4].multiply(1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        call(P_)
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "chunk": chunk,
        "backend": jax.default_backend(),
        "compile_first_ever_s": round(cold, 1),
        "warm_p50_ms": round(statistics.median(times) * 1e3, 2),
        "warm_ms": [round(t * 1e3, 1) for t in times],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=int, default=None,
                    help="(internal) measure one chunk in this process")
    ap.add_argument("--chunks", type=str, default=None,
                    help="comma-separated chunk list (default 8,16,32,64)")
    args = ap.parse_args()

    if args.one is not None:
        return child(args.one)

    from bench import _device_preflight

    err = _device_preflight(timeout=560, attempts=1)
    if err:
        print(json.dumps({"error": err}))
        return

    chunks = (tuple(int(c) for c in args.chunks.split(","))
              if args.chunks else CHUNKS)
    results = []
    for c in chunks:
        env = dict(_os.environ)
        env["FRACTAL_TPU_NO_CACHE"] = "1"  # pay the TRUE first-ever compile
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, __file__, "--one", str(c)],
            env=env, capture_output=True, text=True, timeout=1800,
            cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        )
        wall = time.perf_counter() - t0
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"# chunk {c}: FAILED rc={r.returncode} "
                  f"{r.stderr.strip()[-300:]}", flush=True)
            results.append({"chunk": c, "error": r.stderr.strip()[-200:]})
            continue
        rec = json.loads(line[-1])
        rec["subprocess_wall_s"] = round(wall, 1)
        results.append(rec)
        print(f"# chunk {c}: first-ever compile "
              f"{rec['compile_first_ever_s']} s, warm "
              f"{rec['warm_p50_ms']} ms", flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
