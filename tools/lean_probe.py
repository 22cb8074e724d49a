"""Hardware probe for the p32 δ-orbit kernel's op-count floor (VERDICT r3 #4).

PERF.md's calibration says the v2 kernel runs ~22 element-ops/step at the
v5e VPU's 4-ALU peak; the z²+c δ-step's arithmetic floor is ~12-14.  This
probe measures, on real hardware, where the remaining ops go and whether
they can be removed:

  * microbench: does Mosaic form FMAs, and do they count as one VPU op?
    (a contractible a·x+b chain vs the same chain with the traced-1.0
    contraction pin vs a mul-only chain)
  * baseline: the production kernel (glitch=False — the p32 route) on the
    3000²@1e6×/4000 headline workload;
  * V_dout: drop the zfr/zfi freeze selects and outputs — the coloring
    epilogue only ever consumes |z|² (smooth term and inside shading are
    functions of dist alone), so the frozen d + cnt suffice for the p32
    tier.  MUST be cnt-bit-identical to the baseline (asserted);
  * V_every2: escape-test every 2nd step (counts shift by +1 on pixels
    that escape on an odd step — measured, reported, NOT bit-equal: a
    candidate for an explicit faster preview tier only);
  * V_nofreeze: no selects at all (cnt-only output) — an upper bound on
    what select removal can buy, not a correct kernel.

EXPERIMENT-ONLY kernels: the probe carries its own minimal quadratic
resident-plane kernel twins so no dark variant ships in the production
module; a winning variant gets productionized with tests afterwards.

Run on a live TPU:  python tools/lean_probe.py
"""
from __future__ import annotations

import functools
import json
import os as _os
import statistics
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


TILE_H, TILE_W, CHUNK = 32, 128, 16


def _build_probe_kernel(iterations: int, variant: str, chunk: int = CHUNK):
    """Minimal quadratic non-julia resident-plane δ-orbit kernel — the
    production _build_pert_kernel_v2 loop (perturb.py) with glitch=False,
    restricted to z²+c, plus the probe variants."""
    n_chunks = _cdiv(max(iterations, 1), chunk)
    every2 = variant == "every2"
    dout = variant in ("dout", "every2", "nofreeze")
    nofreeze = variant == "nofreeze"

    def kernel(ns_ref, p_ref, zr2_ref, zi2_ref, gt_ref, *outs):
        if dout:
            d_ref, cnt_ref = outs
        else:
            zr_ref, zi_ref, cnt_ref, d_ref = outs
        f32 = jnp.float32
        P = [p_ref[i] for i in range(16)]
        n_steps = ns_ref[0]
        limit_sq = P[4]
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        y0 = ti * TILE_H
        x0 = tj * TILE_W
        yy = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
              + y0).astype(f32)
        xx = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
              + x0).astype(f32)
        yy = yy * P[6] + P[7]
        dcr = (xx - P[2]) * P[0]
        dci = (yy - P[3]) * P[1]
        rows = zr2_ref.shape[0]

        # series-approximation init (identical to production)
        n0 = P[8].astype(jnp.int32)
        ur = dcr * P[15]
        ui = dci * P[15]
        t1r = P[13] * ur - P[14] * ui + P[11]
        t1i = P[13] * ui + P[14] * ur + P[12]
        t2r = t1r * ur - t1i * ui + P[9]
        t2i = t1r * ui + t1i * ur + P[10]
        dz0r = t2r * ur - t2i * ui
        dz0i = t2r * ui + t2i * ur
        zfr0 = 0.5 * zr2_ref[pl.ds(n0, 1), :] + dz0r
        zfi0 = 0.5 * zi2_ref[pl.ds(n0, 1), :] + dz0i
        d0 = zfr0 * zfr0 + zfi0 * zfi0
        cnt0 = jnp.zeros(dcr.shape, jnp.int32) + n0

        def chunk_body(carry):
            (dzr, dzi, zfr, zfi, d, cnt), k = carry
            n0c = k * chunk
            start = jnp.minimum(n0c, rows - (chunk + 1))
            br = zr2_ref[pl.ds(start, chunk + 1), :]
            bi = zi2_ref[pl.ds(start, chunk + 1), :]
            hbr = 0.5 * br
            hbi = 0.5 * bi
            state = (dzr, dzi, zfr, zfi, d, cnt)
            for i in range(chunk):
                dzr, dzi, zfr, zfi, d, cnt = state
                n = n0c + i
                if every2 and i % 2 == 0:
                    # step without an escape test: pixels escaping here are
                    # detected one step late (cnt +1, d one squaring on)
                    tr = br[i:i + 1, :] + dzr
                    t2 = bi[i:i + 1, :] + dzi
                    ndzr = tr * dzr - t2 * dzi + dcr
                    ndzi = tr * dzi + t2 * dzr + dci
                    state = (ndzr, ndzi, zfr, zfi, d, cnt)
                    continue
                live = (d <= limit_sq) & (n < n_steps)
                tr = br[i:i + 1, :] + dzr
                t2 = bi[i:i + 1, :] + dzi
                ndzr = tr * dzr - t2 * dzi + dcr
                ndzi = tr * dzi + t2 * dzr + dci
                nzfr = hbr[i + 1:i + 2, :] + ndzr
                nzfi = hbi[i + 1:i + 2, :] + ndzi
                nd = nzfr * nzfr + nzfi * nzfi
                if not dout:
                    zfr = jnp.where(live, nzfr, zfr)
                    zfi = jnp.where(live, nzfi, zfi)
                if not nofreeze:
                    d = jnp.where(live, nd, d)
                else:
                    d = nd
                cnt = cnt + (live if not every2
                             else 2 * live.astype(jnp.int32))
                state = (ndzr, ndzi, zfr, zfi, d, cnt)
            return state, k + 1

        def chunk_cond(carry):
            (dzr, dzi, zfr, zfi, d, cnt), k = carry
            n = k * chunk
            return (k < n_chunks) & (n < n_steps) & jnp.any(d <= limit_sq)

        (dzr, dzi, zfr, zfi, d, cnt), _ = jax.lax.while_loop(
            chunk_cond, chunk_body,
            ((dz0r, dz0i, zfr0, zfi0, d0, cnt0), n0 // jnp.int32(chunk)),
        )
        escaped = d > limit_sq
        if every2:
            cnt = jnp.maximum(cnt - 2 * escaped.astype(jnp.int32), 0)
        else:
            cnt = jnp.maximum(cnt - escaped, 0)
        if dout:
            d_ref[:] = d
            cnt_ref[:] = cnt
        else:
            zr_ref[:] = zfr
            zi_ref[:] = zfi
            cnt_ref[:] = cnt
            d_ref[:] = d

    return kernel


@functools.partial(jax.jit, static_argnames=("iterations", "height", "width",
                                             "variant", "interpret"))
def probe_kernel(planes, P, n_steps, *, iterations: int, height: int,
                 width: int, variant: str, interpret: bool = False):
    kernel = _build_probe_kernel(iterations, variant)
    n_steps = jnp.asarray(n_steps, jnp.int32).reshape(1)
    grid = (_cdiv(height, TILE_H), _cdiv(width, TILE_W))
    outf = jax.ShapeDtypeStruct((height, width), jnp.float32)
    outi = jax.ShapeDtypeStruct((height, width), jnp.int32)
    block = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
    outs = ((outf, outi) if variant in ("dout", "every2", "nofreeze")
            else (outf, outf, outi, outf))
    out_specs = tuple(block() for _ in outs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=outs,
        interpret=interpret,
    )(n_steps, P, *planes)


# ---------------------------------------------------------------------------
# FMA microbenchmark
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("steps", "mode"))
def chain_kernel(x, a, b, *, steps: int, mode: str):
    """x <- a*x + b repeated `steps` times on a VMEM tile.  mode:
    'fma' (contractible), 'pinned' (a*x)*pin + b, 'mul' (x <- x*a only)."""
    def kernel(p_ref, x_ref, a_ref, b_ref, o_ref):
        x = x_ref[:]
        a = a_ref[:]
        b = b_ref[:]
        pin = p_ref[0] * 0.0 + 1.0
        def body(i, x):
            if mode == "fma":
                return a * x + b
            if mode == "pinned":
                return (a * x) * pin + b
            return x * a
        x = jax.lax.fori_loop(0, steps, body, x)
        o_ref[:] = x

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(jnp.ones((1,), jnp.float32), x, a, b)


def _fence(v):
    return float(jnp.sum(v, dtype=jnp.float32))


def _time(fn, repeats=5):
    fn()  # warm/compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    sys.path.insert(0, ".")
    from bench import _device_preflight
    from fractal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    err = _device_preflight(timeout=120, attempts=1)
    if err:
        print(json.dumps({"error": err}))
        return 2
    from fractal_tpu.config import Scene
    import fractal_tpu.ops.perturb as pt

    out = {"backend": jax.default_backend()}

    # ---- microbench: is an FMA one VPU op? ----
    shape = (512, 512)
    x = jnp.full(shape, 0.5, jnp.float32)
    a = jnp.full(shape, 0.999999, jnp.float32)
    b = jnp.full(shape, 1e-7, jnp.float32)
    steps = 20000
    for mode in ("fma", "pinned", "mul"):
        t = _time(lambda m=mode: _fence(chain_kernel(x, a, b, steps=steps,
                                                     mode=m)))
        ops = shape[0] * shape[1] * steps
        out[f"chain_{mode}_gops"] = round(ops / t / 1e9, 1)
        print(f"# chain {mode}: {t*1e3:.1f} ms = "
              f"{out[f'chain_{mode}_gops']} G elem-steps/s", flush=True)

    # ---- headline workload ----
    scene = Scene(width=3000, height=3000, iterations=4000,
                  pos=(-0.7436447860, 0.1318252536), scale=(1e6, 1e6),
                  exposure=5.0, inside=False, precision="p32")
    h, w, on_accel, ref_px, orbit, P, ns, dev = pt._perturb_setup(scene, True)
    assert on_accel, "probe needs a TPU backend"
    planes = dev

    def run_base():
        zr, zi, cnt, gl = pt.perturb_pallas_v2(
            planes, P, ns, iterations=scene.iterations, height=h, width=w,
            julia=False, glitch=False)
        return _fence(cnt)

    t_base = _time(run_base)
    out["base_ms"] = round(t_base * 1e3, 2)
    print(f"# production kernel (glitch=False): {out['base_ms']} ms",
          flush=True)

    zr_b, zi_b, cnt_b, gl_b = pt.perturb_pallas_v2(
        planes, P, ns, iterations=scene.iterations, height=h, width=w,
        julia=False, glitch=False)
    cnt_b = np.asarray(cnt_b)

    for variant in ("base", "dout", "every2", "nofreeze"):
        vouts = {}

        def run(v=variant):
            r = probe_kernel(planes[:3], P, ns, iterations=scene.iterations,
                             height=h, width=w, variant=v)
            return _fence(r[-1] if v != "base" else r[2])

        t = _time(run)
        out[f"{variant}_ms"] = round(t * 1e3, 2)
        r = probe_kernel(planes[:3], P, ns, iterations=scene.iterations,
                         height=h, width=w, variant=variant)
        cnt_v = np.asarray(r[-1] if variant != "base" else r[2])
        neq = int((cnt_v != cnt_b).sum())
        out[f"{variant}_cnt_mismatch"] = neq
        print(f"# probe {variant}: {out[f'{variant}_ms']} ms, "
              f"cnt mismatches vs production: {neq}/{cnt_b.size}",
              flush=True)

    print(json.dumps(out))
    # Correctness gates (the docstring's contract): the probe's own 'base'
    # twin and the candidate 'dout' variant must be cnt-bit-identical to the
    # production kernel — a nonzero count here disqualifies 'dout' from
    # productionization no matter how fast it is.  every2/nofreeze are
    # expected to shift counts (preview-tier / upper-bound only).
    failures = [v for v in ("base", "dout") if out[f"{v}_cnt_mismatch"]]
    if failures:
        print(f"FAIL: cnt mismatch in gated variant(s): {failures}")
        return 1
    print("PASS: base and dout cnt-bit-identical to production")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
