"""Hardware probe for the fern scatter-add floor (VERDICT r3 #6).

PERF.md's r3 claim: the 100M-step fern is scatter-bound at ~7 ns/point,
resting on XLA's scatter lowering.  This probe measures, on real hardware,
whether splitting the scatter reduces that floor:

  * baseline: the production ``_fern_hits`` (65536 walkers, one int32
    histogram, ``.at[idx].add(1, mode='drop')`` per scan step);
  * subhist_G: the SAME walk, but walkers are split into G groups, each
    scattering into its OWN histogram copy ((G, H·W) int32), summed once
    at the end.  Fewer colliding addresses per scatter op — if XLA's
    scatter serializes collisions, G > 1 wins; if it's purely
    bandwidth-bound, G > 1 loses G× on the final sum's traffic only
    (one pass, amortized over all steps).
    Bit-parity: the per-walker trajectories are IDENTICAL to the baseline
    (same per-step RNG row, same branch selects), and integer adds
    commute, so sum(subhists) == baseline hist exactly (asserted).
  * batchS: accumulate S steps of indices in registers, one scatter of
    (S·k,) per S steps — probes whether larger scatter operands pipeline
    better than per-step ones.

EXPERIMENT-ONLY: no production route changes here; a measured win gets
productionized with tests afterwards.

Run on a live TPU:  python tools/fern_scatter_probe.py
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


def _walk_pieces(scene, width, height, k):
    """The production walk's step/plot closures (models/fern.py), rebuilt
    verbatim so every variant scatters the SAME point stream."""
    from fractal_tpu.models.fern import _FERN_COEFFS

    f32 = jnp.float32
    w_f = jnp.asarray(float(width), f32)
    h_f = jnp.asarray(float(height), f32)
    pos_re = jnp.asarray(scene.pos[0], f32)
    pos_im = jnp.asarray(scene.pos[1], f32)
    esx = 65.0 * jnp.asarray(scene.scale[0], f32) * h_f * 0.006
    esy = 37.0 * jnp.asarray(scene.scale[1], f32) * h_f * 0.006

    def walk_step(x, y, key):
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, (k,), f32)

        def pick(j):
            c = _FERN_COEFFS
            v = jnp.full((k,), float(c[0, j]), f32)
            v = jnp.where(r >= 0.01, float(c[1, j]), v)
            v = jnp.where(r >= 0.86, float(c[2, j]), v)
            v = jnp.where(r >= 0.93, float(c[3, j]), v)
            return v

        ca, cb, cc, cd, ce, cf_ = (pick(j) for j in range(6))
        nx = ca * x + cb * y + ce
        ny = cc * x + cd * y + cf_
        return nx, ny, key

    def plot_indices(x, y):
        px_f = (x - pos_re) * esx + w_f / 2.0
        py_f = h_f - ((y + (pos_im - 5.0) - 0.5) * esy + h_f / 2.0)
        px = jnp.maximum(jnp.trunc(px_f), 0.0).astype(jnp.int32)
        py = jnp.maximum(jnp.trunc(py_f), 0.0).astype(jnp.int32)
        valid = (px < width) & (py < height)
        flat = py * width + px
        return jnp.where(valid, flat, width * height)

    x0 = jnp.full((k,), pos_re * w_f, f32)
    y0 = jnp.full((k,), pos_im * h_f, f32)
    return walk_step, plot_indices, x0, y0


@functools.partial(jax.jit, static_argnames=("width", "height", "k", "steps",
                                             "groups", "burn_in"))
def fern_hits_subhist(scene, width: int, height: int, k: int, steps: int,
                      groups: int, seed, burn_in: int = 64):
    """(groups, H·W) sub-histograms over the production point stream."""
    walk_step, plot_indices, x0, y0 = _walk_pieces(scene, width, height, k)
    key0 = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
    per = k // groups

    def scan_body(carry, _):
        x, y, key, hist = carry
        idx = plot_indices(x, y).reshape(groups, per)
        hist = jax.vmap(lambda h_, i_: h_.at[i_].add(1, mode="drop"))(
            hist, idx)
        x, y, key = walk_step(x, y, key)
        return (x, y, key, hist), None

    def burn_body(carry, _):
        x, y, key, hist = carry
        x, y, key = walk_step(x, y, key)
        return (x, y, key, hist), None

    hist = jnp.zeros((groups, width * height), jnp.int32)
    carry = (x0, y0, key0, hist)
    carry, _ = jax.lax.scan(burn_body, carry, None, length=burn_in)
    carry, _ = jax.lax.scan(scan_body, carry, None, length=steps)
    return carry[3]


@functools.partial(jax.jit, static_argnames=("width", "height", "k", "steps",
                                             "batch", "burn_in"))
def fern_hits_batched(scene, width: int, height: int, k: int, steps: int,
                      batch: int, seed, burn_in: int = 64):
    """One (batch·k,) scatter per `batch` steps over the same point stream
    (steps must be a multiple of batch)."""
    walk_step, plot_indices, x0, y0 = _walk_pieces(scene, width, height, k)
    key0 = jax.random.fold_in(jax.random.PRNGKey(seed), 0)

    def scan_body(carry, _):
        x, y, key, hist = carry
        idxs = []
        for _i in range(batch):
            idxs.append(plot_indices(x, y))
            x, y, key = walk_step(x, y, key)
        hist = hist.at[jnp.concatenate(idxs)].add(1, mode="drop")
        return (x, y, key, hist), None

    def burn_body(carry, _):
        x, y, key, hist = carry
        x, y, key = walk_step(x, y, key)
        return (x, y, key, hist), None

    hist = jnp.zeros((width * height,), jnp.int32)
    carry = (x0, y0, key0, hist)
    carry, _ = jax.lax.scan(burn_body, carry, None, length=burn_in)
    carry, _ = jax.lax.scan(scan_body, carry, None, length=steps // batch)
    return carry[3]


def _time(fn, repeats=3):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from bench import _device_preflight
    from fractal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    err = _device_preflight(timeout=120, attempts=1)
    if err:
        print(json.dumps({"error": err}))
        return

    from fractal_tpu.config import scene_defaults
    from fractal_tpu.models.fern import DEFAULT_WALKERS, _burn_in, _fern_hits

    scene = scene_defaults("fern").replace(width=2000, height=2000,
                                           iterations=100_000_000)
    w, h = scene.width, scene.height
    k = DEFAULT_WALKERS
    steps = scene.iterations // k  # 1525 steps @ 65536 walkers
    bi = _burn_in(scene, w, h)
    out = {"backend": jax.default_backend(), "points": k * steps}

    def fence(v):
        return float(jnp.sum(v, dtype=jnp.float32))

    t = _time(lambda: fence(_fern_hits(scene, w, h, k, steps, 1, scene.seed,
                                       burn_in=bi)))
    out["base_ms"] = round(t * 1e3, 1)
    out["base_ns_per_point"] = round(t / (k * steps) * 1e9, 2)
    print(f"# baseline: {out['base_ms']} ms "
          f"({out['base_ns_per_point']} ns/point)", flush=True)
    hist_b = np.asarray(_fern_hits(scene, w, h, k, steps, 1, scene.seed,
                                   burn_in=bi))[0].ravel()

    for g in (2, 4, 8):
        t = _time(lambda g=g: fence(fern_hits_subhist(
            scene, w, h, k, steps, g, scene.seed, burn_in=bi)))
        out[f"subhist_{g}_ms"] = round(t * 1e3, 1)
        hs = np.asarray(fern_hits_subhist(scene, w, h, k, steps, g,
                                          scene.seed, burn_in=bi))
        ok = bool((hs.sum(axis=0) == hist_b).all())
        out[f"subhist_{g}_parity"] = ok
        print(f"# subhist G={g}: {out[f'subhist_{g}_ms']} ms, parity={ok}",
              flush=True)

    for b in (5, 25):  # divisors of the 1525-step schedule
        if steps % b:
            continue
        t = _time(lambda b=b: fence(fern_hits_batched(
            scene, w, h, k, steps, b, scene.seed, burn_in=bi)))
        out[f"batch_{b}_ms"] = round(t * 1e3, 1)
        hb = np.asarray(fern_hits_batched(scene, w, h, k, steps, b,
                                          scene.seed, burn_in=bi))
        ok = bool((hb == hist_b).all())
        out[f"batch_{b}_parity"] = ok
        print(f"# batch S={b}: {out[f'batch_{b}_ms']} ms, parity={ok}",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
