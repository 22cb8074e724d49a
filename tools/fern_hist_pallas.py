"""Hardware probe: a REAL Pallas per-tile VMEM histogram for the fern
(VERDICT r4 #5 — r3 #6 asked for one measured Pallas attempt at the
scatter floor; r4 answered with XLA-level probes, this is the kernel).

The design under test ("masked serialization" — the only conflict-correct
per-point update a TPU offers, since there is no atomic scatter hardware
and VPU lanes cannot address independent bins):

  * the point stream (flat bin indices from the production walk) streams
    through SMEM in chunks, where the scalar core can read one index per
    loop iteration;
  * the histogram lives in VMEM as (rows, 128) i32 slabs (4M bins = 16 MB
    exceeds the v5e VMEM budget, so the bin space splits into slabs and
    the stream is re-scanned once per slab — VMEM bin pressure is part of
    the measurement);
  * each point updates its bin with a serialized read-modify-write of the
    (1, 128) row: load row, add a one-hot lane mask, store row.  Points
    outside the slab land in a dummy row (masked serialization).

This is strictly sequential per point — exactly what correctness requires
without atomics — so the measured ns/point IS the per-point floor of this
design.  The production S-batched XLA scatter runs ~4.7 ns/point
(PERF.md r4); the kernel must beat 4.7/slabs ns/point to win.

The tile-local sort + segment-sum variant's ceiling is also measured
here WITHOUT building the sort: a sorted batch still scatters one update
per UNIQUE index, so its best case saves only the duplicate fraction of
the stream (sort itself costing zero).  The probe measures the real
within-batch duplicate fraction from the production walk.

EXPERIMENT-ONLY: no production route changes here; a measured win gets
productionized with tests afterwards.

Run on a live TPU:  python tools/fern_hist_pallas.py
Correctness check (CPU interpreter):  python tools/fern_hist_pallas.py --check
"""
from __future__ import annotations

import argparse
import functools
import json
import os as _os
import statistics
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if _os.environ.get("FRACTAL_TPU_PLATFORM"):
    # same pre-init override as the CLI entry: --check must run on CPU
    # without touching the (occasionally hung) TPU tunnel
    jax.config.update("jax_platforms", _os.environ["FRACTAL_TPU_PLATFORM"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _hist_kernel(idx_ref, hist_ref, *, chunk: int, slab_bins: int):
    """One (slab, chunk) grid step: serialize the chunk's points into the
    slab's VMEM histogram.  idx_ref is an SMEM (chunk,) i32 block — the
    scalar core reads one index per iteration; hist_ref is the slab's
    (slab_bins/128 + 1, 128) VMEM block (last row = dummy for points
    outside the slab / dropped sentinel indices)."""
    slab = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    base = slab * slab_bins
    n_rows = slab_bins // LANES  # dummy row index
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(i, carry):
        v = idx_ref[i] - base  # scalar i32 from SMEM
        ok = jnp.logical_and(v >= 0, v < slab_bins)
        row = jnp.where(ok, jax.lax.div(v, LANES), n_rows)
        col = jnp.bitwise_and(v, LANES - 1)
        r = hist_ref[pl.ds(row, 1), :]
        hist_ref[pl.ds(row, 1), :] = r + (lane == col).astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "chunk", "slab_bins",
                                    "interpret"))
def hist_pallas(idx, *, n_bins: int, chunk: int = 2048,
                slab_bins: int = 1 << 21, interpret: bool = False):
    """Histogram of ``idx`` over [0, n_bins) via the serialized Pallas
    kernel.  Indices outside [0, n_bins) are dropped (the production
    stream uses W·H as its drop sentinel).  Returns (n_bins,) i32."""
    n = idx.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    slab_bins = min(slab_bins, -(-n_bins // (LANES * 8)) * LANES * 8)
    n_slabs = -(-n_bins // slab_bins)
    rows = slab_bins // LANES + 8  # + dummy rows (8 keeps sublane alignment)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, chunk=chunk, slab_bins=slab_bins),
        grid=(n_slabs, n_chunks),
        in_specs=[pl.BlockSpec((chunk,), lambda s, j: (j,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, LANES), lambda s, j: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((n_slabs * rows, LANES), jnp.int32),
        interpret=interpret,
    )(idx)
    # strip each slab's dummy rows, flatten, cut the bin padding
    out = out.reshape(n_slabs, rows, LANES)[:, :-8, :]
    return out.reshape(-1)[:n_bins]


# --------------------------------------------------------------------------
# Production point stream (identical walk to models/fern.py::_fern_hits)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("width", "height", "k", "steps",
                                             "burn_in"))
def walk_stream(scene, width: int, height: int, k: int, steps: int,
                seed, burn_in: int = 64):
    """(steps, k) i32 plot indices of the production walk (drop sentinel
    W·H for off-image points) — the exact stream the production scatter
    consumes, so kernel timings weigh the same duplicate structure."""
    from tools.fern_scatter_probe import _walk_pieces

    walk_step, plot_indices, x0, y0 = _walk_pieces(scene, width, height, k)
    key0 = jax.random.fold_in(jax.random.PRNGKey(seed), 0)

    def burn_body(carry, _):
        x, y, key = carry
        x, y, key = walk_step(x, y, key)
        return (x, y, key), None

    def scan_body(carry, _):
        x, y, key = carry
        idx = plot_indices(x, y)
        x, y, key = walk_step(x, y, key)
        return (x, y, key), idx

    carry = (x0, y0, key0)
    carry, _ = jax.lax.scan(burn_body, carry, None, length=burn_in)
    _, idxs = jax.lax.scan(scan_body, carry, None, length=steps)
    return idxs


@functools.partial(jax.jit, static_argnames=("n_bins",))
def hist_scatter(idx, *, n_bins: int):
    """The production lowering: one XLA scatter-add of the whole stream."""
    hist = jnp.zeros((n_bins + 1,), jnp.int32)
    return hist.at[idx].add(1, mode="drop")[:n_bins]


def _time(fn, repeats=3):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def check_interpret():
    """Correctness on the CPU interpreter: kernel == np.bincount on a
    small real stream, including drop-sentinel and multi-slab routing."""
    from fractal_tpu.config import scene_defaults
    from fractal_tpu.models.fern import _burn_in

    scene = scene_defaults("fern").replace(width=200, height=200,
                                           iterations=100_000)
    w, h = scene.width, scene.height
    k, steps = 1024, 12
    idx = np.asarray(walk_stream(scene, w, h, k, steps, scene.seed,
                                 burn_in=_burn_in(scene, w, h))).ravel()
    n_bins = w * h
    ref = np.bincount(idx[idx < n_bins], minlength=n_bins).astype(np.int32)
    got = np.asarray(hist_pallas(jnp.asarray(idx), n_bins=n_bins,
                                 chunk=512, slab_bins=1 << 14,
                                 interpret=True))
    assert got.shape == ref.shape and (got == ref).all(), (
        "pallas histogram != bincount: "
        f"{int((got != ref).sum())} bins differ")
    print("interpret-mode parity: OK "
          f"({idx.size} points, {n_bins} bins, "
          f"{-(-n_bins // (1 << 14))} slabs)")


def duplicate_fraction(scene, w, h, k, steps, batch):
    """Within-batch duplicate fraction of the real stream — the best-case
    saving of ANY sort+segment-sum scheme (it still issues one scatter
    update per unique index per batch, with the sort costing >= 0)."""
    from fractal_tpu.models.fern import _burn_in

    idx = np.asarray(walk_stream(scene, w, h, k, steps, scene.seed,
                                 burn_in=_burn_in(scene, w, h)))
    per = batch * k
    flat = idx.reshape(-1)[: (idx.size // per) * per].reshape(-1, per)
    fracs = [1.0 - np.unique(b[b < w * h]).size / max((b < w * h).sum(), 1)
             for b in flat]
    return float(np.mean(fracs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="CPU-interpreter correctness only")
    ap.add_argument("--steps", type=int, default=100,
                    help="walk steps (x65536 walkers) for device timing")
    args = ap.parse_args()

    if args.check:
        check_interpret()
        return

    from bench import _device_preflight
    from fractal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    err = _device_preflight(timeout=560, attempts=1)
    if err:
        print(json.dumps({"error": err}))
        return

    from fractal_tpu.config import scene_defaults
    from fractal_tpu.models.fern import DEFAULT_WALKERS, SCATTER_BATCH, _burn_in

    scene = scene_defaults("fern").replace(width=2000, height=2000,
                                           iterations=100_000_000)
    w, h = scene.width, scene.height
    k = DEFAULT_WALKERS
    steps = args.steps
    n = k * steps
    n_bins = w * h
    bi = _burn_in(scene, w, h)
    out = {"backend": jax.default_backend(), "points": n,
           "n_bins": n_bins}

    # the real stream, resident on device (n x 4 B)
    idx = walk_stream(scene, w, h, k, steps, scene.seed, burn_in=bi)
    idx = idx.reshape(-1)
    idx.block_until_ready()

    def fence(v):
        return float(jnp.sum(v, dtype=jnp.float32))

    # production lowering on the same resident stream
    t = _time(lambda: fence(hist_scatter(idx, n_bins=n_bins)))
    out["scatter_ms"] = round(t * 1e3, 1)
    out["scatter_ns_per_point"] = round(t / n * 1e9, 2)
    print(f"# xla scatter: {out['scatter_ms']} ms "
          f"({out['scatter_ns_per_point']} ns/point)", flush=True)
    ref = np.asarray(hist_scatter(idx, n_bins=n_bins))

    # the Pallas kernel, 2 slabs of 2M bins (8.4 MB VMEM each)
    for chunk in (2048, 8192):
        t0 = time.perf_counter()
        got = hist_pallas(idx, n_bins=n_bins, chunk=chunk)
        got.block_until_ready()
        compile_s = time.perf_counter() - t0
        ok = bool((np.asarray(got) == ref).all())
        t = _time(lambda: fence(hist_pallas(idx, n_bins=n_bins,
                                            chunk=chunk)))
        out[f"pallas_c{chunk}_ms"] = round(t * 1e3, 1)
        out[f"pallas_c{chunk}_ns_per_point"] = round(t / n * 1e9, 2)
        out[f"pallas_c{chunk}_parity"] = ok
        out[f"pallas_c{chunk}_compile_s"] = round(compile_s, 1)
        print(f"# pallas chunk={chunk}: {out[f'pallas_c{chunk}_ms']} ms "
              f"({out[f'pallas_c{chunk}_ns_per_point']} ns/point), "
              f"parity={ok}, compile {compile_s:.0f}s", flush=True)

    # sort+segment-sum ceiling: the within-batch duplicate fraction
    dup = duplicate_fraction(scene, w, h, k, min(steps, 50), SCATTER_BATCH)
    out["dup_fraction_batchS"] = round(dup, 4)
    out["sortseg_best_ns_per_point"] = round(
        out["scatter_ns_per_point"] * (1.0 - dup), 2)
    print(f"# within-batch duplicate fraction (S={SCATTER_BATCH}): "
          f"{dup:.3f} -> free-sort segment-sum floor "
          f"{out['sortseg_best_ns_per_point']} ns/point", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
