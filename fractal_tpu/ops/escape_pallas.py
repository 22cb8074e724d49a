"""Pallas TPU escape-time kernel — the hot path.

TPU-native re-design of the reference's per-pixel scalar loop
(``recursive``, calc/src/lib.rs:245-257).  One pallas_call tiles the image
into VMEM-sized blocks on a 2-D grid; each program:

  1. reconstructs its tile's complex coordinates from ``broadcasted_iota``
     plus four scalars (c = x·A + C — the viewport transform
     calc/src/lib.rs:181-197 refactored into one multiply-add whose
     constants are computed exactly on the host, see ``viewport_affine``);
  2. iterates the whole tile in lock-step with a freeze-on-escape mask
     (the TPU answer to the reference's per-pixel early return);
  3. early-exits via a chunked ``lax.while_loop`` once every lane in the
     tile has escaped or exhausted the budget — so tiles far outside the
     set cost a handful of chunks while interior tiles burn the full
     budget, recovering the work-adaptivity the scalar loop had.

Everything is VPU elementwise mul/add; no HBM traffic inside the loop —
state lives in vector registers / VMEM for the whole iteration.

Two number representations share the scaffold:
  * ``f32``  — plain float32 (shallow zooms, scale·height ≲ 5e4);
  * ``ds32`` — double-single float32 pairs (ops/dd.py), ~2⁻⁴⁸ relative
    precision: the deep-zoom representation that replaces f64 (which TPUs
    lack — the same wall that stalled the reference's GPU port,
    reference README.md:20-22).

Grid-edge handling: dims are padded up to the tile size; out-of-range lanes
compute garbage that is masked off by Pallas' clipped output writes.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fractal_tpu.ops import dd
from fractal_tpu.models.rules import get_rule

# Tile shape: (sublane, lane) multiples of the f32 (8, 128) VPU tile.
# Swept on a v5e chip against the 3000²@1e6×/4000-iter headline scene:
# 32×128 is the divergence sweet spot (128×128: 766 ms, 64×128: 576,
# 32×128: 487, 16×128: 538, 8×128: 770) — small enough that a tile's
# lock-step cost tracks its own neighborhood's escape time, big enough
# that per-tile grid overhead stays amortized.
TILE_H = 32
TILE_W = 128
# Iterations between all-escaped checks (same sweep: 8: 551 ms, 16: 487,
# 32: 456, 64: 453 — the any() reduction is costly enough to batch 32 deep).
CHUNK = 32

# Periodicity (interior cycle) detection radius — squared.  Trade-off: the
# bigger it is, the sooner slowly-converging interior orbits are caught,
# but an exterior orbit passing within eps of periodic must not be able to
# escape within any realistic remaining budget (drift doubles per ~period).
# ds32: 1e-9 absolute — ~5 decades above the ds32 noise floor (~4e-15·|z|)
# so slowly-converging cycles are caught early; an exterior orbit that comes
# this close to periodic needs ≫10⁴ more iterations to escape, so within
# realistic budgets the classification matches exact iteration (measured on
# the headline view: ~1e-6 of pixels flip — creepers straddling the budget).
PERIOD_EPS_SQ_DS32 = 1e-18
PERIOD_EPS_SQ_F32 = 1e-12


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Host-side exact viewport constants
# ---------------------------------------------------------------------------


def viewport_affine(width: int, height: int, pos, scale,
                    dtype=np.float32) -> Tuple:
    """Refactor the reference transform  c = ((u/h) − off)/s + p  into
    c = u·A + C with A = 1/(h·s), C = p − off/s, computed in exact rational
    arithmetic on the host then split to double-word pairs of ``dtype``.

    Exactness matters: at 1e12× zoom the pixel spacing is below f64 epsilon
    relative to C, so A and C are built with Fractions and only *then*
    rounded — each constant is accurate to the full double-word precision.
    Returns ((A_re, C_re), (A_im, C_im)) as dd pairs.
    """
    out = []
    for axis, (p, s) in enumerate(zip(pos, scale)):
        off = Fraction(width, height * 2) if axis == 0 else Fraction(1, 2)
        a = Fraction(1) / (Fraction(height) * Fraction(float(s)))
        pf = p if isinstance(p, Fraction) else Fraction(float(p))
        c = pf - off / Fraction(float(s))
        out.append((_split_fraction(a, dtype), _split_fraction(c, dtype)))
    return tuple(out)


def _split_fraction(v: Fraction, dtype=np.float32) -> Tuple:
    hi = dtype(float(v))
    lo = dtype(float(v - Fraction(float(hi))))
    return hi, lo


# ---------------------------------------------------------------------------
# Number-representation adapters (shared kernel scaffold)
# ---------------------------------------------------------------------------


class _F32Rep:
    """Plain float32 lanes."""

    n_params = 0  # beyond the common block

    @staticmethod
    def make_c(xx, yy, P):
        # P layout (f32): [Ar_hi, Ar_lo, Cr_hi, Cr_lo, Ai_hi, Ai_lo, Ci_hi, Ci_lo]
        cr = xx * (P[0] + P[1]) + (P[2] + P[3])
        ci = yy * (P[4] + P[5]) + (P[6] + P[7])
        return cr, ci

    @staticmethod
    def to_z(c):
        return c

    @staticmethod
    def const(c_re, c_im, like):
        return (jnp.full_like(like[0], c_re), jnp.full_like(like[0], c_im))

    @staticmethod
    def step(rule, z, c):
        zr, zi = rule(z[0], z[1], c[0], c[1])
        return (zr, zi)

    @staticmethod
    def dist(z):
        return z[0] * z[0] + z[1] * z[1]

    @staticmethod
    def select(mask, a, b):
        return tuple(jnp.where(mask, x, y) for x, y in zip(a, b))

    @staticmethod
    def diff_dist(a, b):
        dr = a[0] - b[0]
        di = a[1] - b[1]
        return dr * dr + di * di

    @staticmethod
    def collapse(z):
        return z[0], z[1]


class _DS32Rep:
    """Double-single float32 pairs: z = ((zr_hi, zr_lo), (zi_hi, zi_lo))."""

    @staticmethod
    def make_c(xx, yy, P):
        Ar, Cr = (P[0], P[1]), (P[2], P[3])
        Ai, Ci = (P[4], P[5]), (P[6], P[7])
        cr = dd.add(dd.mul_f(Ar, xx), Cr)
        ci = dd.add(dd.mul_f(Ai, yy), Ci)
        return cr, ci

    @staticmethod
    def to_z(c):
        return c

    @staticmethod
    def const(c_re, c_im, like):
        zr_hi = like[0][0]
        f = lambda v: jnp.full_like(zr_hi, v)
        return ((f(c_re[0]), f(c_re[1])), (f(c_im[0]), f(c_im[1])))

    @staticmethod
    def dist(z):
        # Escape test only needs the hi words (threshold is ≥ 2, relative
        # error of hi-only sum ~2⁻²⁴ — never flips a test that matters).
        return z[0][0] * z[0][0] + z[1][0] * z[1][0]

    @staticmethod
    def select(mask, a, b):
        return tuple(
            tuple(jnp.where(mask, x, y) for x, y in zip(pa, pb))
            for pa, pb in zip(a, b)
        )

    @staticmethod
    def diff_dist(a, b):
        # full hi+lo difference: resolves below the ds32 noise floor
        dr = (a[0][0] - b[0][0]) + (a[0][1] - b[0][1])
        di = (a[1][0] - b[1][0]) + (a[1][1] - b[1][1])
        return dr * dr + di * di

    @staticmethod
    def collapse(z):
        return z[0][0] + z[0][1], z[1][0] + z[1][1]

    # -- dd iteration rules -------------------------------------------------

    @staticmethod
    def step(rule_name_power, z, c):
        name, power = rule_name_power
        zr, zi = z
        cr, ci = c
        if name in ("mandelbrot", "julia", "multibrot") and power == 2:
            nzr, nzi = dd.quad_step(zr, zi, cr, ci)
        elif name == "burningship":
            ar = dd.where(zr[0] < 0, dd.neg(zr), zr)
            ai = dd.where(zi[0] < 0, dd.neg(zi), zi)
            nzr, nzi = dd.quad_step(ar, ai, cr, ci)
        elif name == "tricorn":
            nzr, nzi = dd.quad_step(zr, zi, cr, ci, cross_sign=-1.0)
        elif name in ("mandelbrot", "julia", "multibrot"):
            wr, wi = zr, zi
            for _ in range(power - 1):
                nwr = dd.sub(dd.mul(wr, zr), dd.mul(wi, zi))
                nwi = dd.add(dd.mul(wr, zi), dd.mul(wi, zr))
                wr, wi = nwr, nwi
            nzr = dd.add(wr, cr)
            nzi = dd.add(wi, ci)
        else:
            raise ValueError(f"no ds32 rule for {name!r}")
        return nzr, nzi


# ---------------------------------------------------------------------------
# Kernel builder
# ---------------------------------------------------------------------------


def _iterate_tile(rep, rule, is_ds: bool, julia: bool, iterations: int,
                  chunk: int, xx, yy, P, periodicity: bool = False,
                  unroll: bool = True):
    """Shared iteration scaffold: viewport → masked lock-step loop with
    chunked early exit.  Runs identically inside a Pallas kernel (xx/yy =
    tile-local iota + tile origin) and as a whole-image jnp program (the
    CPU fallback for ds32, where Pallas TPU lowering is unavailable and
    interpret mode is orders of magnitude too slow).

    ``periodicity=True`` adds Brent-style cycle detection: a snapshot of z
    is taken at power-of-two steps; a pixel whose orbit returns within EPS
    of the snapshot is interior — it can never escape within any realistic
    budget — and is frozen with cnt = iterations immediately instead of
    burning the rest of the budget.  Interior-heavy deep views get ~budget/
    detection-time speedups.  Only enabled when the caller knows the final
    z phase is irrelevant (scene.inside == False: interior renders black,
    calc/src/lib.rs:232-233); with inside shading the reference's
    secondary×|z_final|² depends on the exact phase at step `iterations`.
    """
    limit_sq = P[8]
    n_chunks = _cdiv(max(iterations, 1), chunk)
    shape = xx.shape
    # Absolute detection radius: well above the representation noise floor
    # (ds32 ~4e-15·|z|, f32 ~1e-7·|z|) so converged cycles trigger, tiny
    # enough that a not-yet-detected orbit this close to periodic cannot
    # escape within ~1e6 further iterations.
    eps_sq = PERIOD_EPS_SQ_DS32 if is_ds else PERIOD_EPS_SQ_F32

    c = rep.make_c(xx, yy, P[:8])
    z0 = rep.to_z(c)
    if julia:
        # c is constant; z starts at the pixel coordinate
        # (calc/src/lib.rs:208-212).
        if is_ds:
            c = rep.const((P[10], P[11]), (P[12], P[13]), z0)
        else:
            c = rep.const(P[10] + P[11], P[12] + P[13], z0)

    cnt0 = jnp.zeros(shape, jnp.int32)

    # The escape flag is NOT carried through the loop (Mosaic cannot carry
    # i1 vectors through scf.while): it is re-derived each step from the
    # frozen state — a lane is done iff its z froze beyond the limit or its
    # budget ran out.  z freezes at the escaped value, so dist(z) > limit²
    # is exactly "has escaped".  (Degenerate case |z₀| > limit — a viewport
    # wider than the 2¹⁶ escape radius — freezes at cnt 0 without one
    # update; the reference would take one step first.  Unreachable with
    # sane scales; documented divergence.)
    # The frozen-state distance is carried through the loop (recomputing
    # rep.dist(z) per step costs more than the one select to maintain it).
    def _active(d, cnt):
        return (d <= limit_sq) & (cnt < iterations)

    def one_step(n, state):
        z, snap, d, cnt = state
        active = _active(d, cnt)
        nz = rep.step(rule, z, c)
        nd = rep.dist(nz)
        esc_now = active & (nd > limit_sq)
        z = rep.select(active, nz, z)
        d = jnp.where(active, nd, d)
        cnt = cnt + (active & ~esc_now)
        if periodicity:
            per_now = active & ~esc_now & (rep.diff_dist(nz, snap) < eps_sq)
            cnt = jnp.where(per_now, iterations, cnt)
            # Brent schedule: snapshot at n = 1, 2, 4, 8, ... (n>=1)
            take = (n >= 1) & ((n & (n - 1)) == 0)
            snap = rep.select(jnp.broadcast_to(take & active, shape), z, snap)
        return z, snap, d, cnt

    def chunk_body(carry):
        state, k = carry
        n0 = k * chunk
        state = jax.lax.fori_loop(
            0, chunk, lambda i, s: one_step(n0 + i, s), state, unroll=unroll
        )
        return state, k + 1

    def chunk_cond(carry):
        (z, snap, d, cnt), k = carry
        return (k < n_chunks) & jnp.any(_active(d, cnt))

    snap0 = z0 if periodicity else ()
    d0 = rep.dist(z0)
    (z, snap, d, cnt), _ = jax.lax.while_loop(
        chunk_cond, chunk_body, ((z0, snap0, d0, cnt0), jnp.int32(0))
    )
    zr, zi = rep.collapse(z)
    return zr, zi, cnt


def _rep_rule(algo: str, power: int, precision: str):
    # _DS32Rep is dtype-polymorphic (ops/dd.py works on f32 and f64 words):
    # "dd64" is the same double-word scaffold over f64 pairs (~2^-106) —
    # CPU-only, since TPUs have no f64 vector path.
    is_ds = precision in ("ds32", "dd64")
    rep = _DS32Rep if is_ds else _F32Rep
    rule = (algo, power) if is_ds else get_rule(algo, power)
    return rep, rule, is_ds


def _build_kernel(algo: str, power: int, julia: bool, iterations: int,
                  precision: str, tile_h: int, tile_w: int, chunk: int,
                  periodicity: bool):
    rep, rule, is_ds = _rep_rule(algo, power, precision)

    def kernel(params_ref, zr_ref, zi_ref, cnt_ref):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        f32 = jnp.float32
        # Mosaic iota is integer-only; pixel indices < 2^24 are exact in f32.
        y0 = ti * tile_h
        x0 = tj * tile_w
        yy = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + y0).astype(f32)
        xx = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + x0).astype(f32)
        P = [params_ref[i] for i in range(16)]
        # Row interleave (multi-chip spatial DP): local row r maps to global
        # row r·stride + offset.  Integer-valued f32s < 2^24 — exact, so the
        # sharded render is bit-identical to single-device.
        yy = yy * P[14] + P[15]
        zr, zi, cnt = _iterate_tile(
            rep, rule, is_ds, julia, iterations, chunk, xx, yy, P,
            periodicity=periodicity,
        )
        zr_ref[:] = zr
        zi_ref[:] = zi
        cnt_ref[:] = cnt

    return kernel


def iterate_whole_jnp(params, *, algo: str, power: int, iterations: int,
                      precision: str, height: int, width: int,
                      chunk: int = CHUNK, periodicity: bool = False):
    """Whole-image jnp version of the kernel — identical math (same rep,
    same viewport affine), no Pallas: the CPU path for ds32 and the oracle
    for kernel tests."""
    rep, rule, is_ds = _rep_rule(algo, power, precision)
    # The CPU/XLA:LLVM backend compiles pathologically slowly (minutes for
    # tiny images) on deeply unrolled bodies — the jnp twin is a fallback/
    # test oracle, so cap the chunk and keep the inner fori rolled.  The
    # Pallas/Mosaic path keeps the swept CHUNK fully unrolled.
    chunk = min(chunk, 16)
    dt = jnp.float64 if precision == "dd64" else jnp.float32
    yy = jax.lax.broadcasted_iota(dt, (height, width), 0)
    xx = jax.lax.broadcasted_iota(dt, (height, width), 1)
    P = [params[i] for i in range(16)]
    yy = yy * P[14] + P[15]  # global-row map for sharded stripes (see kernel)
    return _iterate_tile(
        rep, rule, is_ds, algo == "julia", iterations, chunk, xx, yy, P,
        periodicity=periodicity, unroll=False,
    )


def iterate_params(
    params,
    *,
    algo: str,
    power: int,
    iterations: int,
    precision: str,
    height: int,
    width: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = CHUNK,
    interpret: bool = False,
    periodicity: bool = False,
):
    """Traceable pallas invocation: everything scene-shaped is static,
    the 14 viewport/limit/julia scalars ride in ``params`` (f32[14], built
    host-side by ``scene_params``).  Safe to call inside an outer jit.

    ``interpret=True`` routes to the whole-image jnp twin instead of the
    Pallas lowering — used on backends without Mosaic (CPU tests); the
    math is identical (same rep/viewport/loop), only the tiling differs.
    """
    if interpret:
        return iterate_whole_jnp(
            params, algo=algo, power=power, iterations=iterations,
            precision=precision, height=height, width=width, chunk=chunk,
            periodicity=periodicity,
        )
    julia = algo == "julia"
    kernel = _build_kernel(
        algo, power, julia, iterations, precision, tile_h, tile_w, chunk,
        periodicity,
    )
    grid = (_cdiv(height, tile_h), _cdiv(width, tile_w))
    out = jax.ShapeDtypeStruct((height, width), jnp.float32)
    out_cnt = jax.ShapeDtypeStruct((height, width), jnp.int32)
    block = lambda: pl.BlockSpec(
        (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    # ~14 flops/iter f32, ~120 for ds32; tells the scheduler this is
    # compute-bound despite tiny byte traffic.
    flops_per_iter = 120 if precision == "ds32" else 14
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(block(), block(), block()),
        out_shape=(out, out, out_cnt),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * iterations * height * width,
            bytes_accessed=height * width * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(params)


def scene_params(scene, height: int = None, width: int = None,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Host-side (concrete Scene) → the [16] scalar block the kernel
    consumes from SMEM.  Layout:
      [0:8]   viewport affine dd pairs (A_re, C_re, A_im, C_im)
      [8]     limit²  (escape threshold on squared distance, calc:246-251)
      [9]     spare
      [10:14] julia c as dd pairs (re_hi, re_lo, im_hi, im_lo)
      [14:16] global-row map (stride, offset): device-local row r is global
              row r·stride + offset — identity (1, 0) for single-device,
              (n_devices, device_index) for row-interleaved sharding.
    """
    ss = scene.supersample
    height = height if height is not None else scene.height * ss
    width = width if width is not None else scene.width * ss
    from fractal_tpu.config import exact_pos

    np_dt = np.float64 if dtype == jnp.float64 else np.float32
    (Ar, Cr), (Ai, Ci) = viewport_affine(width, height, exact_pos(scene),
                                         scene.scale, np_dt)
    julia = scene.algo == "julia"
    jr = dd.split_str(repr(float(scene.julia_set[0])), dtype) if julia else (0.0, 0.0)
    ji = dd.split_str(repr(float(scene.julia_set[1])), dtype) if julia else (0.0, 0.0)
    limit_sq = np_dt(float(scene.limit)) ** 2
    return jnp.asarray(
        [Ar[0], Ar[1], Cr[0], Cr[1], Ai[0], Ai[1], Ci[0], Ci[1],
         limit_sq, 0.0, jr[0], jr[1], ji[0], ji[1], 1.0, 0.0],
        dtype,
    )
