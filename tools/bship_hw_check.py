"""Burning-ship kernel-vs-twin bit-parity on real hardware.

The r4 FMA-contraction pin (ops/perturb.py, VERDICT r3 #5) is IEEE-exact —
it multiplies by a traced 1.0 before every mul-feeding-an-add in the
diffabs branch, which is a no-op on values but blocks XLA:CPU's FMA
contraction.  On TPU the values were already uncontracted, so this run
must show the v2 Pallas kernel bit-equal to the XLA twin, and both twins
chunk-stable (chunk 4 == chunk 16), same as the CPU test
(tests/test_perturb.py::test_pallas_v2_kernel_burningship_bit_parity).

Run from the repo root on a live TPU:
    timeout 1800 python tools/bship_hw_check.py
Reference semantics: the |re|,|im| fold at
/root/reference/calc/src/lib.rs:150-179.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from fractal_tpu.utils.compile_cache import enable

enable()
from fractal_tpu.config import Scene
from fractal_tpu.ops import perturb as pt


def kernel_vs_twin(sc, chunk):
    w, h = sc.width, sc.height
    ref, orbit = pt.resolve_reference(sc, w, h)
    P = pt._pert_params(sc, ref, w, h, orbit=orbit)
    ns = jnp.int32(orbit.n_steps)
    pw = pt.eff_power(sc.algo, sc.power)
    twin = pt.perturb_whole_jnp(
        jnp.asarray(orbit.packed), P, ns, iterations=sc.iterations,
        height=h, width=w, chunk=chunk, power=pw, algo=sc.algo)
    kern = pt.perturb_pallas_v2(
        pt.orbit_planes(orbit), P, ns, iterations=sc.iterations,
        height=h, width=w, julia=False, glitch=True,
        interpret=False, chunk=chunk, power=pw, algo=sc.algo)
    return ([np.asarray(a) for a in twin], [np.asarray(a) for a in kern])


def main():
    print("backend", jax.default_backend(), flush=True)
    ok = True
    for sc in (
        Scene(algo="burningship", width=64, height=48, iterations=300,
              pos=(-2.0, 0.0), scale=(1e16, 1e16), precision="perturb"),
        Scene(algo="burningship", width=64, height=48, iterations=1500,
              pos_str=("-0.45", "-0.829977217668251374661143257379"),
              scale=(1e14, 1e14), precision="perturb"),
    ):
        t0 = time.time()
        twin16, kern16 = kernel_vs_twin(sc, chunk=16)
        twin4, kern4 = kernel_vs_twin(sc, chunk=4)
        names = ("zr", "zi", "cnt", "gl")
        for label, a, b in (("kernel==twin c16", twin16, kern16),
                            ("kernel==twin c4", twin4, kern4),
                            ("twin c4==c16", twin4, twin16),
                            ("kernel c4==c16", kern4, kern16)):
            eq = all(np.array_equal(x, y) for x, y in zip(a, b))
            # counts are the contract; final-z may differ by ulps from FMA
            # contraction on some views (see round3 notes) — report both
            cnt_eq = all(np.array_equal(a[i], b[i]) for i in (2, 3))
            print(f"  {sc.scale[0]:.0e} {label}: full={eq} cnt/gl={cnt_eq}",
                  flush=True)
            ok &= cnt_eq
        print(f"  view done in {time.time()-t0:.1f}s", flush=True)
    print("RESULT", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
