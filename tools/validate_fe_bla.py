"""One-shot hardware validation of the per-tile BLA fe kernel.

Run from the repo root on a live TPU: ``timeout 1800 python tools/validate_fe_bla.py``.
If all four equality lines print True and the BLA-kernel warm time beats
the BLA twin, flip the FRACTAL_TPU_FE_BLA_KERNEL default
(perturb.py::_fe_bla_kernel_on) and record the numbers in PERF.md.

Runs on the real TPU: builds the minibrot 1e40 view once, then times
(a) the BLA twin (current default), (b) the plain fe kernel, and
(c) the per-tile BLA kernel — cold compile + warm p50 — and checks
cnt/gl bit-equality of (c) against (a)'s plain-oracle contract.
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
from tests.test_bla import MINIBROT_1E40_X, MINIBROT_1E40_Y

W, H, ITERS = 512, 384, 4000
sc = Scene(width=W, height=H, iterations=ITERS,
           pos_str=(MINIBROT_1E40_X, MINIBROT_1E40_Y),
           scale=(1e40, 1e40), inside=False)
print("backend", jax.default_backend(), flush=True)
t0 = time.time()
ref, orbit = pt.resolve_reference(sc, W, H)
print(f"walk {time.time()-t0:.2f}s n_steps={orbit.n_steps}", flush=True)
P = pt._pert_params_fe(sc, ref, W, H)
ns = jnp.int32(orbit.n_steps)
packed = jnp.asarray(orbit.packed)
bla_packed, bla_offsets = pt._bla_dev_for(sc, orbit, ref, W, H, fe=True)
planes = pt.orbit_planes(orbit)
assert pt._fe_bla_useful(sc, orbit, ref, W, H)


def fence(out):
    return float(jnp.sum(out[2], dtype=jnp.int32))


def timeit(label, fn):
    t0 = time.time()
    out = fn()
    fence(out)
    cold = time.time() - t0
    ts = []
    for _ in range(3):
        t = time.time()
        fence(fn())
        ts.append(time.time() - t)
    print(f"{label}: cold {cold:.1f}s warm {min(ts)*1000:.1f} ms",
          flush=True)
    return out


twin_bla = timeit("BLA twin      ", lambda: pt.perturb_whole_jnp(
    packed, P, ns, iterations=ITERS, height=H, width=W,
    chunk=pt.PERT_CHUNK, extreme=True, bla_packed=bla_packed,
    bla_offsets=bla_offsets))
plain_k = timeit("fe kernel     ", lambda: pt.perturb_pallas_fe(
    planes, P, ns, iterations=ITERS, height=H, width=W, julia=False,
    glitch=True))
bla_k = timeit("fe BLA kernel ", lambda: pt.perturb_pallas_fe_bla(
    planes, P, ns, bla_packed, bla_offsets=bla_offsets,
    iterations=ITERS, height=H, width=W, julia=False, glitch=True))

for name, a, b in (("cnt twin-bla==plain-kernel", twin_bla[2], plain_k[2]),
                   ("gl  twin-bla==plain-kernel", twin_bla[3], plain_k[3]),
                   ("cnt bla-kernel==plain     ", bla_k[2], plain_k[2]),
                   ("gl  bla-kernel==plain     ", bla_k[3], plain_k[3])):
    print(name, bool(jnp.array_equal(a, b)), flush=True)
print("cnt uniq:", len(np.unique(np.asarray(plain_k[2]))), flush=True)
