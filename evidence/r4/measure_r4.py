import time, statistics
import jax, jax.numpy as jnp
from fractal_tpu.utils.compile_cache import enable; enable()
from fractal_tpu.config import Scene, scene_defaults
from fractal_tpu.render import render_u8

def fence(img): return float(jnp.sum(img, dtype=jnp.int32)[None][0])
def bench(scene, n=5):
    t0=time.perf_counter(); fence(render_u8(scene)); print("  cold:", round(time.perf_counter()-t0,1), "s", flush=True)
    fence(render_u8(scene.replace(exposure=scene.exposure*(1+1e-12))))
    ts=[]
    for i in range(n):
        sc = scene.replace(exposure=scene.exposure*(1+1e-9*(i+1)))
        t0=time.perf_counter(); fence(render_u8(sc)); ts.append(time.perf_counter()-t0)
    return statistics.median(ts)*1e3

head = Scene(width=3000, height=3000, iterations=4000,
             pos=(-0.7436447860, 0.1318252536), scale=(1e6,1e6),
             exposure=5.0, inside=False, precision="p32")
print("p32 headline (dist-only):", round(bench(head),2), "ms", flush=True)
fern = scene_defaults("fern").replace(width=2000, height=2000, iterations=100_000_000)
print("fern 100M (batched scatter):", round(bench(fern, 3),1), "ms", flush=True)
fern10 = scene_defaults("fern").replace(width=750, height=500, iterations=10_000_000)
print("fern 10M default:", round(bench(fern10, 3),1), "ms", flush=True)
