"""Binary entry point: ``python -m fractal_tpu ...`` — the reference's
main() dispatch (src/main.rs:4-23): GUI when -g, else batch render + encode.
"""

from __future__ import annotations

import sys

from fractal_tpu.cli import parse_options
from fractal_tpu.utils.timing import Phases


def main(argv=None) -> int:
    options = parse_options(argv)

    from fractal_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    if options.gui:
        from fractal_tpu.viewer import start

        start(options)
        return 0

    phases = Phases(enabled=options.profile)
    from fractal_tpu.render import render_u8
    from fractal_tpu.io import open_in_viewer, write_image

    import contextlib

    trace_cm = contextlib.nullcontext()
    if options.trace:
        import jax.profiler

        trace_cm = jax.profiler.trace(options.trace)

    with trace_cm:
        if options.bands:
            from fractal_tpu.tiled import render_tiled

            with phases.phase("render (banded)"):
                img = render_tiled(options.scene, options.bands,
                                   options.ckpt_dir,
                                   progress=print if options.profile else None)
        else:
            with phases.phase("render (device)"):
                img_dev = render_u8(options.scene, backend=options.backend)
            with phases.phase("device→host"):
                import jax
                import numpy as np

                img = np.asarray(jax.device_get(img_dev))
    with phases.phase("encode+write"):
        path = write_image(img, options.filename, options.fmt)
    phases.report()
    if options.trace:
        print(f"trace written to {options.trace}")

    if options.open:
        open_in_viewer(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
