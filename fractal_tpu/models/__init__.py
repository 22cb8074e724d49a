"""Fractal model families.

* ``rules``  — escape-time iteration rules (Mandelbrot/Julia z²+c,
  Multibrot z^d+c, Burning Ship, Tricorn): the generic-rule kernel family.
* ``fern``   — the Barnsley fern chaos game (IFS).
"""

from fractal_tpu.models.rules import get_rule, RULES

__all__ = ["get_rule", "RULES"]
