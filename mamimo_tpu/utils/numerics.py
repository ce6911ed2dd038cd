"""Numerically careful primitives for float32/TPU.

TPUs (and XLA in general) have no fast float64; carrier-phase terms like
exp(-j·2π·d/λ) have arguments of ~1e5 rad at 28 GHz, where float32
sin/cos range reduction is both inaccurate and *implementation-dependent*
(eager vs fused XLA can differ by ~1e-2 rad). Reducing the argument to
fractional cycles with exact IEEE ops first makes the result accurate to
~1 ulp of the fractional part and bit-stable across compilation contexts
— which the per-packet seed-reproducibility contract requires
(SURVEY.md §4: the evaluator must regenerate identical channels).
"""

from __future__ import annotations

import jax.numpy as jnp


def unit_phasor(cycles):
    """exp(+j·2π·cycles) with argument reduction to [0, 1) cycles.

    `cycles` may be arbitrarily large; pass negative values for
    exp(-j·...). Returns complex64.
    """
    c = cycles - jnp.floor(cycles)
    ang = (2.0 * jnp.pi) * c
    return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(jnp.complex64)
