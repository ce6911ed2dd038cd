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


def put_complex(x):
    """Host complex array → device complex64 WITHOUT a complex transfer.

    The tunneled TPU backend cannot device_put complex arrays (and eager
    ``1j * x`` implicitly puts a complex constant). Transfer the two
    float32 planes and combine on device inside jit.
    """
    import jax
    import numpy as np

    xr = jnp.asarray(np.ascontiguousarray(np.real(x)), jnp.float32)
    xi = jnp.asarray(np.ascontiguousarray(np.imag(x)), jnp.float32)
    return jax.jit(jax.lax.complex)(xr, xi)


def get_complex(x) -> "np.ndarray":
    """Device complex array → host complex64 via float-plane transfers."""
    import jax
    import numpy as np

    re, im = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))(x)
    return (np.asarray(re) + 1j * np.asarray(im)).astype(np.complex64)


def fetch_tree(tree):
    """device_get that routes complex leaves through get_complex."""
    import jax
    import numpy as np

    def one(leaf):
        if jnp.iscomplexobj(leaf):
            return get_complex(leaf)
        return np.asarray(leaf)

    return jax.tree.map(one, tree)


def unit_phasor(cycles):
    """exp(+j·2π·cycles) with argument reduction to [0, 1) cycles.

    `cycles` may be arbitrarily large; pass negative values for
    exp(-j·...). Returns complex64.
    """
    c = cycles - jnp.floor(cycles)
    ang = (2.0 * jnp.pi) * c
    return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(jnp.complex64)
