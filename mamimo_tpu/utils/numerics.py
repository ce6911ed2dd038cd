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


def get_complex(x, fetch_dtype=None) -> "np.ndarray":
    """Device complex array → host complex64 via float-plane transfers.

    fetch_dtype=jnp.bfloat16 halves the transfer bytes: the planes are
    quantized ON DEVICE to bf16 (−50 dB relative — the same bound as
    the bf16 LS input path, below any operating noise floor) and
    upcast back on host. Use for bulk corpus drains over slow links;
    never for noiseless (SNR=120) label fetches where −50 dB matters.
    """
    import jax
    import numpy as np

    dt = fetch_dtype or jnp.float32
    re, im = jax.jit(lambda a: (jnp.real(a).astype(dt),
                                jnp.imag(a).astype(dt)))(x)
    re = np.asarray(re).astype(np.float32)
    im = np.asarray(im).astype(np.float32)
    return (re + 1j * im).astype(np.complex64)


def fetch_tree(tree, fetch_dtype=None):
    """device_get that routes complex leaves through get_complex.

    fetch_dtype applies to COMPLEX leaves only (the corpus bulk);
    float/int leaves (SNRs, delays, flags) always transfer exact.
    """
    import jax
    import numpy as np

    def one(leaf):
        if jnp.iscomplexobj(leaf):
            return get_complex(leaf, fetch_dtype=fetch_dtype)
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
