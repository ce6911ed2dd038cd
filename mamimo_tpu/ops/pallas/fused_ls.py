"""Fused OFDM-demod + LS-despread kernel (Pallas, TPU).

The analytic estimation hot path (generate_maMIMO_LTF.m:336-342) is
mathematically two complex matmuls per (packet, rx-antenna):

    est[c, j] = (1/(nltf·ltf[c])) Σ_t Σ_n  D[c, t] · x[n, t] · P[j, n]

where D is the 234-row DFT matrix restricted to the used data carriers
(fftshifted bin selection folded in — the FFT of a 256-sample symbol is
just a matmul on the MXU at this size) and x[n, t] is LTF symbol n with
its cyclic prefix dropped. This kernel fuses CP-handling, "FFT",
carrier selection, LTF normalization and P-despread into a single
VMEM-resident program per block of (packet, rx) pairs — no HBM
round-trips for the demodulated grid.

Complex arithmetic is expanded into 4 real matmuls per stage (TPU MXU
has no complex dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamimo_tpu.config import SimConfig
from mamimo_tpu.ops.ltf import _hadamard_np


def _dft_selected(cfg: SimConfig):
    """Scaled selected-DFT matrix — single source of truth lives in
    ops/estimate.py (shared with the matmul-form LS estimator)."""
    from mamimo_tpu.ops.estimate import dft_selected_np

    return dft_selected_np(cfg)


def _kernel(xr_ref, xi_ref, p_ref, ar_ref, ai_ref, or_ref, oi_ref,
            *, nsym: int, g: int, nfft: int):
    # x: (g, nsym, nfft) real/imag planes (CP already dropped outside —
    # a lane-dim slice at a non-tile-aligned offset is hostile to
    # Mosaic, as are reshapes merging the lane dim: the per-pair work is
    # a static loop of pure 2D matmuls/transposes instead).
    p = p_ref[:]                                 # (nsym, nsym) ±1
    ar = ar_ref[:]                               # (C, nfft)
    ai = ai_ref[:]
    for gi in range(g):
        xr = xr_ref[gi]                          # (nsym, nfft)
        xi = xi_ref[gi]
        # despread over symbols: Y[j, t] = Σ_n P[j, n]·x[n, t]
        yr = jnp.dot(p, xr, preferred_element_type=jnp.float32)
        yi = jnp.dot(p, xi, preferred_element_type=jnp.float32)
        # DFT-select over t: est[c, j] = Σ_t A[c, t]·Y[j, t]
        zr = yr.T                                # (nfft, nsym)
        zi = yi.T
        er = (jnp.dot(ar, zr, preferred_element_type=jnp.float32)
              - jnp.dot(ai, zi, preferred_element_type=jnp.float32))
        ei = (jnp.dot(ar, zi, preferred_element_type=jnp.float32)
              + jnp.dot(ai, zr, preferred_element_type=jnp.float32))
        or_ref[gi] = er                          # (C, nsym)
        oi_ref[gi] = ei


def ls_estimate_pallas(
    cfg: SimConfig,
    rx,
    *,
    pairs_per_block: int = 8,
    interpret: bool | None = None,
):
    """LS channel estimation from raw preambles, fused.

    Args:
      rx: (B, len_ltf, num_rx) complex64 received preambles.

    Returns:
      (B, num_carriers, num_tx, num_rx) complex64 — identical (to fp
      tolerance) to estimate_from_rx(cfg, rx)[0].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, _, nrx = rx.shape
    nsym = cfg.num_tx
    g = pairs_per_block
    npairs = b * nrx
    npad = ((npairs + g - 1) // g) * g

    # (pairs, nsym, nfft) planes (CP dropped), pair index = b*nrx + r
    x = jnp.transpose(rx, (0, 2, 1)).reshape(npairs, nsym, cfg.sym_len)
    x = x[:, :, cfg.cp_length:]
    xr = jnp.zeros((npad, nsym, cfg.fft_length), jnp.float32
                   ).at[:npairs].set(jnp.real(x))
    xi = jnp.zeros((npad, nsym, cfg.fft_length), jnp.float32
                   ).at[:npairs].set(jnp.imag(x))

    a = _dft_selected(cfg)
    ar = jnp.asarray(np.real(a))
    ai = jnp.asarray(np.imag(a))
    p = jnp.asarray(_hadamard_np(nsym))
    c = cfg.num_carriers

    kern = functools.partial(_kernel, nsym=nsym, g=g, nfft=cfg.fft_length)
    grid = (npad // g,)
    out_shape = [jax.ShapeDtypeStruct((npad, c, nsym), jnp.float32)] * 2
    or_, oi_ = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, nsym, cfg.fft_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nsym, cfg.fft_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsym, nsym), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cfg.fft_length), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cfg.fft_length), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, c, nsym), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, c, nsym), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(xr, xi, p, ar, ai)

    est = (or_[:npairs] + 1j * oi_[:npairs]).astype(jnp.complex64)
    # (pairs, C, nsym) -> (B, C, num_tx, num_rx)
    est = est.reshape(b, nrx, c, nsym)
    return jnp.transpose(est, (0, 2, 3, 1))
