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
from mamimo_tpu.ops.pallas.util import _round_up
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


# ----------------------------------------------------------------------
# Flat-planes LS kernel: DFT + Kronecker block-despread, z in VMEM
# ----------------------------------------------------------------------

def ls_planes_pallas_constants(cfg: SimConfig, block_samples: int = 8,
                               dtype=None):
    """Kernel constants for ls_planes_pallas: (At_r, At_i, K) with

    * At = dft_selected_padded_np(cfg).T — (sym_len, Cp) DFT planes, CP
      drop folded in as zero rows, carriers zero-padded to a 128-lane
      multiple, LTF/nltf scaling folded in;
    * K = I_{block_samples} ⊗ P — the despread for one row-block as ONE
      block-diagonal (R, R) matmul (R = block_samples·num_tx): rows stay
      in (sample-major, symbol-minor) order, so no reshape/transpose of
      the z tile is needed inside the kernel (Mosaic rejects lane-dim
      reshapes). K is f32: the despread runs in f32 regardless of the
      DFT dot dtype (±1 entries, exact).
    """
    import numpy as np

    from mamimo_tpu.ops.estimate import dft_selected_padded_np

    at = dft_selected_padded_np(cfg).T                 # (sym_len, C)
    cp_ = _round_up(cfg.num_carriers, 128)
    atp = np.zeros((cfg.sym_len, cp_), np.complex64)
    atp[:, : cfg.num_carriers] = at
    k = np.kron(np.eye(block_samples, dtype=np.float32),
                _hadamard_np(cfg.num_tx).astype(np.float32))
    dt = dtype or jnp.float32
    # K entries are ±1/0 — exact in bf16; the despread dot follows the
    # input dtype (z is quantized at the DFT already on the bf16 path)
    return (jnp.asarray(np.real(atp), dt), jnp.asarray(np.imag(atp), dt),
            jnp.asarray(k, dt))


def _planes_kernel(xr_ref, xi_ref, ar_ref, ai_ref, k_ref,
                   hr_ref, hi_ref):
    xr = xr_ref[:]                                # (R, sym_len)
    xi = xi_ref[:]
    ar = ar_ref[:]                                # (sym_len, Cp)
    ai = ai_ref[:]
    # complex DFT-select: 4 real MXU dots, f32 accumulation; the
    # demodulated grid z lives only in VMEM/registers
    zr = (jnp.dot(xr, ar, preferred_element_type=jnp.float32)
          - jnp.dot(xi, ai, preferred_element_type=jnp.float32))
    zi = (jnp.dot(xr, ai, preferred_element_type=jnp.float32)
          + jnp.dot(xi, ar, preferred_element_type=jnp.float32))
    # block-diagonal despread: one (R, R) dot per plane in K's dtype
    # (±1/0 entries — exact in bf16; z re-quantization is below the
    # DFT's own bf16 quantization on that path)
    k = k_ref[:]
    hr_ref[:] = jnp.dot(k, zr.astype(k.dtype),
                        preferred_element_type=jnp.float32
                        ).astype(hr_ref.dtype)
    hi_ref[:] = jnp.dot(k, zi.astype(k.dtype),
                        preferred_element_type=jnp.float32
                        ).astype(hi_ref.dtype)


def ls_planes_pallas(cfg: SimConfig, planes, consts=None, *,
                     block_samples: int = 8, interpret: bool | None = None,
                     as_planes: bool = False, raw: bool = False,
                     out_dtype=None):
    """LS estimation from FLAT canonical planes, fused in one kernel.

    Identical math to ops/estimate.py::ls_estimate_planes, but the
    demodulated grid z never round-trips HBM (two 245 MB passes at
    bench batch 1024 under XLA) and the despread is a single
    block-diagonal MXU matmul instead of a batched (32×32) einsum.

    Args:
      planes: (2, S, len_ltf) float32/bfloat16, S = batch·num_rx.
      consts: optional from ls_planes_pallas_constants(cfg,
        block_samples, dtype=planes.dtype).
      as_planes: return (2, S, num_tx, C) f32 planes instead of complex.
      raw: return the kernel outputs untouched — (hr, hi) f32
        (S·num_tx [padded to the block], C padded to a 128-lane
        multiple). This is the SERVING form: complex64 cannot cross
        the host↔device boundary on this backend (transfers always go
        through plane splitting, utils/numerics.py), so the device-side
        slice + lax.complex interleave that the other forms pay
        (~3 HBM passes over ~500 MB at bench batch 1024) is pure waste
        when the consumer is a host fetch. Densify with
        ls_raw_to_complex when an on-device complex consumer needs it.

    Returns:
      (S, num_tx, num_carriers) complex64 (rx-major), planes, or the
      raw (hr, hi) pair.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, s, L = planes.shape
    nsym = cfg.num_tx
    c = cfg.num_carriers
    if consts is None:
        consts = ls_planes_pallas_constants(cfg, block_samples,
                                            dtype=planes.dtype)
    ar, ai, k = consts
    cp_ = ar.shape[1]
    r = block_samples * nsym
    assert k.shape == (r, r)

    sp = _round_up(s, block_samples)
    x = planes.reshape(2, s * nsym, cfg.sym_len)
    if sp != s:
        x = jnp.zeros((2, sp * nsym, cfg.sym_len), x.dtype
                      ).at[:, : s * nsym].set(x)
    rows = sp * nsym

    grid = (rows // r,)
    blk = lambda i: (i, 0)                        # noqa: E731
    const = lambda i: (0, 0)                      # noqa: E731
    hr, hi = pl.pallas_call(
        _planes_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, cfg.sym_len), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cfg.sym_len), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.sym_len, cp_), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.sym_len, cp_), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, r), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, cp_), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cp_), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((rows, cp_),
                                        out_dtype or jnp.float32)] * 2,
        interpret=interpret,
    )(x[0], x[1], ar, ai, k)

    if raw:
        return hr, hi
    hr = hr[: s * nsym, :c].reshape(s, nsym, c)
    hi = hi[: s * nsym, :c].reshape(s, nsym, c)
    if as_planes:
        return jnp.stack([hr, hi])
    return jax.lax.complex(hr, hi)


def ls_raw_to_complex(cfg: SimConfig, hr, hi, s: int):
    """Densify ls_planes_pallas(raw=True) output to the standard
    (S, num_tx, num_carriers) complex64 rx-major form."""
    nsym, c = cfg.num_tx, cfg.num_carriers
    hr = hr[: s * nsym, :c].reshape(s, nsym, c)
    hi = hi[: s * nsym, :c].reshape(s, nsym, c)
    return jax.lax.complex(hr, hi)
