"""OFDM modulation / demodulation with MATLAB ``ofdmmod``/``ofdmdemod``
semantics (as used at ``generate_maMIMO_LTF.m:336,498``).

Grid convention: a full fft-length grid laid out *fftshifted* — grid
position ``fft/2`` is DC; position p carries signed DFT bin ``p - fft/2``.
Modulation is ``ifft(ifftshift(grid))`` with MATLAB's 1/N ifft
normalization, plus a cyclic prefix; demodulation is the exact inverse
(slice the CP off with ``sym_offset = cp_length``, plain ``fft``,
``fftshift``), so ``demod(mod(x)) == x``.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig


def build_grid(cfg: SimConfig, data, pilots=None):
    """Scatter data (and optional pilot) carriers into a full fftshifted grid.

    Args:
      data:   (..., num_carriers, nsym, nsts) complex
      pilots: (..., num_pilots, nsym, nsts) complex, or None (zeros)

    Returns:
      (..., fft_length, nsym, nsts) complex grid.
    """
    data = jnp.asarray(data)
    nsym, nsts = data.shape[-2], data.shape[-1]
    batch = data.shape[:-3]
    grid = jnp.zeros(batch + (cfg.fft_length, nsym, nsts), data.dtype)
    carr = np.asarray(cfg.carrier_locations, np.int32)
    grid = grid.at[..., carr, :, :].set(data)
    if pilots is not None:
        pil = np.asarray(cfg.pilot_indices, np.int32)
        grid = grid.at[..., pil, :, :].set(pilots)
    return grid


def ofdm_modulate(cfg: SimConfig, data, pilots=None):
    """OFDM-modulate a data grid into time samples.

    Mirrors MATLAB ``ofdmmod(data, fft, cp, nullIdx, pilotIdx, pilots)``:
    ifft (1/N normalized) over the ifftshifted grid + CP prepend.

    Args:
      data:   (..., num_carriers, nsym, nsts)
      pilots: optional (..., num_pilots, nsym, nsts)

    Returns:
      (..., nsym * (fft+cp), nsts) complex time signal.
    """
    grid = build_grid(cfg, data, pilots)                     # (..., F, S, T)
    grid = jnp.fft.ifftshift(grid, axes=-3)
    t = jnp.fft.ifft(grid, axis=-3)                          # (..., F, S, T)
    cp = t[..., -cfg.cp_length :, :, :]
    sym = jnp.concatenate([cp, t], axis=-3)                  # (..., F+cp, S, T)
    # time-major: symbols concatenated along time
    sym = jnp.moveaxis(sym, -2, -3)                          # (..., S, F+cp, T)
    out_shape = sym.shape[:-3] + (sym.shape[-3] * sym.shape[-2], sym.shape[-1])
    return sym.reshape(out_shape)


def ofdm_demodulate(cfg: SimConfig, sig, nsym: int | None = None):
    """OFDM-demodulate time samples back into data + pilot grids.

    Mirrors MATLAB ``ofdmdemod(sig, fft, cp, symOffset=cp, nullIdx,
    pilotIdx)``: per symbol take samples [cp : cp+fft], fft, fftshift,
    split into data and pilot carriers.

    Args:
      sig:  (..., nsamp, nrx) with nsamp = nsym * (fft+cp)
      nsym: number of OFDM symbols (inferred if None)

    Returns:
      (data, pilots): (..., num_carriers, nsym, nrx) and
                      (..., num_pilots, nsym, nrx)
    """
    sig = jnp.asarray(sig)
    sym_len = cfg.sym_len
    if nsym is None:
        nsym = sig.shape[-2] // sym_len
    nrx = sig.shape[-1]
    batch = sig.shape[:-2]
    x = sig[..., : nsym * sym_len, :].reshape(batch + (nsym, sym_len, nrx))
    x = x[..., cfg.cp_length :, :]                           # CP removal
    X = jnp.fft.fft(x, axis=-2)
    X = jnp.fft.fftshift(X, axes=-2)                         # (..., S, F, R)
    X = jnp.moveaxis(X, -3, -2)                              # (..., F, S, R)
    carr = np.asarray(cfg.carrier_locations, np.int32)
    pil = np.asarray(cfg.pilot_indices, np.int32)
    return X[..., carr, :, :], X[..., pil, :, :]
