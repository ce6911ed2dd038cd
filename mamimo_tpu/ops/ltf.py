"""LTF frequency sequence, orthogonal pilot-mapping matrix P and sounding
preamble generation.

Re-derives the behaviour of the out-of-repo MathWorks helpers
``helperGetP`` / ``helperGenPreamble`` from the LS despreading math in
``helperMIMOChannelEstimate.m:13-41``:

* the 256-bin LTF tone sequence is spelled out verbatim at
  ``helperMIMOChannelEstimate.m:16-23`` (802.11-style ±26-tone LTF
  replicated across the 256-bin grid, zero on nulls/DC);
* P must be a numSTS×numSTS ±1 orthogonal matrix (P Pᵀ = numSTS·I) so that
  ``hD(:,j,i) = rxsym*P(:,j)'/(nltf*ltf)`` recovers the channel — we use
  the Sylvester/Hadamard construction for power-of-two numSTS;
* on LTF symbol n, Tx stream j transmits ``ltf[k] * P[j, n]`` on every
  non-null carrier, so that despreading over the nltf symbols is exact.

The preamble is normalized to unit *total* radiated time-domain power
(per-antenna power 1/num_sts; amplitude scale
``fft/sqrt(used_sc)/sqrt(num_sts)``), matching the used-subcarrier
power-accounting convention of the data path
(``generate_maMIMO_LTF.m:500-502``). The absolute scale cancels in the
SNR-targeted noise model and in all relative metrics.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig

# helperMIMOChannelEstimate.m:16-19
_LTF_LEFT = [1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1,
             1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1]
_LTF_RIGHT = [1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, -1, -1,
              -1, 1, 1, -1, -1, 1, -1, 1, -1, 1, 1, 1, 1]


@lru_cache(maxsize=None)
def _ltf_np(fft_length: int = 256) -> np.ndarray:
    """256-bin LTF sequence on the fftshifted grid
    (helperMIMOChannelEstimate.m:20-23)."""
    assert fft_length == 256, "reference LTF sequence is defined for FFT 256"
    L, R = _LTF_LEFT, _LTF_RIGHT
    seq = (
        [0] * 7
        + L + [1] + R
        + [-1, -1, -1, 1, 1, -1, 1, -1, 1, 1, -1]
        + L + [1] + R
        + [1, -1, 1, -1]
        + [0]
        + [1, -1, -1, 1]
        + L + [1] + R
        + [-1, -1, -1, 1, 1, -1, 1, -1, 1, 1, -1]
        + L + [1] + R
        + [0] * 6
    )
    out = np.asarray(seq, np.float32)
    assert out.shape == (fft_length,)
    return out


def ltf_sequence(cfg: SimConfig) -> jnp.ndarray:
    """Full fftshifted-grid LTF sequence, shape (fft_length,)."""
    return jnp.asarray(_ltf_np(cfg.fft_length))


def ltf_data_carriers(cfg: SimConfig) -> jnp.ndarray:
    """LTF values restricted to data carriers (the ``ltf(ind)`` of
    helperMIMOChannelEstimate.m:26-29), shape (num_carriers,). ±1."""
    return jnp.asarray(
        _ltf_np(cfg.fft_length)[np.asarray(cfg.carrier_locations)]
    )


@lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    assert n >= 1 and (n & (n - 1)) == 0, "numSTS must be a power of 2"
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard(n: int) -> np.ndarray:
    """Sylvester Hadamard matrix H with H Hᵀ = n·I, entries ±1."""
    return _hadamard_np(n)


def pilot_p_matrix(num_sts: int) -> jnp.ndarray:
    """Orthogonal pilot-mapping matrix P (helperGetP equivalent).

    Row j is the ±1 signature with which Tx stream j is spread across the
    nltf = num_sts LTF symbols. The same matrix column ``P[:, iTx]`` is the
    per-link DNN conditioning input (massiveMIMO_dataGenerator.py:311).
    """
    return jnp.asarray(_hadamard_np(num_sts))


def preamble_scale(cfg: SimConfig, num_sts: int) -> float:
    """Amplitude scale giving ~unit total radiated power."""
    return cfg.fft_length / math.sqrt(cfg.used_sc) / math.sqrt(num_sts)


def gen_preamble(cfg: SimConfig, num_sts: int | None = None, v=None):
    """Generate the sounding / data preamble (helperGenPreamble equiv).

    Args:
      num_sts: number of streams to sound (defaults to cfg.num_tx — the
        generator sets ``prm.numSTS = numTx`` to sound all channels,
        generate_maMIMO_LTF.m:201).
      v: optional per-carrier baseband precoding, (num_carriers, nsts,
        nout) complex — the feedback-weights path
        (``helperGenPreamble(prm, v)``, generate_maMIMO_LTF.m:505). When
        given, each carrier's stream vector is precoded with the
        Frobenius-normalized ``v`` exactly like the data symbols
        (generate_maMIMO_LTF.m:485-492).

    Returns:
      (num_sts*(fft+cp), nout) complex64 time signal, where nout =
      num_sts without precoding, else v.shape[-1].
    """
    if num_sts is None:
        num_sts = cfg.num_tx
    ltf = _ltf_np(cfg.fft_length)
    P = _hadamard_np(num_sts)
    scale = preamble_scale(cfg, num_sts)

    if v is None:
        # static sounding preamble: pure NumPy so callers get a host
        # array (embeds as a program constant under jit; the tunneled
        # TPU backend cannot device_put complex arrays — use
        # utils.numerics.put_complex to place it explicitly)
        grid_np = (ltf[:, None, None] * P.T[None, :, :] * scale
                   ).astype(np.complex64)
        t_np = np.fft.ifft(np.fft.ifftshift(grid_np, axes=0), axis=0)
        sym_np = np.concatenate([t_np[-cfg.cp_length:], t_np], axis=0)
        sym_np = np.moveaxis(sym_np, 1, 0)
        return sym_np.reshape(
            sym_np.shape[0] * sym_np.shape[1], sym_np.shape[2]
        ).astype(np.complex64)

    # Precoded (data-phase) preamble — traced path.
    # Full-grid symbols: grid[k, n, j] = ltf[k] * P[j, n] * scale
    grid = jnp.asarray(
        ltf[:, None, None] * P.T[None, :, :] * scale, jnp.complex64
    )  # (F, nsym=num_sts, nsts=num_sts)

    v = jnp.asarray(v, jnp.complex64)  # (C, nsts, nout)
    # Unit-Frobenius normalization per carrier. NOTE: deliberately
    # *without* the sqrt(numTx) factor that the data symbols get
    # (generate_maMIMO_LTF.m:487-491) — the receiver divides the
    # equalized data symbols by sqrt(numTx) (:590), which lands them
    # back on the unit constellation only if the preamble precoder is
    # sqrt(numTx) weaker than the data precoder.
    fro = jnp.sqrt(
        jnp.sum(jnp.abs(v) ** 2, axis=(-2, -1), keepdims=True)
    )
    norm_v = v / jnp.maximum(fro, 1e-30)
    carr = np.asarray(cfg.carrier_locations, np.int32)
    full_v = jnp.zeros(
        (cfg.fft_length,) + v.shape[1:], jnp.complex64
    ).at[carr].set(norm_v)
    # grid (F, S, nsts) x v (F, nsts, nout) -> (F, S, nout)
    grid = jnp.einsum("fsj,fjo->fso", grid, full_v)

    # ifftshift + ifft + CP, same path as ofdm_modulate but from full grid
    g = jnp.fft.ifftshift(grid, axes=0)
    t = jnp.fft.ifft(g, axis=0)
    sym = jnp.concatenate([t[-cfg.cp_length :], t], axis=0)  # (F+cp, S, T)
    sym = jnp.moveaxis(sym, 1, 0)                            # (S, F+cp, T)
    return sym.reshape(sym.shape[0] * sym.shape[1], sym.shape[2]).astype(
        jnp.complex64
    )
