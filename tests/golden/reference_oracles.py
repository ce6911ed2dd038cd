"""Float64 NumPy oracles pinning the REFERENCE implementation's exact
semantics (VERDICT r1 #5): independent re-derivations of

* the LS despread           — helperMIMOChannelEstimate.m:24-41
* the LMMSE smoother        — LMMSE_ce.m:23-39 (general Nfft/Np/Nps form)
* the OMP greedy loop       — ompdecomp.m:105-116
* the receiver power math   — generate_maMIMO_LTF.m:239-303

These are handwritten from the algorithms' published math (Cho et al.
2010 for LMMSE, El Ayach et al. 2014 for OMP, the 802.11 L-LTF tone
plan for the pilot grid), evaluated in float64 on pinned inputs and
committed as ``reference_semantics.npz`` — converting "within 0.5 dB of
curves we generated ourselves" into a checkable fidelity contract: the
float32 JAX paths must match these float64 values to float32 tolerance.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------
# 802.11 L-LTF frequency-domain tone plan on the 256-bin grid — the
# published constant the reference spells at
# helperMIMOChannelEstimate.m:16-23 (interop constant, required verbatim)
# ----------------------------------------------------------------------

_LTF_LEFT = np.array([1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1,
                      1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1],
                     np.float64)
_LTF_RIGHT = np.array([1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, -1, -1,
                       -1, 1, 1, -1, -1, 1, -1, 1, -1, 1, 1, 1, 1],
                      np.float64)


def ltf_tones_256() -> np.ndarray:
    """The 256-bin LTF tone sequence (dc-in-middle, fftshifted grid)."""
    seg_a = np.array([-1, -1, -1, 1, 1, -1, 1, -1, 1, 1, -1], np.float64)
    seg_b = np.array([1, -1, 1, -1, 0, 1, -1, -1, 1], np.float64)
    return np.concatenate([
        np.zeros(7), _LTF_LEFT, [1], _LTF_RIGHT, seg_a,
        _LTF_LEFT, [1], _LTF_RIGHT, seg_b,
        _LTF_LEFT, [1], _LTF_RIGHT, seg_a,
        _LTF_LEFT, [1], _LTF_RIGHT, np.zeros(6),
    ])


def hadamard(n: int) -> np.ndarray:
    """Sylvester-construction Hadamard pilot-mapping matrix P
    (helperGetP semantics: orthogonal ±1 over the nltf repetitions)."""
    assert n & (n - 1) == 0
    h = np.ones((1, 1), np.float64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def ls_oracle(rx_grid: np.ndarray, num_sts: int,
              carrier_locations: np.ndarray) -> np.ndarray:
    """``hD(:,j,i) = rxsym * Puse(:,j) ./ (nltf .* ltf(ind))``
    (helperMIMOChannelEstimate.m:24-41), float64.

    Args:
      rx_grid: (C, nltf, numRx) demodulated data-carrier grid.
      carrier_locations: (C,) 1-based MATLAB indices into the 256 grid.

    Returns:
      (C, num_sts, numRx) complex128.
    """
    c, nltf, num_rx = rx_grid.shape
    P = hadamard(num_sts)
    puse = P[:num_sts, :num_sts].conj().T            # P is real: == P.T
    ltf = ltf_tones_256()[np.asarray(carrier_locations) - 1]
    denom = nltf * ltf                               # (C,)
    hd = np.zeros((c, num_sts, num_rx), np.complex128)
    for i in range(num_rx):
        rxsym = rx_grid[:, :nltf, i]
        for j in range(num_sts):
            hd[:, j, i] = rxsym @ puse[:, j] / denom
    return hd


def lmmse_oracle(h_tilde: np.ndarray, nfft: int, n_p: int, nps: int,
                 h: np.ndarray, snr_db: float) -> np.ndarray:
    """LMMSE_ce.m:23-39 — frequency-correlation LMMSE (Cho, Kim, Yang &
    Kang 2010), GENERAL (Nfft, Np, Nps) form, float64.

    Including the reference's quirk: ``h`` is whatever the caller passes
    as the "impulse response" — in the pipeline that is the vector of
    scatterer path DELAYS (generate_maMIMO_LTF.m:210,342).

    Args:
      h_tilde: (Np,) LS estimate at the pilot positions.
      h: (n,) "impulse response" vector (the τ delays in practice).

    Returns:
      (Nfft,) complex128 smoothed estimate.
    """
    snr = 10.0 ** (snr_db * 0.1)
    h = np.asarray(h, np.complex128)
    k = np.arange(h.size, dtype=np.float64)
    hh = np.real(h @ h.conj())                       # h*h' (scalar)
    tmp = (h * h.conj()).real * k
    r = tmp.sum() / hh
    r2 = (tmp @ k) / hh
    tau_rms = np.sqrt(r2 - r * r)
    df = 1.0 / nfft
    j2pi = 1j * 2.0 * np.pi * tau_rms * df
    k1 = np.arange(nfft)[:, None]
    k2 = np.arange(n_p)[None, :]
    rhp = 1.0 / (1.0 + j2pi * (k1 - k2 * nps))       # (Nfft, Np)
    k3 = np.arange(n_p)[:, None]
    k4 = np.arange(n_p)[None, :]
    rpp = 1.0 / (1.0 + j2pi * nps * (k3 - k4)) + np.eye(n_p) / snr
    return rhp @ np.linalg.solve(rpp, np.asarray(h_tilde, np.complex128))


def omp_decomp_oracle(wopt: np.ndarray, adict: np.ndarray,
                      nsparsity: int, w: np.ndarray | None = None):
    """ompdecomp.m:105-116 — greedy OMP with weighted-LS refit, float64.

    Returns (coeff (S, Nw) padded with zeros past the stop step,
    atoms (N, S), atom_idx (S,), err_norm).
    """
    wopt = np.asarray(wopt, np.complex128)
    n, nw = wopt.shape
    W = np.eye(n, dtype=np.complex128) if w is None else np.asarray(
        w, np.complex128)
    atoms = np.zeros((n, nsparsity), np.complex128)
    coeff = np.zeros((nsparsity, nw), np.complex128)
    idx = np.zeros(nsparsity, np.int64)
    res = wopt.copy()
    err = 1.0
    m = 0
    eps = np.finfo(np.float64).eps
    while m < nsparsity and err > eps:
        psi = adict.conj().T @ W @ res               # (Na, Nw)
        k = int(np.argmax(np.sum(np.abs(psi) ** 2, axis=1)))
        idx[m] = k
        atoms[:, m] = adict[:, k]
        am = atoms[:, : m + 1]
        coeff[: m + 1] = np.linalg.solve(
            am.conj().T @ W @ am, am.conj().T @ W @ wopt)
        temp = wopt - am @ coeff[: m + 1]
        err = np.linalg.norm(temp, "fro")
        res = temp / err
        m += 1
    return coeff, atoms, idx, err


def receiver_oracle(rx_sig: np.ndarray, snr_db: float, gain_db: float,
                    used_sc: int, fft_length: int, num_pad_zeros: int,
                    chan_delay: int):
    """The useNoiseFig=false receiver bookkeeping of
    generate_maMIMO_LTF.m:239-332, float64, with the noise realization
    EXCLUDED (deterministic contract):

      sig_dB   = pow2db(rms(x)²)          per antenna      (:240-242)
      noise_dB = mean(sig_dB − SNR + G)                     (:243-244)
      snr_CS   = sig_dB − noise_dB + G    per antenna       (:263)
      y        = 10^(G/20)·x  (noise-free preamp output)    (:252-295)
      y       *= sqrt(used_sc)/FFT                          (:303)
      sync     = y[chanDelay : end−(pad−chanDelay)]         (:326-327)

    Returns (y_sync (nsamp−pad, R) complex128, snr_cs (R,), noise_db ()).
    """
    x = np.asarray(rx_sig, np.complex128)
    sig_pwr = np.mean(np.abs(x) ** 2, axis=0)
    sig_db = 10.0 * np.log10(sig_pwr)
    noise_db = float(np.mean(sig_db - snr_db + gain_db))
    snr_cs = sig_db - noise_db + gain_db
    y = 10.0 ** (gain_db / 20.0) * x
    y = y * (np.sqrt(used_sc) / fft_length)
    n = x.shape[0]
    y_sync = y[chan_delay: n - (num_pad_zeros - chan_delay)]
    return y_sync, snr_cs, noise_db
