"""Channel coding + modulation: K=7 rate-1/3 convolutional code, soft
Viterbi decoding, QPSK/QAM mapping with approximate LLRs, and the
per-subcarrier MIMO equalizer.

Replaces the comm-toolbox objects used by the data-transmission leg:
``comm.ConvolutionalEncoder(poly2trellis(7,[133 171 165]),'Terminated')``
(generate_maMIMO_LTF.m:462-464), ``comm.ViterbiDecoder`` unquantized
(:527-529), ``qammod/qamdemod`` approx-LLR (:474,591) and
``helperMIMOEqualize`` (:582).

Viterbi on TPU: the add-compare-select recursion is a ``lax.scan`` over
time with all 64 states updated as one vectorized gather/max — no
per-state Python, and the traceback is a second (reverse) scan.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CONSTRAINT = 7
POLYS = (0o133, 0o171, 0o165)   # generator polynomials, octal
NUM_STATES = 1 << (CONSTRAINT - 1)
RATE_DEN = len(POLYS)


@lru_cache(maxsize=None)
def _trellis() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(next_state[s,b], out_bits[s,b,3], prev_state[s',i], prev_bit[s',i])

    State = the 6 most recent input bits, newest in the MSB (MATLAB
    poly2trellis convention: register = [newest ... oldest], generator
    taps from MSB of the octal polynomial).
    """
    ns = NUM_STATES
    next_state = np.zeros((ns, 2), np.int32)
    out_bits = np.zeros((ns, 2, RATE_DEN), np.int8)
    for s in range(ns):
        for b in range(2):
            reg = (b << (CONSTRAINT - 1)) | s     # 7-bit register
            for j, p in enumerate(POLYS):
                out_bits[s, b, j] = bin(reg & p).count("1") & 1
            next_state[s, b] = reg >> 1
    prev_state = np.zeros((ns, 2), np.int32)
    prev_bit = np.zeros((ns, 2), np.int8)
    cnt = np.zeros(ns, np.int32)
    for s in range(ns):
        for b in range(2):
            t = next_state[s, b]
            prev_state[t, cnt[t]] = s
            prev_bit[t, cnt[t]] = b
            cnt[t] += 1
    assert (cnt == 2).all()
    return next_state, out_bits, prev_state, prev_bit


def conv_encode(bits, terminated: bool = True):
    """Rate-1/3 K=7 convolutional encoder.

    bits: (K,) int {0,1}. Returns (3*(K+6),) coded bits when terminated
    (6 zero tail bits flush the register, 'Terminated' mode).
    """
    next_state, out_bits, _, _ = _trellis()
    bits = jnp.asarray(bits, jnp.int32)
    if terminated:
        bits = jnp.concatenate([bits, jnp.zeros(CONSTRAINT - 1, jnp.int32)])
    ns_t = jnp.asarray(next_state)
    ob_t = jnp.asarray(out_bits.astype(np.int32))

    def step(state, b):
        out = ob_t[state, b]
        return ns_t[state, b], out

    _, outs = jax.lax.scan(step, jnp.asarray(0, jnp.int32), bits)
    return outs.reshape(-1)


def viterbi_decode(llrs, num_info_bits: int, terminated: bool = True):
    """Soft-input Viterbi decoder.

    LLR convention: llr > 0 ⇒ bit 0 more likely (MATLAB qamdemod
    'approxllr'). Branch metric for coded bit c: +llr if c==0 else −llr;
    the path metric is maximized.

    Args:
      llrs: (3*T,) soft inputs (T = num_info_bits + 6 when terminated).
      num_info_bits: number of information bits to return.

    Returns:
      (num_info_bits,) hard-decided bits.
    """
    next_state, out_bits, prev_state, prev_bit = _trellis()
    llrs = jnp.asarray(llrs, jnp.float32).reshape(-1, RATE_DEN)
    T = llrs.shape[0]
    ps = jnp.asarray(prev_state)             # (S, 2)
    pb = jnp.asarray(prev_bit.astype(np.int32))
    # coded outputs attached to the transition INTO s' from predecessor i
    ob_in = out_bits[prev_state, prev_bit]   # (S, 2, 3)
    sgn_in = jnp.asarray(1.0 - 2.0 * ob_in.astype(np.float32))  # (S,2,3)

    neg = jnp.float32(-1e30)
    init_metric = jnp.full((NUM_STATES,), neg).at[0].set(0.0)

    def fwd(metric, llr_t):
        # branch metric of each incoming transition: Σ_j sgn*llr
        bm = jnp.einsum("sij,j->si", sgn_in, llr_t)       # (S, 2)
        cand = metric[ps] + bm                            # (S, 2)
        best = jnp.argmax(cand, axis=1)                   # (S,)
        new_metric = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        # normalize to avoid drift
        new_metric = new_metric - jnp.max(new_metric)
        return new_metric, best.astype(jnp.int32)

    final_metric, decisions = jax.lax.scan(fwd, init_metric, llrs)
    # traceback from state 0 (terminated) or the best final state
    end_state = jnp.asarray(0, jnp.int32) if terminated else jnp.argmax(
        final_metric
    ).astype(jnp.int32)

    def bwd(state, dec_t):
        i = dec_t[state]
        bit = pb[state, i]
        prev = ps[state, i]
        return prev, bit

    _, bits_rev = jax.lax.scan(bwd, end_state, decisions, reverse=True)
    return bits_rev[:num_info_bits]


# ----------------------------------------------------------------------
# QPSK / QAM
# ----------------------------------------------------------------------

def qpsk_constellation():
    """Unit-average-power QPSK points indexed by integer (b0<<1)|b1."""
    pts = jnp.asarray(
        [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], jnp.complex64
    ) / np.sqrt(2.0)
    return pts


def qpsk_mod(bits):
    """Gray QPSK, unit average power; bits (2K,) -> symbols (K,).

    Mapping: b0 → real sign, b1 → imag sign; sym = ((1−2b0)+j(1−2b1))/√2.
    """
    b = jnp.asarray(bits, jnp.float32).reshape(-1, 2)
    return (((1.0 - 2.0 * b[:, 0]) + 1j * (1.0 - 2.0 * b[:, 1]))
            / np.sqrt(2.0)).astype(jnp.complex64)


def qpsk_demod_llr(syms, noise_var):
    """Approximate per-bit LLRs (llr>0 ⇒ bit 0), unit-average-power QPSK.

    llr_b0 = 2√2·Re(y)/σ², llr_b1 = 2√2·Im(y)/σ²
    (max-log LLR for the Gray mapping above).
    Returns (2K,) interleaved [b0, b1] per symbol.
    """
    y = jnp.asarray(syms)
    scale = 2.0 * np.sqrt(2.0) / noise_var
    llr = jnp.stack([scale * jnp.real(y), scale * jnp.imag(y)], axis=-1)
    return llr.reshape(-1)


# ----------------------------------------------------------------------
# Generic square M-QAM (MATLAB qammod/qamdemod 'gray','UnitAveragePower')
# ----------------------------------------------------------------------

@lru_cache(maxsize=None)
def _qam_tables(m: int):
    """(constellation (m,), bit_table (m, log2(m))) gray square QAM with
    unit average power. Bit order: [I bits | Q bits], MSB first per axis."""
    k = int(np.log2(m))
    assert 2 ** k == m and k % 2 == 0, "square QAM only"
    kh = k // 2
    n_pam = 1 << kh
    # gray-coded PAM: level index -> amplitude
    lev = np.arange(n_pam)
    gray = lev ^ (lev >> 1)
    # bit 0...0 (gray level 0) maps to the most POSITIVE amplitude, the
    # same convention as qpsk_mod (llr>0 => bit 0). NOTE: MATLAB's
    # qammod integer mapping negates the I axis; symbols are never
    # exchanged with the reference, only CSI, so internal consistency
    # (and consistency with the qpsk path) wins.
    amp = (n_pam - 1) - 2 * lev
    amp_for_gray = np.zeros(n_pam)
    amp_for_gray[gray] = amp                       # gray code g -> amplitude
    scale = np.sqrt(2.0 * (n_pam**2 - 1) / 3.0)    # unit avg power
    const = np.zeros(m, np.complex64)
    bits = np.zeros((m, k), np.int8)
    for i in range(m):
        gi, gq = i >> kh, i & (n_pam - 1)
        const[i] = (amp_for_gray[gi] + 1j * amp_for_gray[gq]) / scale
        for b in range(kh):
            bits[i, b] = (gi >> (kh - 1 - b)) & 1
            bits[i, kh + b] = (gq >> (kh - 1 - b)) & 1
    return const, bits


def qam_mod(bits, m: int):
    """Gray square M-QAM, unit average power; bits (k*K,) -> (K,) symbols.
    For m=4 this equals qpsk_mod's mapping up to bit-order convention."""
    const, table = _qam_tables(m)
    k = table.shape[1]
    b = jnp.asarray(bits, jnp.int32).reshape(-1, k)
    # bits -> gray index -> symbol index
    weights = jnp.asarray(1 << np.arange(k - 1, -1, -1), jnp.int32)
    idx = jnp.sum(b * weights, axis=1)
    # table rows are indexed by (gi<<kh)|gq where gi/gq ARE the gray
    # codes spelled by the bits, so idx indexes the table directly
    return jnp.asarray(const)[idx]


def qam_demod_approx_llr(syms, m: int, noise_var):
    """Max-log approximate LLRs (MATLAB 'approxllr'): llr>0 ⇒ bit 0.

    llr_b = (min_{s: bit_b(s)=1} |y−s|² − min_{s: bit_b(s)=0} |y−s|²)/σ²
    """
    const, table = _qam_tables(m)
    y = jnp.asarray(syms).reshape(-1)
    d2 = jnp.abs(y[:, None] - jnp.asarray(const)) ** 2     # (K, m)
    t = jnp.asarray(table.astype(np.float32)).T            # (k, m)
    big = jnp.float32(1e30)
    d0 = jnp.min(d2[:, None, :] + big * t, axis=-1)        # (K, k)
    d1 = jnp.min(d2[:, None, :] + big * (1.0 - t), axis=-1)
    return ((d1 - d0) / noise_var).reshape(-1)


def mimo_equalize(rx_grid, h):
    """Per-subcarrier zero-forcing MIMO equalization + CSI weights
    (helperMIMOEqualize behaviour: equalized symbols plus per-stream
    channel-energy CSI used to scale LLRs, generate_maMIMO_LTF.m:582,595-598).

    Args:
      rx_grid: (C, nsym, Nr) received data-carrier symbols.
      h: (C, nsts, Nr) estimated channel (y = x·H per carrier).

    Returns:
      (rx_eq (C, nsym, nsts), csi (C, nsts)).
    """
    # right pseudo-inverse: x̂ = y H^H (H H^H)^{-1}
    hh = jnp.einsum("cjr,ckr->cjk", h, jnp.conj(h))      # (C, nsts, nsts)
    rhs = jnp.einsum("cnr,cjr->cnj", rx_grid, jnp.conj(h))  # (C,nsym,nsts)
    inv = jnp.linalg.inv(hh)
    rx_eq = jnp.einsum("cnj,cjk->cnk", rhs, inv)
    csi = jnp.sum(jnp.abs(h) ** 2, axis=2)               # (C, nsts)
    return rx_eq, csi


def _pilot_polarity_np(n: int, z: int = 4):
    """IEEE 802.11 pilot polarity sequence p_{z}..p_{z+n-1}.

    The 127-periodic ±1 sequence is the output of the 802.11 scrambler
    LFSR (S(x) = x⁷ + x⁴ + 1, all-ones seed) mapped 0→+1 / 1→−1 (IEEE
    802.11-2016 §17.3.5.10); data symbols start at offset z=4 per the
    VHT convention (§21.3.7.6). This is the schedule the MathWorks
    helperGenPilots family applies to the data-symbol pilots."""
    state = [1] * 7
    seq = np.empty(127, np.float32)
    for i in range(127):
        b = state[6] ^ state[3]            # x^7 + x^4 + 1 feedback (the 802.11 scrambler)
        seq[i] = 1.0 - 2.0 * b
        state = [b] + state[:6]
    return seq[(z + np.arange(n)) % 127]


def gen_pilots(nsym: int, nsts: int):
    """Multi-antenna pilot tones for the data symbols (helperGenPilots
    equivalent, generate_maMIMO_LTF.m:495-499).

    The 8 pilot carriers on the 256-point grid
    (prm.PilotCarrierIndices, generate_maMIMO_LTF.m:100) carry the
    802.11ac VHT-80MHz pilot pattern Ψ = {1,1,1,−1,−1,1,1,1} rotated by
    one tone per data symbol (Ψ[(m+n) mod 8], IEEE 802.11-2016
    §21.3.10.10) and scaled by the standard 127-periodic polarity
    sequence p_{n+4} (_pilot_polarity_np). Replicated across space-time
    streams. The receiver chain never demaps these — downstream metrics
    only observe their (unit) power — but the schedule itself is the
    derived 802.11 one, not an invention."""
    n_pilot = 8
    psi = np.asarray([1, 1, 1, -1, -1, 1, 1, 1], np.float32)
    pol = _pilot_polarity_np(nsym)                    # (nsym,)
    m = np.arange(n_pilot)[:, None]                   # pilot tone index
    n = np.arange(nsym)[None, :]                      # data symbol index
    pil = psi[(m + n) % n_pilot] * pol[None, :]       # (8, nsym)
    out = np.repeat(pil[:, :, None], nsts, axis=2)
    return jnp.asarray(out, jnp.complex64)
