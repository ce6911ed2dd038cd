"""OMP decomposition, conv-code/Viterbi, QPSK and equalizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.ops.coding import (
    conv_encode,
    gen_pilots,
    mimo_equalize,
    qpsk_constellation,
    qpsk_demod_llr,
    qpsk_mod,
    viterbi_decode,
)
from mamimo_tpu.ops.omp import omp_decomp, omp_hyb_weights


def _np_omp(wopt, adict, smax):
    """NumPy transcription of ompdecomp.m's greedy loop."""
    res = wopt.copy()
    atoms = []
    idxs = []
    for m in range(smax):
        psi = adict.conj().T @ res
        k = int(np.argmax(np.sum(np.abs(psi) ** 2, axis=1)))
        idxs.append(k)
        atoms.append(adict[:, k])
        A = np.stack(atoms, axis=1)
        coeff = np.linalg.lstsq(A, wopt, rcond=None)[0]
        temp = wopt - A @ coeff
        err = np.linalg.norm(temp)
        if err <= np.finfo(np.float32).eps:
            break
        res = temp / err
    return coeff, A, np.asarray(idxs)


def test_omp_matches_numpy():
    rng = np.random.default_rng(0)
    n, na, nw, smax = 16, 40, 2, 3
    adict = (rng.standard_normal((n, na)) + 1j * rng.standard_normal((n, na))
             ).astype(np.complex64)
    adict /= np.linalg.norm(adict, axis=0, keepdims=True)
    wopt = (rng.standard_normal((n, nw)) + 1j * rng.standard_normal((n, nw))
            ).astype(np.complex64)
    out = omp_decomp(jnp.asarray(wopt), jnp.asarray(adict), smax)
    c_ref, a_ref, i_ref = _np_omp(wopt.astype(np.complex128),
                                  adict.astype(np.complex128), smax)
    np.testing.assert_array_equal(np.asarray(out.atom_idx), i_ref)
    np.testing.assert_allclose(np.asarray(out.coeff), c_ref, atol=1e-3)


def test_omp_exact_recovery():
    """A target that IS a dictionary atom converges in one step."""
    rng = np.random.default_rng(1)
    adict = (rng.standard_normal((8, 10)) + 1j * rng.standard_normal((8, 10))
             ).astype(np.complex64)
    wopt = adict[:, 3:4] * (2.0 + 1j)
    out = omp_decomp(jnp.asarray(wopt), jnp.asarray(adict), 3)
    assert int(out.atom_idx[0]) == 3
    assert float(out.err_norm) < 1e-4
    recon = np.asarray(out.atoms) @ np.asarray(out.coeff)
    np.testing.assert_allclose(recon, np.asarray(wopt), atol=1e-4)


def test_omp_hyb_weights_beamforms():
    """With a rank-1 channel h = a t^H, the hybrid precoder should align
    with t and capture most of the optimal beamforming gain."""
    rng = np.random.default_rng(2)
    nt, nr, L, nrays = 16, 4, 8, 100
    # dictionary of unit-modulus steering-like vectors, include the truth
    adict = np.exp(1j * rng.uniform(0, 2 * np.pi, (nt, nrays))
                   ).astype(np.complex64)
    t = adict[:, 17]
    a = (rng.standard_normal(nr) + 1j * rng.standard_normal(nr)).astype(
        np.complex64
    )
    h = np.broadcast_to(np.conj(t)[:, None] * a[None, :], (L, nt, nr)
                        ).astype(np.complex64)
    fbb, frf = omp_hyb_weights(jnp.asarray(h), 1, 1, jnp.asarray(adict))
    assert fbb.shape == (L, 1, 1) and frf.shape == (L, 1, nt)
    # effective gain of the hybrid precoder vs optimal
    f = np.asarray(fbb)[0, 0, 0] * np.asarray(frf)[0, 0]     # (nt,)
    g = np.linalg.norm(f @ h[0])
    g_opt = np.linalg.norm(h[0], ord=2) * np.linalg.norm(f)
    assert g / g_opt > 0.95


def test_conv_viterbi_roundtrip_clean():
    rng = np.random.default_rng(3)
    k = 200
    bits = rng.integers(0, 2, k)
    coded = np.asarray(conv_encode(jnp.asarray(bits)))
    assert coded.shape == (3 * (k + 6),)
    # clean LLRs: +1 for bit 0, −1 for bit 1
    llr = 1.0 - 2.0 * coded.astype(np.float32)
    dec = np.asarray(viterbi_decode(jnp.asarray(llr), k))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_corrects_errors():
    rng = np.random.default_rng(4)
    k = 300
    bits = rng.integers(0, 2, k)
    coded = np.asarray(conv_encode(jnp.asarray(bits))).astype(np.float32)
    llr = 1.0 - 2.0 * coded
    llr += 0.8 * rng.standard_normal(llr.shape)   # heavy soft noise
    flip = rng.random(llr.shape) < 0.05           # plus hard flips
    llr = np.where(flip, -llr, llr)
    dec = np.asarray(viterbi_decode(jnp.asarray(llr), k))
    ber = np.mean(dec != bits)
    assert ber < 0.02, ber


def test_qpsk_roundtrip():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 400)
    syms = np.asarray(qpsk_mod(jnp.asarray(bits)))
    np.testing.assert_allclose(np.mean(np.abs(syms) ** 2), 1.0, rtol=1e-5)
    llr = np.asarray(qpsk_demod_llr(jnp.asarray(syms), 0.1))
    hard = (llr < 0).astype(int)
    np.testing.assert_array_equal(hard, bits)
    # constellation covers all symbols
    c = np.asarray(qpsk_constellation())
    d = np.min(np.abs(syms[:, None] - c[None, :]), axis=1)
    assert np.max(d) < 1e-6


def test_mimo_equalize_recovers():
    rng = np.random.default_rng(6)
    C, nsym, nsts, nr = 16, 5, 2, 4
    h = (rng.standard_normal((C, nsts, nr)) +
         1j * rng.standard_normal((C, nsts, nr))).astype(np.complex64)
    x = (rng.standard_normal((C, nsym, nsts)) +
         1j * rng.standard_normal((C, nsym, nsts))).astype(np.complex64)
    y = np.einsum("cnj,cjr->cnr", x, h)
    xeq, csi = mimo_equalize(jnp.asarray(y), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(xeq), x, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(csi), np.sum(np.abs(h) ** 2, axis=2), rtol=1e-5
    )


def test_gen_pilots_shape():
    p = np.asarray(gen_pilots(10, 2))
    assert p.shape == (8, 10, 2)
    assert np.all(np.abs(p) == 1)


def test_pilot_polarity_is_80211_sequence():
    """The LFSR-derived polarity must match the published 802.11
    p_0..p_126 sequence head (IEEE 802.11-2016 Eq. 17-25)."""
    from mamimo_tpu.ops.coding import _pilot_polarity_np

    head = np.asarray(
        [1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1, 1, 1, -1, 1,
         -1, -1, 1, 1, -1, 1, 1, -1, 1, 1, 1, 1, 1, 1, -1, 1],
        np.float32,
    )
    got = _pilot_polarity_np(32, z=0)
    np.testing.assert_array_equal(got, head)
    # period 127
    full = _pilot_polarity_np(254, z=0)
    np.testing.assert_array_equal(full[:127], full[127:])
    # default offset: data symbols start at p_4 (VHT convention)
    np.testing.assert_array_equal(_pilot_polarity_np(3), head[4:7])


def test_gen_pilots_rotation_and_polarity():
    """Ψ rotates one tone per symbol; every symbol's column is ±Ψ."""
    psi = np.asarray([1, 1, 1, -1, -1, 1, 1, 1], np.float32)
    p = np.asarray(gen_pilots(6, 1)).real[:, :, 0]     # (8, nsym)
    from mamimo_tpu.ops.coding import _pilot_polarity_np

    pol = _pilot_polarity_np(6)
    for n in range(6):
        np.testing.assert_array_equal(p[:, n], np.roll(psi, -n) * pol[n])
