"""Channel estimators: per-subcarrier LS and frequency-correlation LMMSE.

TPU-native reformulation of ``helperMIMOChannelEstimate.m:24-41`` and
``LMMSE_ce.m:23-39``: the LS despread is a single einsum over the LTF
symbols (MXU-friendly), LMMSE is a batched 234×234 linear solve shared
across Tx streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig
from mamimo_tpu.ops.ltf import ltf_data_carriers, pilot_p_matrix


def ls_estimate(cfg: SimConfig, rx_grid, num_sts: int | None = None):
    """Least-squares MIMO channel estimate from the demodulated preamble.

    ``hD(:,j,i) = rxsym * conj(P(j,:))' ./ (nltf * ltf(ind))``
    (helperMIMOChannelEstimate.m:24-41).

    Args:
      rx_grid: (..., num_carriers, nsym>=num_sts, num_rx) demodulated
        data-carrier grid.
      num_sts: number of sounded streams (defaults cfg.num_tx).

    Returns:
      (..., num_carriers, num_sts, num_rx) complex channel estimate.
    """
    if num_sts is None:
        num_sts = cfg.num_tx
    P = pilot_p_matrix(num_sts)                       # (nsts, nltf) real ±1
    ltf = ltf_data_carriers(cfg)                      # (C,) ±1
    rx = rx_grid[..., :num_sts, :]                    # first nltf symbols
    # (..., C, n, R) x (j, n) -> (..., C, j, R)
    hd = jnp.einsum("...cnr,jn->...cjr", rx, P.astype(rx.dtype))
    denom = (num_sts * ltf).astype(hd.real.dtype)
    return hd / denom[:, None, None]


def dft_selected_np(cfg: SimConfig):
    """Scaled selected-bin DFT matrix A[c, t] = exp(-2πj·b_c·t/N) /
    (nltf·ltf_c), with b_c the signed bin of data carrier c (fftshift
    folded in). Pure NumPy on purpose: runs at trace time and must stay
    a compile-time constant. Shared by the matmul-form LS estimator and
    the fused Pallas kernel (one source of truth for the scaling)."""
    import numpy as np

    from mamimo_tpu.ops.ltf import _ltf_np

    n = cfg.fft_length
    bins = np.asarray(cfg.carrier_locations, np.float64) - n // 2
    t = np.arange(n)
    a = np.exp(-2j * np.pi * bins[:, None] * t[None, :] / n)
    ltf = _ltf_np(n)[np.asarray(cfg.carrier_locations)].astype(np.float64)
    return (a / (cfg.num_tx * ltf)[:, None]).astype(np.complex64)  # (C, N)


def ls_matmul_constants(cfg: SimConfig, padded: bool = False):
    """Trace-time constants for the matmul-form LS estimator:
    (A, P) with A the scaled selected-bin DFT matrix (dft_selected_np;
    with padded=True extended over the CP samples with zero columns —
    the rx-major form, dft_selected_padded_np) and P the pilot mapping.
    Pass these as jit *arguments* (they are ~0.5 MB; keeping executables
    literal-free)."""
    from mamimo_tpu.ops.ltf import _hadamard_np
    from mamimo_tpu.utils.numerics import put_complex

    a_np = dft_selected_padded_np(cfg) if padded else dft_selected_np(cfg)
    return (put_complex(a_np), jnp.asarray(_hadamard_np(cfg.num_tx)))


def ls_estimate_matmul(cfg: SimConfig, rx, consts=None):
    """LS estimation from the raw preamble as two batched matmuls —
    the 256-point demod FFT *is* a matmul at this size, and on the MXU
    that beats the FFT lowering. Mathematically identical to
    ofdm_demodulate + ls_estimate.

    Args:
      rx: (B, len_ltf, num_rx) complex64.
      consts: optional (A, P) from ls_matmul_constants.

    Returns:
      (B, num_carriers, num_tx, num_rx) complex64.
    """
    if consts is None:
        consts = ls_matmul_constants(cfg)
    a, p = consts
    b, _, nrx = rx.shape
    nsym = cfg.num_tx
    x = rx.reshape(b, nsym, cfg.sym_len, nrx)[:, :, cfg.cp_length:, :]
    # despread over symbols, then DFT-select over time
    y = jnp.einsum("jn,bntr->bjtr", p.astype(rx.dtype), x)
    est = jnp.einsum("ct,bjtr->bcjr", a, y)
    return est


def dft_selected_padded_np(cfg: SimConfig):
    """dft_selected_np extended to the full CP+FFT symbol length with
    zero columns over the CP samples — folds the CP drop into the matmul
    so the hot path never slices (strided-copies) the rx batch. The
    extra zero columns cost ~25% more LS MACs but remove a full
    HBM round-trip of the preamble tensor (the LS path is layout-bound,
    not FLOP-bound — see PERF.md)."""
    import numpy as np

    a = dft_selected_np(cfg)                         # (C, N)
    out = np.zeros((a.shape[0], cfg.sym_len), np.complex64)
    out[:, cfg.cp_length:] = a
    return out


def ls_matmul_constants_rxmajor(cfg: SimConfig):
    """Trace-time constants (A_padded, P) for ls_estimate_rxmajor."""
    return ls_matmul_constants(cfg, padded=True)


def ls_planes_constants(cfg: SimConfig, dtype=None):
    """Trace-time constants for ls_estimate_planes: (At_r, At_i, P) with
    At = dft_selected_padded_np(cfg).T as separate float32 planes
    (sym_len, C) — the planes path never builds complex arrays from the
    rx batch, so the DFT matrix is pre-split too.

    dtype pre-casts the DFT planes (e.g. bfloat16) — pass pre-cast
    constants as jit arguments rather than casting inside the graph:
    with --xla_allow_excess_precision (set by the TPU runtime) XLA may
    elide in-graph downcasts and silently run the f32 matmul."""
    import numpy as np

    from mamimo_tpu.ops.ltf import _hadamard_np

    at = dft_selected_padded_np(cfg).T                 # (sym_len, C)
    dt = dtype or jnp.float32
    return (jnp.asarray(np.real(at), dt),
            jnp.asarray(np.imag(at), dt),
            jnp.asarray(_hadamard_np(cfg.num_tx)))


def ls_estimate_planes(cfg: SimConfig, planes, consts=None, dtype=None):
    """LS estimation from canonical rx-major real PLANES — the TPU-native
    hot-path form (identical math to ls_estimate_matmul):

    * input is (2, S, len_ltf) float32 ([0]=real, [1]=imag, S = B·num_rx
      in rx-major order) — no complex extraction, no transposes;
    * the CP drop is zero rows folded into the DFT matrix;
    * the complex DFT-select is 4 real MXU matmuls over the free
      (S·num_tx, sym_len) reshape; the despread contracts the tiny
      symbol axis.

    Args:
      planes: (2, S, len_ltf) float32.
      consts: optional (At_r, At_i, P) from ls_planes_constants.
      dtype: optional MXU compute dtype for the DFT matmuls (e.g.
        jnp.bfloat16 — doubles MXU rate; accumulation stays float32).
        bf16 input quantization adds ~−50 dB relative error, far below
        the LS noise floor at any operating SNR ≤ 30 dB. Never use for
        noiseless (SNR=120) label generation.

    Returns:
      (S, num_tx, num_carriers) complex64 — rx-major layout.
    """
    if consts is None:
        consts = ls_planes_constants(cfg)
    at_r, at_i, p = consts
    _, s, _ = planes.shape
    nsym = cfg.num_tx
    c = cfg.num_carriers
    x = planes.reshape(2, s * nsym, cfg.sym_len)      # free: contiguous
    if dtype is not None:
        x = x.astype(dtype)
        at_r = at_r.astype(dtype)
        at_i = at_i.astype(dtype)

    def mm(a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    zr = mm(x[0], at_r) - mm(x[1], at_i)              # (S·nsym, C) f32
    zi = mm(x[0], at_i) + mm(x[1], at_r)
    # despread on the REAL planes (P is ±1 real) per plane — no stack
    # (a jnp.stack here materialized a 490 MB copy at batch 1024) and
    # complexify only the final (S, ntx, C) result (a complex-dtype
    # einsum measured ~0.5 ms of pure layout cost on-chip)
    pp = p.astype(zr.dtype)
    hr = jnp.einsum("jn,snc->sjc", pp, zr.reshape(s, nsym, c))
    hi = jnp.einsum("jn,snc->sjc", pp, zi.reshape(s, nsym, c))
    return jax.lax.complex(hr, hi)


def ls_estimate_rxmajor(cfg: SimConfig, rx, consts=None):
    """LS estimation in the TPU-native rx-major layout.

    Identical math to ls_estimate_matmul, restructured for layout:

    * rx arrives antenna-major, (B, num_rx, len_ltf) — the time axis is
      minor/contiguous, so the per-symbol DFT contracts the minor axis
      directly (a clean (B·R·Nt, sym_len) × (sym_len, C) MXU matmul, no
      transpose);
    * the CP drop is folded into the DFT matrix as zero columns
      (dft_selected_padded_np) instead of a strided slice of the
      hundreds-of-MB rx batch;
    * the despread then contracts the tiny symbol axis, and the result
      stays antenna-major — no output transpose.

    Args:
      rx: (B, num_rx, len_ltf) complex64.
      consts: optional (A_padded, P) from ls_matmul_constants_rxmajor.

    Returns:
      (B, num_rx, num_tx, num_carriers) complex64 — rx-major layout;
      transpose(0, 3, 2, 1) recovers the ls_estimate convention.
    """
    if consts is None:
        consts = ls_matmul_constants_rxmajor(cfg)
    a, p = consts
    b, nrx, _ = rx.shape
    x = rx.reshape(b, nrx, cfg.num_tx, cfg.sym_len)   # free: contiguous
    y = jnp.einsum("brnt,ct->brnc", x, a)             # per-symbol DFT
    return jnp.einsum("jn,brnc->brjc", p.astype(rx.dtype), y)


def lmmse_tau_rms(tau):
    """The reference's rms-delay proxy from the scatterer 'h' vector
    (LMMSE_ce.m:27-30 — see lmmse_weight for the delays-as-h quirk)."""
    tau = jnp.asarray(tau)
    ns = tau.shape[-1]
    k = jnp.arange(ns, dtype=tau.dtype)
    w = tau * tau                                    # τ_s² (tau is real)
    hh = jnp.sum(w, axis=-1)
    tmp = w * k
    r = jnp.sum(tmp, axis=-1) / hh
    r2 = jnp.sum(tmp * k, axis=-1) / hh
    return jnp.sqrt(jnp.maximum(r2 - r * r, 0.0))


def lmmse_rf(cfg: SimConfig, tau):
    """Frequency-correlation matrix Rf[a,b] = 1/(1 + j·2π·τ_rms·df·(a−b))
    (LMMSE_ce.m:33-36; Rhp = Rpp0 = Rf). Hermitian by construction."""
    tau_rms = lmmse_tau_rms(tau)
    n = cfg.num_carriers
    df = 1.0 / n
    a = jnp.arange(n)
    diff = (a[:, None] - a[None, :]).astype(jnp.float32)
    jw = 1j * 2.0 * jnp.pi * tau_rms[..., None, None] * df
    return 1.0 / (1.0 + jw * diff)


def lmmse_eig_factor(cfg: SimConfig, tau):
    """Eigendecomposition of Rf, the per-packet half of the LMMSE
    estimator: Rf = U·diag(λ)·Uᴴ with λ real (Rf is Hermitian).

    Structure exploited (this is a BEAT over LMMSE_ce.m:37-39, which
    LU-solves Rpp = Rf + I/snr blindly per (packet, rx-antenna)): Rpp
    differs from Rf only by σ²I, so Rpp shares Rf's eigenvectors and

        M = Rf·Rpp⁻¹ = U·diag(λ/(λ + 1/snr))·Uᴴ.

    One factorization per packet serves every rx antenna AND every SNR
    level of a shared-scenario sweep (run_snr_sweep reuses channel
    seeds, so τ — hence Rf — is identical across the 18 levels: 72
    solves collapse into 1 eigh + diagonal rescales).

    Returns (u, lam): (..., C, C) complex, (..., C) float.
    """
    # full precision: like every jnp.linalg lowering on TPU, eigh's
    # internal matmuls obey the DEFAULT (single-pass bf16) precision —
    # the exact/alternate forms must be exact on-chip (round-5 tier:
    # the unpinned form measured −46.6 dB flat vs the float64 oracle,
    # results/tpu_checks_r5.json)
    with jax.default_matmul_precision("highest"):
        lam, u = jnp.linalg.eigh(lmmse_rf(cfg, tau))
    return u, lam


def lmmse_estimate_eig(cfg: SimConfig, h_ls, tau=None, snr_db=None,
                       factors=None):
    """LMMSE estimate through the eigenbasis of Rf — identical math to
    lmmse_estimate (M·h with M = Rf·(Rf + I/snr)⁻¹), restructured as

        ĥ = U · (λ/(λ + 1/snr) ⊙ (Uᴴ·h_LS))

    so the per-(rx, SNR) work is two (C, C) matmuls + a diagonal
    rescale instead of a dense linear solve.

    Args:
      h_ls:    (..., C, nsts, R) LS estimate.
      tau:     (..., ns) path delays (unused when factors given).
      snr_db:  (..., R) per-antenna sounding SNR in dB.
      factors: optional precomputed (u, lam) from lmmse_eig_factor —
               pass these to amortize the factorization across SNR
               levels / datasets sharing the channel realizations.

    Returns: same shape as h_ls.
    """
    if factors is None:
        factors = lmmse_eig_factor(cfg, tau)
    u, lam = factors
    snr = 10.0 ** (jnp.asarray(snr_db) * 0.1)
    # d[..., c, r] = λ_c / (λ_c + 1/snr_r)
    d = lam[..., :, None] / (lam[..., :, None] + 1.0 / snr[..., None, :])
    # full precision on the basis rotations: at the TPU's default
    # single-pass-bf16 matmul precision these (C, C) einsums flatten
    # the estimator to −46.6 dB from the float64 oracle
    # (results/tpu_checks_r5.json round-5 catch) — the exact forms must
    # be exact on-chip
    hp = jax.lax.Precision.HIGHEST
    g = jnp.einsum("...dc,...djr->...cjr", jnp.conj(u),
                   h_ls.astype(u.dtype), precision=hp)
    g = g * d[..., :, None, :].astype(u.dtype)
    return jnp.einsum("...cd,...djr->...cjr", u, g, precision=hp)


def lmmse_weight(cfg: SimConfig, tau, snr_db):
    """Per-(packet, rx-antenna) LMMSE smoothing matrix M = Rhp · Rpp⁻¹.

    Faithful reimplementation of ``LMMSE_ce.m:23-39`` including its quirk:
    the "channel impulse response" h passed in is actually the vector of
    scatterer path *delays* (``h_tau``/TAU from helperApplyMUChannel,
    wired through generate_maMIMO_LTF.m:210,342), so the rms-delay proxy
    is computed from τ² weights over the scatterer index:

        hh   = Σ τ_s²             (h*h')
        tmp  = τ_s² · s           (h .* conj(h) .* k)
        r    = Σ tmp / hh ;  r2 = Σ tmp·s / hh
        τ_rms = sqrt(r2 − r²)

    and the frequency-correlation matrices use Nfft = Np = num_carriers,
    Nps = 1, df = 1/num_carriers:

        Rhp[a,b] = Rpp0[a,b] = 1 / (1 + j·2π·τ_rms·df·(a−b))
        Rpp = Rpp0 + I/snr
        M = Rhp · Rpp⁻¹

    Args:
      tau:    (..., n_scatterers) path delays in *scatterer order* (the
              order matters for the index-weighted proxy — preserved from
              generation).
      snr_db: (...,) per-antenna sounding SNR in dB.

    Returns:
      (..., num_carriers, num_carriers) complex M.
    """
    rf = lmmse_rf(cfg, tau)
    snr = 10.0 ** (jnp.asarray(snr_db) * 0.1)
    eye = jnp.eye(cfg.num_carriers, dtype=rf.dtype)
    rpp = rf + eye / snr[..., None, None]
    # M = Rhp · Rpp⁻¹  computed as  solve(Rppᵀ, Rhpᵀ)ᵀ — at full
    # precision (see lmmse_estimate_direct: the TPU solve lowering is
    # ~-31 dB from exact at default bf16 matmul precision)
    with jax.default_matmul_precision("highest"):
        m = jnp.linalg.solve(
            jnp.swapaxes(rpp, -1, -2), jnp.swapaxes(rf, -1, -2)
        )
    return jnp.swapaxes(m, -1, -2).astype(jnp.complex64)


def lmmse_estimate_chunked(cfg: SimConfig, h_ls, tau, snr_db,
                           chunk: int = 32):
    """lmmse_estimate streamed over the leading packet axis.

    The smoothing matrices are (num_rx, C, C) complex PER PACKET
    (~7 MB at BS32) — a protocol-scale 500-packet batch would
    materialize ~3.5 GB of them before the solve. This form bounds the
    live set to `chunk` packets via a scanned map (one compiled program,
    sequential chunks).

    Args:
      h_ls:   (B, C, num_sts, num_rx); tau: (B, ns); snr_db: (B, num_rx).
    """
    import jax

    def f(args):
        h, t, s = args
        return lmmse_estimate(cfg, h, t, s)

    return jax.lax.map(f, (h_ls, tau, snr_db), batch_size=chunk)


def lmmse_estimate(cfg: SimConfig, h_ls, tau, snr_db):
    """LMMSE channel estimate from the LS estimate.

    Args:
      h_ls:   (..., num_carriers, num_sts, num_rx) LS estimate.
      tau:    (..., n_scatterers) path delays (see lmmse_weight).
      snr_db: (..., num_rx) per-antenna sounding SNR in dB.

    Returns:
      same shape as h_ls.
    """
    # M: (..., R, C, C); apply to h_ls columns per rx antenna (at full
    # precision — this is the exact/oracle form)
    m = lmmse_weight(cfg, tau[..., None, :], snr_db)     # (..., R, C, C)
    with jax.default_matmul_precision("highest"):
        return jnp.einsum("...rcd,...djr->...cjr", m,
                          h_ls.astype(m.dtype))


def lmmse_estimate_direct(cfg: SimConfig, h_ls, tau, snr_db):
    """LMMSE estimate without materializing the smoothing matrix
    (identical math to lmmse_estimate). Measured on-chip it is only
    ~4% faster than the dense form — the LU factorization dominates —
    so the production sounding path is lmmse_estimate_cg below; this
    form remains the exact no-materialization solve:

        ĥ = M·h = Rhp·Rpp⁻¹·h = Rf · solve(Rpp, h)

    The dense form (lmmse_weight, faithful to LMMSE_ce.m:37-39) LU-
    solves Rppᵀ·Mᵀ = Rfᵀ — a C-RHS solve (234 right-hand sides) — to
    build the full (C, C) matrix M, then uses it once per antenna. Here
    the solve carries only the num_sts actual right-hand sides
    (Rpp⁻¹·h) and Rf is applied as one matvec: the O(C³) triangular
    back-substitution over C RHS (≈ 2.6·C³ flops of the dense form's
    ≈ 3.3·C³) collapses to O(num_sts·C²), leaving just the LU
    factorization (≈ 0.7·C³) — ~5× fewer FLOPs, exactly associativity.
    Also skips the (..., R, C, C) M materialization (~7 MB/packet at
    BS32), so no chunked variant is needed.

    Eig/eigh restructurings were measured and REJECTED on TPU: the
    jnp.linalg.eigh lowering ran 10× slower than the dense LU at every
    Nt (results/timing_nt_sweep.json round-3 refresh).

    Args/shape contract: identical to lmmse_estimate.
    """
    rf = lmmse_rf(cfg, tau[..., None, :])                # (..., 1, C, C)
    snr = 10.0 ** (jnp.asarray(snr_db) * 0.1)            # (..., R)
    eye = jnp.eye(cfg.num_carriers, dtype=rf.dtype)
    rpp = rf + eye / snr[..., None, None]                # (..., R, C, C)
    # rhs: (..., R, C, nsts) — per-antenna LS columns
    rhs = jnp.moveaxis(h_ls.astype(rf.dtype), -1, -3)
    # full precision: the TPU LU/triangular-solve lowering runs its
    # internal matmuls at the DEFAULT (single-pass bf16) precision and
    # lands at only ~-31 dB from the float64 oracle on-chip
    # (results/probe_cg_accuracy.json) — the exact forms must be exact
    with jax.default_matmul_precision("highest"):
        x = jnp.linalg.solve(rpp, rhs)                   # (..., R, C, s)
        y = rf @ x                                       # (..., R, C, s)
    return jnp.moveaxis(y, -3, -1).astype(jnp.complex64)


def _lmmse_generator(cfg: SimConfig, tau):
    """Toeplitz generator of Rf: f[k] = 1/(1 + j·2π·τ_rms·df·k),
    k = 0..C−1 (negative lags are conj(f[k]) — Rf is Hermitian)."""
    tau_rms = lmmse_tau_rms(jnp.asarray(tau))            # (...,)
    n = cfg.num_carriers
    k = jnp.arange(n, dtype=jnp.float32)
    jw = 1j * (2.0 * jnp.pi / n) * tau_rms[..., None]    # (..., 1)
    return 1.0 / (1.0 + jw * k)                          # (..., C) complex


def lmmse_estimate_cg(cfg: SimConfig, h_ls, tau, snr_db,
                      n_iter: int = 16, embed: int = 512,
                      precond_precision=None, matvec_precision=None):
    """LMMSE estimate via circulant-preconditioned CG — identical math
    to lmmse_estimate, restructured for the TPU.

    Structure exploited (a BEAT over LMMSE_ce.m:37-39, which LU-solves
    the dense system per (packet, rx-antenna)): Rf[a,b] depends only on
    a−b — it is Hermitian TOEPLITZ, generated by the single scalar
    τ_rms — and M·h = Rf·Rpp⁻¹·h = h − σ²·Rpp⁻¹·h (since
    Rf = Rpp − σ²I). So the whole estimator is ONE Toeplitz-plus-σ²I
    solve whose matvec is two batched FFTs through a 512-point
    circulant embedding. Dense LU is a sequential, MXU-hostile lowering
    on TPU (60 ms/call at batch 64 in results/timing_nt_sweep.json);
    the CG form is FFT/VPU work with a fixed trip count (static
    control flow under jit).

    Preconditioner: the PADDED-CIRCULANT solve — restrict(C_512⁻¹
    extend(r)) with C_512 the (clamped-PSD) 512-point embedding plus
    σ²I. Strang/T.Chan C-point circulants were tried first and REJECTED:
    this generator decays like 1/(αk), so the C/2-lag truncation they
    rely on is a large perturbation and high-SNR convergence stalls
    (measured 8e-2 after 16 iters at +20 dB vs 3e-5 for the padded
    form). The padded preconditioner reuses the embedding spectrum the
    matvec already computes and captures every lag; measured max|Δ| vs
    the dense solve at n_iter=16: ≤1e-6 for SNR ≤ 0 dB, 5e-6 at +10,
    3e-5 at +20, 1e-3 at +30 — and the absolute error is further
    damped by σ² in ĥ = h − σ²·y, so high SNR is the forgiving
    direction.

    Args/shape contract: identical to lmmse_estimate
    (h_ls (..., C, nsts, R); tau (..., ns); snr_db (..., R)).
    """
    n = cfg.num_carriers
    m = embed
    assert m >= 2 * n - 1, "embedding must cover every Toeplitz lag"
    f = _lmmse_generator(cfg, tau)                       # (..., C)
    cdt = f.dtype
    # circulant embedding first column: [f(0..C−1), 0…, conj(f(C−1..1))]
    zeros = jnp.zeros(f.shape[:-1] + (m - 2 * n + 1,), cdt)
    c = jnp.concatenate(
        [f, zeros, jnp.conj(f[..., 1:][..., ::-1])], axis=-1)
    ce = jnp.fft.fft(c, axis=-1)[..., None, None, :]     # (..., 1, 1, M)
    snr = 10.0 ** (jnp.asarray(snr_db) * 0.1)            # (..., R)
    sig2 = (1.0 / snr)[..., None, None]                  # (..., R, 1, 1)
    # padded-circulant preconditioner spectrum: the embedding of a PSD
    # Toeplitz need not be PSD — clamp, then add σ² (HPD by congruence)
    pe = jnp.maximum(ce.real, 0.0) + sig2                # (..., R, 1, M)

    # vectors live as (..., R, nsts, C)
    b = jnp.swapaxes(
        jnp.moveaxis(h_ls.astype(cdt), -1, -3), -1, -2)  # (..., R, s, C)

    # The M-point transforms as TRUNCATED DFT matmuls, not jnp.fft:
    # measured on-chip, an XLA TPU FFT roundtrip at these shapes runs
    # 1.67 ms vs 0.71 ms for the full 512×512 matmul (the FFT lowering
    # doesn't use the MXU) — and the CG vectors occupy only C of the M
    # bins, so the forward needs just C rows and the inverse just C
    # columns (another 2.2× fewer MACs). Matrices are built IN-GRAPH
    # from real arange (complex literals can't cross the host boundary
    # on this backend, PERF.md).
    kc = jnp.arange(n, dtype=jnp.float32)
    jm = jnp.arange(m, dtype=jnp.float32)
    # reduce the index product mod m BEFORE scaling: k·j < 2^24 so the
    # product and the mod are exact in float32, keeping every angle in
    # [0, 2π) — unreduced angles reach ~1460 rad where float32 rounding
    # of the product alone costs ~1e-4 rad of phase per entry
    ang = (2.0 * jnp.pi / m) * jnp.mod(kc[:, None] * jm[None, :], m)
    fwd = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))   # (C, M)
    inv = jnp.swapaxes(jnp.conj(fwd), 0, 1) / m          # (M, C)

    # the MATVEC's DFT applies MUST run at full f32 matmul precision:
    # under the TPU's DEFAULT precision (single-pass bf16 MXU) each
    # matvec quantizes at ~1e-2 relative and the iteration stalls there
    # — measured max|err| 0.78 on unit-ish inputs vs 1.3e-4 at f32
    # (results/probe_lmmse_cg_r4.json, round-4 fix). HIGHEST costs 3
    # extra MXU passes on these small (·, 512) dots, a minor share of
    # the call at Nt=32 — but at Nt=64 the RHS count quadruples and the
    # HIGHEST applies eat the CG's margin over dense (1.32×,
    # results/probe_lmmse_cg_nt64b.json round 4).
    # matvec_precision overrides HIGHEST on the matvec's dots:
    # Precision.HIGH (3-pass bf16, ~1e-5 relative per dot) halves the
    # matvec MXU passes — accuracy/time frontier measured on-chip in
    # results/probe_cg_mixed_r5.json before any production pick.
    mv_prec = (jax.lax.Precision.HIGHEST if matvec_precision is None
               else matvec_precision)

    def dot(a, b):
        return jnp.matmul(a, b, precision=mv_prec)

    # the PRECONDITIONER is approximate BY CONSTRUCTION (a clamped
    # padded-circulant surrogate for Rpp) — CG needs only a consistent
    # SPD map there, not an exact one, so its two DFT applies can run
    # at a cheaper precision (precond_precision='default' halves the
    # HIGHEST-pass count per iteration; left-preconditioned CG theory
    # only requires M⁻¹ SPD, which a uniformly-quantized transform pair
    # preserves to bf16 rounding). Accuracy/time measured on-chip in
    # results/probe_cg_mixed_r5.json; the exactness gate stays
    # scripts/tpu_checks.py row lmmse_cg.
    if precond_precision is None:
        pdot = dot
    else:
        def pdot(a, b):
            return jnp.matmul(a, b, precision=precond_precision)

    def matvec(v):
        w = dot(dot(v, fwd) * ce, inv)
        return w + sig2 * v

    def precond(r):
        return pdot(pdot(r, fwd) / pe, inv)

    def rdot(u, v):
        return jnp.sum(jnp.conj(u) * v, axis=-1,
                       keepdims=True).real.astype(jnp.float32)

    eps = jnp.float32(1e-30)
    r0 = b
    z0 = precond(r0)
    rho0 = rdot(r0, z0)

    def body(carry, _):
        x, r, p, rho = carry
        ap = matvec(p)
        alpha = (rho / (rdot(p, ap) + eps)).astype(cdt)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rho_n = rdot(r, z)
        beta = (rho_n / (rho + eps)).astype(cdt)
        p = z + beta * p
        return (x, r, p, rho_n), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (jnp.zeros_like(b), r0, z0, rho0), None, length=n_iter)
    y = b - sig2 * x                                     # ĥ = h − σ²·Rpp⁻¹h
    return jnp.moveaxis(
        jnp.swapaxes(y, -1, -2), -3, -1).astype(jnp.complex64)
