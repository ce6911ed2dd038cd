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


# ----------------------------------------------------------------------
# v2 flat-planes LS kernel: merged complex dots + fused batch reduction
# ----------------------------------------------------------------------

def ls_planes_pallas_v2_constants(cfg: SimConfig, block_samples: int = 8,
                                  dtype=None):
    """Kernel constants for ls_planes_pallas_v2: (B, K) with

    * B = [At_r | At_i] — the two DFT planes CONCATENATED along lanes,
      (sym_len, 2·Cp): the complex DFT-select becomes 2 MXU dots (one
      per input plane) instead of 4 — each twice as wide (N = 512),
      which pipelines better on the 128×128 systolic array than four
      N = 256 dots;
    * K = I_{block_samples} ⊗ P as in ls_planes_pallas_constants; the
      v2 despread multiplies the CONCATENATED (R, 2·Cp) z planes by one
      (R, R) K dot (both planes share P), halving despread dispatches.
    """
    import numpy as np

    from mamimo_tpu.ops.estimate import dft_selected_padded_np

    at = dft_selected_padded_np(cfg).T                 # (sym_len, C)
    cp_ = _round_up(cfg.num_carriers, 128)
    b = np.zeros((cfg.sym_len, 2 * cp_), np.float32)
    b[:, :cfg.num_carriers] = np.real(at)
    b[:, cp_:cp_ + cfg.num_carriers] = np.imag(at)
    k = np.kron(np.eye(block_samples, dtype=np.float32),
                _hadamard_np(cfg.num_tx).astype(np.float32))
    dt = dtype or jnp.float32
    return jnp.asarray(b, dt), jnp.asarray(k, dt)


def _planes_kernel_v2(x_ref, b_ref, k_ref, h_ref, ssq_ref, *, cp: int,
                      with_ssq: bool, n_sub: int):
    b = b_ref[:]                                  # (sym_len, 2Cp)
    # complex DFT-select in 2 wide dots: t = x_plane @ [Ar | Ai]
    tr = jnp.dot(x_ref[0], b, preferred_element_type=jnp.float32)
    ti = jnp.dot(x_ref[1], b, preferred_element_type=jnp.float32)
    # t* columns are [x@Ar | x@Ai]; recombine into z = [zr | zi]
    zr = tr[:, :cp] - ti[:, cp:]                  # (R, Cp)
    zi = tr[:, cp:] + ti[:, :cp]
    z = jnp.concatenate([zr, zi], axis=1)         # (R, 2Cp) f32
    # block-diagonal despread, both planes in ONE (r_out, r_in)·(r_in,
    # 2Cp) dot per sub-block: K = I⊗P wastes MACs quadratically in its
    # size, so the despread granularity is decoupled from the (larger)
    # DMA block that amortizes per-grid-step overheads. K may be
    # rectangular: under sequence sharding each device holds loc < nsym
    # symbols per sample and K = I ⊗ P[:, local_cols] maps r_in local
    # rows to r_out = block·nsym PARTIAL estimates (psum'd outside).
    k = k_ref[:]
    r_out, r_in = k.shape
    ssq = None
    for i in range(n_sub):
        zi_sub = z[i * r_in:(i + 1) * r_in].astype(k.dtype)
        h = jnp.dot(k, zi_sub, preferred_element_type=jnp.float32)
        h_ref[i * r_out:(i + 1) * r_out] = h.astype(h_ref.dtype)
        if with_ssq:
            s = jnp.sum(h * h, axis=0, keepdims=True)
            ssq = s if ssq is None else ssq + s
    if with_ssq:
        # fused benchmark reduction: per-block partial Σh² — the bench
        # scalar then reads n_blocks·2Cp floats instead of re-reading
        # the full (rows, 2Cp) output from HBM (see bench._abs_sum).
        # Broadcast over the 8-sublane tile; consumers divide by 8.
        ssq_ref[0] = jnp.broadcast_to(ssq, (8, 2 * cp))


def ls_planes_pallas_v2(cfg: SimConfig, planes, consts=None, *,
                        block_samples: int = 8, dma_samples: int | None = None,
                        interpret: bool | None = None,
                        with_ssq: bool = False, out_dtype=None):
    """v2 of ls_planes_pallas: identical math, restructured for the MXU.

    Differences vs ls_planes_pallas (measured on-chip, PERF.md round 3):

    * 3 MXU dots per block instead of 6 — the DFT planes are concatenated
      along lanes (N = 2·Cp = 512) and the despread handles both planes
      in one dot; fewer, wider dots keep the systolic array full;
    * single fused (rows, 2·Cp) output ([.. :Cp] = real, [.. Cp:] =
      imag) — one HBM stream instead of two;
    * the DMA block (`dma_samples`, default 4× block_samples) is larger
      than the despread block so per-grid-step overheads amortize while
      the I⊗P despread keeps its optimal small size;
    * optional fused Σh² per block (`with_ssq`) so a timing/serving
      harness never re-reads the estimate tensor from HBM.

    Returns (h, ssq) with h (rows, 2·Cp) — rows = S·num_tx padded to the
    DMA block — and ssq (n_blocks, 8, 2·Cp) broadcast partial sums
    summing to 8·Σh² (None unless with_ssq). Densify with
    ls_v2_to_complex or slice per plane.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, s, L = planes.shape
    assert L % cfg.sym_len == 0
    # symbols per sample in THIS input: cfg.num_tx for the full
    # preamble, nsym/n_seq for a sequence-sharded local block
    nsym_in = L // cfg.sym_len
    if consts is None:
        consts = ls_planes_pallas_v2_constants(cfg, block_samples,
                                               dtype=planes.dtype)
    b, k = consts
    cp_ = b.shape[1] // 2
    r_out, r_in = k.shape
    assert r_in == block_samples * nsym_in, (k.shape, nsym_in)
    assert r_out % block_samples == 0
    nsym_out = r_out // block_samples
    if dma_samples is None:
        dma_samples = 4 * block_samples
    n_sub = max(dma_samples // block_samples, 1)
    dma_samples = n_sub * block_samples
    rd_in = dma_samples * nsym_in                 # input rows / DMA block
    rd_out = dma_samples * nsym_out               # output rows / block

    sp = _round_up(s, dma_samples)
    x = planes.reshape(2, s * nsym_in, cfg.sym_len)
    if sp != s:
        x = jnp.zeros((2, sp * nsym_in, cfg.sym_len), x.dtype
                      ).at[:, : s * nsym_in].set(x)
    rows_in = sp * nsym_in
    rows = sp * nsym_out
    n_blocks = rows_in // rd_in

    blk = lambda i: (0, i, 0)                     # noqa: E731
    const = lambda i: (0, 0)                      # noqa: E731
    out_shape = [jax.ShapeDtypeStruct((rows, 2 * cp_),
                                      out_dtype or jnp.float32)]
    out_specs = [pl.BlockSpec((rd_out, 2 * cp_), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if with_ssq:
        out_shape.append(
            jax.ShapeDtypeStruct((n_blocks, 8, 2 * cp_), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, 2 * cp_),
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        kern = functools.partial(_planes_kernel_v2, cp=cp_,
                                 with_ssq=True, n_sub=n_sub)
    else:
        def kern(x, b, k, h):
            _planes_kernel_v2(x, b, k, h, None, cp=cp_, with_ssq=False,
                              n_sub=n_sub)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((2, rd_in, cfg.sym_len), blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_out, r_in), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, b, k)
    if with_ssq:
        return outs[0], outs[1]
    return outs[0], None


def ls_v2_to_complex(cfg: SimConfig, h, s: int):
    """Densify ls_planes_pallas_v2 output to (S, num_tx, num_carriers)
    complex64 rx-major."""
    cp_ = h.shape[1] // 2
    return ls_raw_to_complex(cfg, h[:, :cp_], h[:, cp_:], s)


def ls_raw_to_complex(cfg: SimConfig, hr, hi, s: int):
    """Densify ls_planes_pallas(raw=True) output to the standard
    (S, num_tx, num_carriers) complex64 rx-major form."""
    nsym, c = cfg.num_tx, cfg.num_carriers
    hr = hr[: s * nsym, :c].reshape(s, nsym, c)
    hi = hi[: s * nsym, :c].reshape(s, nsym, c)
    return jax.lax.complex(hr, hi)
