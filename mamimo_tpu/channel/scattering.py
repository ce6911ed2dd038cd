"""Single-bounce scattering MIMO channel, TPU-native.

Replaces ``phased.ScatteringMIMOChannel`` as configured in
``helperApplyMUChannel.m:85-133``:

* BS (Tx) ULA at the origin, user (Rx) ULA at a random position within
  ``max_range`` of the BS (``generate_maMIMO_LTF.m:48-51,166-169``);
* ``n_scatterers`` point scatterers placed uniformly in a box of
  half-size ``0.1 * range`` centred on the Rx
  (``helperApplyMUChannel.m:85-93``);
* per-scatterer complex gain ~ CN(0,1); per-path amplitude includes the
  free-space spreading loss λ/(4πd) over the total Tx→scatterer→Rx
  distance and carrier phase exp(−j2πd/λ)  — so the expected per-link
  channel power is ≈ −fspl(range) + 10·log10(Ns) dB, the property the
  generator asserts at ``generate_maMIMO_LTF.m:218-227``;
* path delay τ_s measured between the array reference positions
  (narrowband array assumption: inter-element phase differences live in
  the response, the delay is common per scatterer);
* channel delay = floor(min τ · Fs) samples (``helperApplyMUChannel.m:133``).

The channel is *applied in the frequency domain*: instead of the
reference's interpolated-FIR channel filter, each path's fractional
delay becomes an exact phase ramp over a zero-padded FFT — a batched
matmul + FFT, which is how a TPU wants to do convolution. With
``num_pad_zeros`` (=960) trailing zeros and max path delay well below
that, the circular convolution equals the linear one exactly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.utils.numerics import unit_phasor


def fspl_db(dist, lam):
    """Free-space path loss in dB (MATLAB ``fspl``)."""
    return 20.0 * jnp.log10(4.0 * jnp.pi * dist / lam)


def ula_positions(n: int, spacing: float) -> np.ndarray:
    """Element positions of an n-element ULA along the y axis, centred at
    the origin (matches phased.ULA's getElementPosition layout).

    Returns (3, n) float32 metres."""
    y = (np.arange(n) - (n - 1) / 2.0) * spacing
    pos = np.zeros((3, n), np.float32)
    pos[1] = y
    return pos


def ura_positions(n: int, ncols: int, spacing: float) -> np.ndarray:
    """n-element uniform rectangular array in the y-z plane
    ([n/ncols × ncols] grid, phased.URA([expFactor numSTS]) layout,
    helperApplyMUChannel.m:53-55). Returns (3, n) float32 metres."""
    nrows = n // ncols
    assert nrows * ncols == n
    y = (np.arange(ncols) - (ncols - 1) / 2.0) * spacing
    z = (np.arange(nrows) - (nrows - 1) / 2.0) * spacing
    pos = np.zeros((3, n), np.float32)
    yy, zz = np.meshgrid(y, z)
    pos[1] = yy.reshape(-1)
    pos[2] = zz.reshape(-1)
    return pos


def helper_array_info(num_tx: int, num_rx: int, num_sts: int,
                      validate: bool = True):
    """Array-geometry dispatch of the MathWorks ``helperArrayInfo(prm)``
    helper (called at generate_maMIMO_LTF.m:123 and
    helperApplyMUChannel.m:49): the Tx array is a ULA of numTx elements
    when a single data stream is sounded, and a partitioned URA of
    [numTx/numSTS × numSTS] elements otherwise
    (generate_maMIMO_LTF.m:126-136); the per-user Rx array follows the
    same rule with [numRx/numSTS_u × numSTS_u]
    (generate_maMIMO_LTF.m:145-156).

    Returns (is_tx_ura, exp_factor_tx, is_rx_ura, exp_factor_rx).
    """
    if validate:
        if num_tx % num_sts:
            raise ValueError(
                f"num_tx={num_tx} must be a multiple of num_sts={num_sts}")
        if num_rx % num_sts:
            raise ValueError(
                f"num_rx={num_rx} must be a multiple of num_sts="
                f"{num_sts} (the reference partitions the Rx array as "
                f"[numRx/numSTS x numSTS], generate_maMIMO_LTF.m:145-156)")
    exp_tx = num_tx // num_sts
    exp_rx = num_rx // num_sts
    is_ura = num_sts > 1
    return is_ura, exp_tx, is_ura, exp_rx


def resolve_geometry(geometry: str, num_sts: int) -> str:
    """Map the config's geometry flag to a concrete layout: 'auto'
    follows helper_array_info (URA iff num_sts > 1); 'ula'/'ura' are
    manual overrides."""
    if geometry == "auto":
        return "ura" if num_sts > 1 else "ula"
    return geometry


def array_positions(n: int, geometry: str, spacing: float,
                    ncols: int = 1) -> np.ndarray:
    if resolve_geometry(geometry, max(ncols, 1)) == "ura":
        return ura_positions(n, max(ncols, 1), spacing)
    return ula_positions(n, spacing)


def steering_vectors(elem_pos_wavelengths, az_deg, el_deg):
    """MATLAB ``steervec(pos, [az; el])`` equivalent.

    Args:
      elem_pos_wavelengths: (3, n) element positions in wavelengths.
      az_deg, el_deg: (m,) angles in degrees.

    Returns:
      (n, m) complex steering matrix exp(j·2π·posᵀ·u).
    """
    az = jnp.deg2rad(jnp.asarray(az_deg))
    el = jnp.deg2rad(jnp.asarray(el_deg))
    u = jnp.stack(
        [jnp.cos(el) * jnp.cos(az), jnp.cos(el) * jnp.sin(az), jnp.sin(el)]
    )  # (3, m)
    phase = 2.0 * jnp.pi * jnp.einsum("dn,dm->nm", elem_pos_wavelengths, u)
    return jnp.exp(1j * phase).astype(jnp.complex64)


class Scenario(NamedTuple):
    """Fixed-per-experiment geometry (drawn once under the experiment seed,
    like prm.mobileRanges/mobileAngles at generate_maMIMO_LTF.m:48-51)."""

    mobile_range: jnp.ndarray   # () metres
    mobile_az: jnp.ndarray      # () degrees
    mobile_el: jnp.ndarray      # () degrees
    rx_pos: jnp.ndarray         # (3,)
    sp_loss_db: jnp.ndarray     # () free-space path loss BS→user
    tx_elem: jnp.ndarray        # (3, num_tx) metres
    rx_elem: jnp.ndarray        # (3, num_rx) metres (local)


class ChannelRealization(NamedTuple):
    """Per-packet channel draw (one phased.ScatteringMIMOChannel state)."""

    cr: jnp.ndarray          # (num_tx, num_rx, ns) complex path responses
    tau: jnp.ndarray         # (ns,) path delays [s], scatterer order
    chan_delay: jnp.ndarray  # () int32 samples


def make_scenario(cfg: SimConfig, key) -> Scenario:
    """Draw user placement; compute geometry and path loss."""
    k1, k2, k3 = jax.random.split(key, 3)
    rng = jax.random.randint(k1, (), 1, int(cfg.max_range) + 1).astype(
        jnp.float32
    )
    az = jax.random.uniform(k2, (), minval=-180.0, maxval=180.0)
    el = jax.random.uniform(k3, (), minval=-90.0, maxval=90.0)
    azr, elr = jnp.deg2rad(az), jnp.deg2rad(el)
    rx_pos = rng * jnp.stack(
        [jnp.cos(elr) * jnp.cos(azr), jnp.cos(elr) * jnp.sin(azr),
         jnp.sin(elr)]
    )
    sp_loss = fspl_db(rng, cfg.lam)
    tx_elem = jnp.asarray(array_positions(
        cfg.num_tx, cfg.tx_geometry, 0.5 * cfg.lam, cfg.num_sts))
    rx_elem = jnp.asarray(array_positions(
        cfg.num_rx, cfg.rx_geometry, 0.5 * cfg.lam, cfg.num_sts))
    return Scenario(rng, az, el, rx_pos, sp_loss, tx_elem, rx_elem)


def realize_channel(cfg: SimConfig, key, scen: Scenario) -> ChannelRealization:
    """Draw one packet's channel under ``cfg.channel_model``.

    Dispatches (statically — cfg is a hashable jit-static dataclass)
    between the one-ring scattering model and the CDL clustered delay
    line; every consumer (sounding, closed-loop regeneration, halo conv)
    sees the same ``ChannelRealization`` interface.
    """
    if cfg.channel_model not in ("scattering", "fir"):
        from mamimo_tpu.channel.cdl import realize_cdl

        return realize_cdl(cfg, key, scen)
    # 'fir' shares the one-ring realization; only the application
    # differs (apply_channel_model)
    return realize_scattering(cfg, key, scen)


def realize_scattering(cfg: SimConfig, key,
                       scen: Scenario) -> ChannelRealization:
    """Draw one packet's scatterers + gains and form path responses."""
    kp, kg = jax.random.split(key)
    ns = cfg.n_scatterers
    rad = scen.mobile_range * cfg.scat_radius_frac
    scat = scen.rx_pos[:, None] + jax.random.uniform(
        kp, (3, ns), minval=-1.0, maxval=1.0
    ) * rad                                                    # (3, ns)
    g = (
        jax.random.normal(kg, (2, ns)) / math.sqrt(2.0)
    )
    gains = (g[0] + 1j * g[1]).astype(jnp.complex64)           # CN(0,1)

    # distances Tx element -> scatterer, scatterer -> Rx element
    d_tx = jnp.linalg.norm(
        scat[:, None, :] - scen.tx_elem[:, :, None], axis=0
    )                                                          # (num_tx, ns)
    rx_glob = scen.rx_pos[:, None] + scen.rx_elem               # (3, num_rx)
    d_rx = jnp.linalg.norm(
        scat[:, None, :] - rx_glob[:, :, None], axis=0
    )                                                          # (num_rx, ns)
    d = d_tx[:, None, :] + d_rx[None, :, :]                    # (Nt, Nr, ns)
    amp = cfg.lam / (4.0 * jnp.pi * d)
    # carrier phase with argument reduction (see utils.numerics)
    phase = unit_phasor(-d / cfg.lam)
    cr = (gains[None, None, :] * amp * phase).astype(jnp.complex64)

    # reference-position path delays (tau output of helperApplyMUChannel)
    d_ref = jnp.linalg.norm(scat, axis=0) + jnp.linalg.norm(
        scat - scen.rx_pos[:, None], axis=0
    )                                                          # (ns,)
    tau = (d_ref / cfg.c_light).astype(jnp.float32)
    chan_delay = jnp.floor(jnp.min(tau) * cfg.chan_srate).astype(jnp.int32)
    return ChannelRealization(cr, tau, chan_delay)


def _signed_bins(n: int) -> np.ndarray:
    k = np.arange(n)
    return ((k + n // 2) % n) - n // 2


def apply_channel(
    cfg: SimConfig, sig, chan: ChannelRealization, fft_size: int = 16384
):
    """Pass a padded Tx signal through the scattering channel.

    Exact frequency-domain application: each path contributes
    ``cr * exp(-j·2π·k_signed·D_s / nfft)`` where D_s = τ_s·Fs is the
    (fractional) path delay in samples.

    Args:
      sig: (nsamp, num_tx) complex, already zero-padded at the tail by at
        least the maximum path delay (the caller appends
        ``cfg.num_pad_zeros`` zeros, helperApplyMUChannel.m:29-34).
      fft_size: static FFT length >= nsamp (+ delay headroom).

    Returns:
      (nsamp, num_rx) complex faded signal.
    """
    sig = jnp.asarray(sig, jnp.complex64)
    nsamp = sig.shape[0]
    assert fft_size >= nsamp, "fft_size must cover the padded signal"
    delays = chan.tau * cfg.chan_srate                         # (ns,) samples
    k = jnp.asarray(_signed_bins(fft_size), jnp.float32)       # (F,)
    ramp = unit_phasor(
        -k[:, None] * delays[None, :] / fft_size
    )                                                          # (F, ns)
    hf = jnp.einsum("mns,fs->fmn", chan.cr, ramp)              # (F, Nt, Nr)
    xf = jnp.fft.fft(sig, n=fft_size, axis=0)                  # (F, Nt)
    yf = jnp.einsum("fm,fmn->fn", xf, hf)
    y = jnp.fft.ifft(yf, axis=0)[:nsamp]
    return y.astype(jnp.complex64)


def apply_channel_model(cfg: SimConfig, sig, chan: ChannelRealization,
                        fft_size: int = 16384):
    """Channel application dispatched on ``cfg.channel_model``:

    * 'fir' — banded tapped-FIR filtering (sinc fractional-delay
      interpolated taps, parallel/halo.py), the TPU-native counterpart
      of the reference's ``comm.MIMOChannel`` 'MIMO' alternate path
      (helperApplyMUChannel.m:145-185);
    * everything else — the exact frequency-domain phase-ramp form
      (apply_channel; scattering and CDL realizations share it).
    """
    if cfg.channel_model == "fir":
        from mamimo_tpu.parallel.halo import (
            apply_channel_taps,
            channel_taps,
        )

        taps = channel_taps(cfg, chan, n_taps=cfg.fir_taps)
        return apply_channel_taps(jnp.asarray(sig, jnp.complex64), taps)
    return apply_channel(cfg, sig, chan, fft_size=fft_size)


def analytic_subcarrier_channel(
    cfg: SimConfig, chan: ChannelRealization, sync_delay=None
):
    """Exact per-subcarrier channel seen by the OFDM demodulator after
    synchronizing at ``sync_delay`` samples (defaults to chan.chan_delay).

    H(k, m, n) = Σ_s cr(m,n,s) · exp(-j·2π·b_k·(τ_s·Fs − sync)/fft)

    Returns (num_carriers, num_tx, num_rx) complex — the noise-free
    oracle the LS estimator must recover (up to the known preamble/AGC
    amplitude scale).
    """
    if sync_delay is None:
        sync_delay = chan.chan_delay
    bins = jnp.asarray(
        np.asarray(cfg.carrier_locations, np.float32) - cfg.fft_length // 2
    )
    d = chan.tau * cfg.chan_srate - sync_delay.astype(jnp.float32)
    ramp = unit_phasor(
        -bins[:, None] * d[None, :] / cfg.fft_length
    )                                                          # (C, ns)
    return jnp.einsum("mns,cs->cmn", chan.cr, ramp)
