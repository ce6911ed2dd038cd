"""CDL-style clustered delay line channel (3GPP TR 38.901 §7.7.1
structure), TPU-native.

An alternative to the reference's one-ring scattering model
(``phased.ScatteringMIMOChannel``, `helperApplyMUChannel.m:85-133`) for
the "CDL-style channel realizations" target in BASELINE.json. The
*machinery* follows TR 38.901: N clusters, each with a normalized delay,
a power, departure/arrival azimuth+zenith angles, and M = 20 rays whose
angles are the cluster angle plus a per-cluster angular spread times the
standard ray-offset table (TR 38.901 Table 7.5-3); the LOS profile adds
a deterministic direct ray with a Ricean K-factor. The built-in cluster
tables are *representative* mmWave NLOS/LOS profiles generated from a
fixed seed (exponential power-delay profile, Laplacian-ish angle
distributions) — they are NOT copies of the spec's CDL-A..E tables; a
custom `CDLProfile` can be supplied for calibrated studies.

Per packet (one `realize_cdl` call = one `prm.seed_p` draw in the
reference's contract), only the per-ray coupling phases are random; the
cluster structure is fixed per profile, and the mean AoD/AoA are
oriented along the scenario's BS→user direction. Absolute delay is the
LOS propagation delay plus `cfg.cdl_delay_spread`-scaled cluster delays,
so `chan_delay = floor(range/c · Fs)` keeps the generator's sync
contract (`helperApplyMUChannel.m:133`).

Expected per-link power is the free-space value (λ/4πd)² — cluster
powers are normalized to Σ=1 — which is what the generator's
power-accounting step measures before setting the noise floor
(`generate_maMIMO_LTF.m:218-268`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.scattering import (
    ChannelRealization,
    Scenario,
    steering_vectors,
)
from mamimo_tpu.utils.numerics import unit_phasor

# TR 38.901 Table 7.5-3: ray offset angles within a cluster (± pairs),
# in units of the per-cluster rms angular spread.
RAY_OFFSETS = np.array(
    [0.0447, 0.1413, 0.2492, 0.3715, 0.5129,
     0.6797, 0.8844, 1.1481, 1.5195, 2.1551], np.float32)
RAY_OFFSETS = np.concatenate([RAY_OFFSETS, -RAY_OFFSETS])  # (20,)
NUM_RAYS = RAY_OFFSETS.size


@dataclass(frozen=True)
class CDLProfile:
    """One clustered-delay-line table (angles relative to the LOS
    direction, delays in units of the delay spread)."""

    delays: Tuple[float, ...]      # normalized cluster delays, sorted, [0..]
    powers_db: Tuple[float, ...]   # cluster powers (will be normalized)
    aod: Tuple[float, ...]         # departure azimuth offsets [deg]
    aoa: Tuple[float, ...]         # arrival azimuth offsets [deg]
    zod: Tuple[float, ...]         # departure zenith offsets [deg]
    zoa: Tuple[float, ...]         # arrival zenith offsets [deg]
    c_asd: float                   # per-cluster departure azimuth spread
    c_asa: float                   # per-cluster arrival azimuth spread
    c_zsd: float                   # per-cluster departure zenith spread
    c_zsa: float                   # per-cluster arrival zenith spread
    los: bool = False              # prepend a deterministic LOS ray


def _make_profile(n_clusters: int, seed: int, los: bool) -> CDLProfile:
    """Deterministic representative profile: exponential PDP with
    per-cluster lognormal shadowing; angles widen with delay (later
    clusters arrive from farther off-axis)."""
    rng = np.random.default_rng(seed)
    d = np.sort(rng.exponential(1.0, n_clusters))
    d -= d[0]
    p_db = -10.0 * d * np.log10(math.e) + rng.normal(0.0, 2.0, n_clusters)
    aod = rng.normal(0.0, 25.0, n_clusters)
    aoa = rng.normal(0.0, 55.0, n_clusters)
    zod = rng.normal(0.0, 4.0, n_clusters)
    zoa = rng.normal(0.0, 8.0, n_clusters)
    return CDLProfile(
        delays=tuple(float(x) for x in d),
        powers_db=tuple(float(x) for x in p_db),
        aod=tuple(float(x) for x in aod),
        aoa=tuple(float(x) for x in aoa),
        zod=tuple(float(x) for x in zod),
        zoa=tuple(float(x) for x in zoa),
        c_asd=5.0, c_asa=11.0, c_zsd=3.0, c_zsa=7.0,
        los=los,
    )


_PROFILES = {
    "cdl_nlos": _make_profile(n_clusters=20, seed=389011, los=False),
    "cdl_los": _make_profile(n_clusters=13, seed=389012, los=True),
}


def get_profile(name: str) -> CDLProfile:
    try:
        return _PROFILES[name]
    except KeyError:
        raise ValueError(
            f"unknown CDL profile {name!r}; expected one of "
            f"{sorted(_PROFILES)} (or pass a CDLProfile to realize_cdl)"
        ) from None


def realize_cdl(cfg: SimConfig, key, scen: Scenario,
                profile: CDLProfile | None = None) -> ChannelRealization:
    """Draw one packet's CDL channel as a `ChannelRealization`.

    Random per packet: the per-ray coupling phases (C·M complex rotations
    — the static-snapshot analog of TR 38.901's random initial phases).
    Deterministic: cluster structure, array geometry, LOS ray.
    """
    prof = profile or get_profile(cfg.channel_model)
    C = len(prof.delays)

    # cluster powers, normalized so the expected per-link power is the
    # free-space (λ/4πd)² — LOS splits K/(K+1) : 1/(K+1)
    p = 10.0 ** (np.asarray(prof.powers_db, np.float64) / 10.0)
    p /= p.sum()
    if prof.los:
        k_lin = 10.0 ** (cfg.cdl_k_factor_db / 10.0)
        p = p / (1.0 + k_lin)
        p_los = k_lin / (1.0 + k_lin)

    # ray angles: cluster mean + spread × offset table, oriented so the
    # departure fan is centred on the BS→user direction and the arrival
    # fan on the user→BS direction (the Rx array is not rotated — same
    # convention as the scattering model's global frame).
    off = RAY_OFFSETS[None, :]                                # (1, M)
    az_d = np.asarray(prof.aod)[:, None] + prof.c_asd * off  # (C, M)
    az_a = np.asarray(prof.aoa)[:, None] + prof.c_asa * off
    el_d = np.asarray(prof.zod)[:, None] + prof.c_zsd * off
    el_a = np.asarray(prof.zoa)[:, None] + prof.c_zsa * off

    tx_w = scen.tx_elem / cfg.lam                             # (3, Nt)
    rx_w = scen.rx_elem / cfg.lam                             # (3, Nr)
    dep_az = scen.mobile_az + jnp.asarray(az_d.reshape(-1), jnp.float32)
    dep_el = scen.mobile_el + jnp.asarray(el_d.reshape(-1), jnp.float32)
    arr_az = scen.mobile_az + 180.0 + jnp.asarray(
        az_a.reshape(-1), jnp.float32)
    arr_el = -scen.mobile_el + jnp.asarray(el_a.reshape(-1), jnp.float32)

    a_tx = steering_vectors(tx_w, dep_az, dep_el)             # (Nt, C·M)
    a_rx = steering_vectors(rx_w, arr_az, arr_el)             # (Nr, C·M)

    # per-ray random coupling phases (the only per-packet randomness)
    phi = jax.random.uniform(key, (C * NUM_RAYS,), minval=0.0,
                             maxval=2.0 * math.pi)
    amp_ray = np.sqrt(np.repeat(p, NUM_RAYS) / NUM_RAYS).astype(np.float32)
    g = jnp.asarray(amp_ray) * jax.lax.complex(jnp.cos(phi), jnp.sin(phi))

    fspl_amp = cfg.lam / (4.0 * jnp.pi * scen.mobile_range)
    cr = jnp.einsum(
        "tp,rp,p->trp",
        a_tx, a_rx, g.astype(jnp.complex64),
    ).reshape(cfg.num_tx, cfg.num_rx, C, NUM_RAYS).sum(-1)    # (Nt, Nr, C)
    cr = (fspl_amp * cr).astype(jnp.complex64)

    tau = (jnp.asarray(prof.delays, jnp.float32) * cfg.cdl_delay_spread
           + scen.mobile_range / cfg.c_light)                 # (C,)

    if prof.los:
        # deterministic direct ray at the exact LOS angles/delay, with
        # the carrier phase of the true propagation distance
        a_t0 = steering_vectors(tx_w, scen.mobile_az[None],
                                scen.mobile_el[None])[:, 0]
        a_r0 = steering_vectors(rx_w, (scen.mobile_az + 180.0)[None],
                                (-scen.mobile_el)[None])[:, 0]
        ph0 = unit_phasor(-scen.mobile_range / cfg.lam)
        los_cr = (math.sqrt(p_los) * fspl_amp * ph0
                  * a_t0[:, None] * a_r0[None, :])
        cr = cr.at[:, :, 0].add(los_cr.astype(jnp.complex64))

    chan_delay = jnp.floor(jnp.min(tau) * cfg.chan_srate).astype(jnp.int32)
    return ChannelRealization(cr, tau, chan_delay)
