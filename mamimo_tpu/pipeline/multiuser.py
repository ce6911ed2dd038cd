"""Multi-user scenario + sounding (the numUsers > 1 machinery of
generate_maMIMO_LTF.m:22-26,234-386).

Each user gets an independent placement, path loss and per-packet
scattering channel; all users hear the same sounding preamble. The
per-user dimension is a vmapped leading axis, not a loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.scattering import (
    ChannelRealization,
    Scenario,
    make_scenario,
)
from mamimo_tpu.ops.ltf import gen_preamble
from mamimo_tpu.pipeline.sounding import SoundingResult, sound_packet


def make_scenarios(cfg: SimConfig, key) -> Scenario:
    """Stacked per-user scenarios (leading axis num_users)."""
    keys = jax.random.split(key, cfg.num_users)
    return jax.vmap(lambda k: make_scenario(cfg, k))(keys)


def index_user(scen: Scenario, u: int) -> Scenario:
    """Select one user's scenario from a stacked Scenario."""
    return Scenario(*[x[u] for x in scen])


def user_packet_key(pkt_key, u: int):
    """Per-(packet, user) channel key (the prm.seed_p{u}(pkt) contract)."""
    return jax.random.fold_in(pkt_key, 1000 + u)


def sound_packet_mu(
    cfg: SimConfig,
    key,
    scens: Scenario,
    snr_db,
    preamble=None,
    with_mmse: bool = False,
    noise_mode: str = "snr",
    fft_size: int = 16384,
) -> Tuple[SoundingResult, ChannelRealization]:
    """Sound one packet to every user. Returns results stacked on a
    leading user axis."""
    if preamble is None:
        preamble = gen_preamble(cfg, cfg.num_tx)

    def one(scen_u, k_u):
        return sound_packet(
            cfg, k_u, scen_u, snr_db, preamble=preamble,
            with_mmse=with_mmse, noise_mode=noise_mode, fft_size=fft_size,
        )

    keys = jnp.stack([user_packet_key(key, u)
                      for u in range(cfg.num_users)])
    return jax.vmap(one)(scens, keys)
