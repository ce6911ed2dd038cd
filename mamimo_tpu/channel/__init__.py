"""Scenario geometry, scattering/CDL MIMO channels and receiver noise
chain."""

from mamimo_tpu.channel.cdl import (  # noqa: F401
    CDLProfile,
    get_profile,
    realize_cdl,
)

from mamimo_tpu.channel.scattering import (  # noqa: F401
    Scenario,
    ChannelRealization,
    make_scenario,
    realize_channel,
    apply_channel,
    apply_channel_model,
    analytic_subcarrier_channel,
    steering_vectors,
    fspl_db,
)
from mamimo_tpu.channel.noise import receiver_chain, sync_slice  # noqa: F401
