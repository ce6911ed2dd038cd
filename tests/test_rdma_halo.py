"""Parity of the fused Pallas RDMA halo exchange (SURVEY §2.4's
"pltpu.make_async_remote_copy fused halo" bullet) against both the
ppermute overlap-save form and the unsharded tap-convolution oracle.

RDMA cannot run on a CPU mesh natively; the TPU interpret machinery
(pltpu.InterpretParams) simulates the remote copies + semaphores, so
the cross-device dataflow (tail -> right neighbor's halo slot, device-0
zeroing, barrier) is exercised for real across the virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig
from mamimo_tpu.parallel.mesh import make_mesh

N_DEV = 4


def _mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 4 virtual devices")
    return make_mesh({"seq": N_DEV}, devices=jax.devices()[:N_DEV])


@pytest.fixture(scope="module")
def problem():
    cfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=8)
    key = jax.random.PRNGKey(0)
    from mamimo_tpu.channel.scattering import make_scenario, realize_channel
    from mamimo_tpu.parallel.halo import channel_taps

    scen = make_scenario(cfg, key)
    chan = realize_channel(cfg, key, scen)
    taps = channel_taps(cfg, chan, n_taps=128)
    n = N_DEV * 320
    z = jax.random.normal(jax.random.PRNGKey(1), (n, cfg.num_tx, 2))
    sig = jax.lax.complex(z[..., 0], z[..., 1])
    return cfg, sig, taps


def test_rdma_matches_ppermute(problem):
    from mamimo_tpu.parallel.halo import sharded_apply_channel
    from mamimo_tpu.parallel.rdma_halo import sharded_apply_channel_rdma

    cfg, sig, taps = problem
    mesh = _mesh()
    ref = np.asarray(sharded_apply_channel(cfg, mesh, sig, taps))
    got = np.asarray(sharded_apply_channel_rdma(cfg, mesh, sig, taps))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_rdma_matches_unsharded_oracle(problem):
    from mamimo_tpu.parallel.halo import apply_channel_taps
    from mamimo_tpu.parallel.rdma_halo import sharded_apply_channel_rdma

    cfg, sig, taps = problem
    mesh = _mesh()
    ref = np.asarray(apply_channel_taps(sig, taps))
    got = np.asarray(sharded_apply_channel_rdma(cfg, mesh, sig, taps))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_halo_block_structure(problem):
    """The fused kernel's extended block is exactly
    [left tail ‖ local chunk] (zeros on device 0) — checked directly,
    independent of the convolution that consumes it."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    from mamimo_tpu.parallel.rdma_halo import halo_exchange_pallas

    cfg, sig, _ = problem
    mesh = _mesh()
    halo = 96
    n, nt = sig.shape
    chunk = n // N_DEV
    planes = jnp.stack([jnp.real(sig), jnp.imag(sig)])     # (2, N, Nt)

    def local(pl2):
        return halo_exchange_pallas(
            pl2, halo, axis="seq",
            interpret=pltpu.InterpretParams())

    ext = jax.shard_map(
        local, mesh=mesh, in_specs=P(None, "seq", None),
        out_specs=P(None, "seq", None), check_vma=False,
    )(planes)
    ext = np.asarray(ext).reshape(2, N_DEV, halo + chunk, nt)
    pl_np = np.asarray(planes).reshape(2, N_DEV, chunk, nt)
    for dev in range(N_DEV):
        np.testing.assert_array_equal(ext[:, dev, halo:], pl_np[:, dev])
        if dev == 0:
            np.testing.assert_array_equal(ext[:, 0, :halo], 0.0)
        else:
            np.testing.assert_array_equal(
                ext[:, dev, :halo], pl_np[:, dev - 1, -halo:])
