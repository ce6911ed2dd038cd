"""Fused RDMA halo exchange for the sequence-parallel channel conv.

The last SURVEY §2.4 bullet: the ppermute overlap-save convolution
(parallel/halo.py::sharded_apply_channel) moves each device's
(n_taps−1)-sample tail to its right neighbor through an XLA collective,
then CONCATENATES the received halo with the local chunk — an extra HBM
materialization of the extended block. This module fuses both into one
Pallas kernel per device: the local chunk is copied into the extended
block's body while ``pltpu.make_async_remote_copy`` RDMAs the tail
DIRECTLY into the right neighbor's halo slot over ICI — no separate
collective, no concat pass. (Reference analog: the memory-capped
symbol-chunked conv of helperApplyMUChannel.m:111-124, which this
supersedes; SNIPPETS patterns [1], [2].)

Single-chip hardware cannot run RDMA, so correctness is pinned two ways:
* the TPU **interpret machinery** (``pltpu.InterpretParams``) simulates
  the remote copies + semaphores on a CPU mesh — the parity test runs
  the kernel against the ppermute form on 4 virtual devices
  (tests/test_rdma_halo.py);
* the driver's ``dryrun_multichip`` compiles+runs it on the N-device
  CPU mesh every round.

Layout note for real-ICI runs: the block rides VMEM whole (grid=()),
(2, chunk+halo, Nt) float32 planes ≈ 1.4 MB at the dryrun shapes; the
Nt lane dim (32) under-fills the 128-lane tile — acceptable for a
DMA-dominated kernel (the conv matmuls happen outside, on the
extended block XLA already has in registers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from mamimo_tpu.config import SimConfig


def _halo_kernel(ids_ref, x_ref, out_ref, send_sem, recv_sem, *,
                 halo: int, chunk: int, zero_first: bool):
    """Per-device body: out = [left-neighbor tail ‖ local chunk].

    ids_ref (SMEM): [my_index, right_neighbor, left_neighbor].
    x_ref:   (2, chunk, nt) local planes.
    out_ref: (2, halo+chunk, nt) extended planes.
    """
    my = ids_ref[0]
    right = ids_ref[1]
    left = ids_ref[2]

    # neighbor barrier: an RDMA must not land before its destination
    # kernel is live (pallas guide, "Local Barrier Between Neighbors")
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    # local body copy (disjoint from the incoming halo region)
    out_ref[:, halo:, :] = x_ref[:]

    # my tail -> right neighbor's halo slot, directly over ICI
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, chunk - halo:, :],
        dst_ref=out_ref.at[:, :halo, :],
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()

    if zero_first:
        # device 0 has no left neighbor in a LINEAR convolution: its
        # halo (the ring copy from device d−1) is zeroed after arrival
        @pl.when(my == 0)
        def _():
            out_ref[:, :halo, :] = jnp.zeros_like(out_ref[:, :halo, :])


def halo_exchange_pallas(planes, halo: int, *, axis: str,
                         interpret=None):
    """Build the overlap-save extended block with a fused RDMA exchange.

    Must be called INSIDE shard_map with `planes` the device-local
    (2, chunk, nt) float32 planes of the time-sharded signal.

    Args:
      planes: (2, chunk, nt) float32 — this device's slice.
      halo: n_taps − 1 overlap samples.
      interpret: pltpu.InterpretParams() off-TPU (simulates the remote
        copies + semaphores), False/None on real hardware.

    Returns:
      (2, halo+chunk, nt) float32 extended block.
    """
    _, chunk, nt = planes.shape
    assert halo < chunk, "chunk must exceed the channel memory"
    i = jax.lax.axis_index(axis)
    d = jax.lax.axis_size(axis)
    ids = jnp.stack([i, (i + 1) % d, (i - 1) % d]).astype(jnp.int32)

    kern = functools.partial(_halo_kernel, halo=halo, chunk=chunk,
                             zero_first=True)
    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, halo + chunk, nt),
                                       jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7),
        interpret=interpret if interpret is not None else False,
    )(ids, planes)


def sharded_apply_channel_rdma(cfg: SimConfig, mesh: Mesh, sig, taps,
                               axis: str = "seq", interpret=None):
    """sharded_apply_channel with the halo exchange + extended-block
    build fused into one Pallas RDMA kernel (same contract / output as
    parallel/halo.py::sharded_apply_channel; parity-tested).

    Args:
      sig: (N, Nt) complex64, N divisible by mesh.shape[axis].
      taps: (T, Nt, Nr) complex64 impulse response.
      interpret: auto (None) = InterpretParams off-TPU.
    """
    d = mesh.shape[axis]
    n = sig.shape[0]
    assert n % d == 0, "time axis must divide over the mesh"
    chunk = n // d
    t = taps.shape[0]
    halo = t - 1
    if interpret is None:
        interpret = (pltpu.InterpretParams()
                     if jax.default_backend() != "tpu" else False)

    def local(sig_blk, taps_rep):
        pl2 = jnp.stack([jnp.real(sig_blk), jnp.imag(sig_blk)])
        ext2 = halo_exchange_pallas(pl2, halo, axis=axis,
                                    interpret=interpret)
        ext = jax.lax.complex(ext2[0], ext2[1])          # (halo+chunk, Nt)
        size = chunk + 2 * halo
        xf = jnp.fft.fft(ext, n=size, axis=0)
        hf = jnp.fft.fft(taps_rep, n=size, axis=0)
        yf = jnp.einsum("fm,fmn->fn", xf, hf)
        y = jnp.fft.ifft(yf, axis=0)
        return y[halo:halo + chunk].astype(jnp.complex64)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return shard(jnp.asarray(sig, jnp.complex64),
                 jnp.asarray(taps, jnp.complex64))
