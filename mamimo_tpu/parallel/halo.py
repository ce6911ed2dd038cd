"""Sequence-parallel time-domain channel convolution with halo exchange.

The long-context analog for this workload (SURVEY.md §5): the Tx sample
stream is sharded across devices along time, and applying the channel's
FIR response needs each device to see the *tail of its left neighbor's
chunk* (the overlap-save halo — the ring-attention-style neighbor
exchange, here one `ppermute` of tap-length samples over ICI).

Two pieces:

* ``channel_taps`` — a banded impulse-response representation of the
  scattering channel (windowed-sinc fractional-delay interpolation of
  each path, the counterpart of MATLAB's interpolated channel filter);
* ``sharded_apply_channel`` — shard_map over the time axis: halo
  exchange + local FFT overlap-save convolution. Matches the unsharded
  tap convolution exactly and the exact phase-ramp ``apply_channel`` to
  band-limitation tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mamimo_tpu.config import SimConfig
from mamimo_tpu.channel.scattering import ChannelRealization


def channel_taps(cfg: SimConfig, chan: ChannelRealization,
                 n_taps: int = 512):
    """Impulse response h[d, m, n] = Σ_s cr(m,n,s)·sinc(d − τ_s·Fs).

    Full-length sinc interpolation (no window): on the sounding grid the
    reconstruction error is limited by the sinc tail beyond n_taps,
    which num_pad_zeros comfortably covers for the default geometry.
    """
    delays = chan.tau * cfg.chan_srate                  # (ns,) samples
    d = jnp.arange(n_taps, dtype=jnp.float32)
    w = jnp.sinc(d[None, :] - delays[:, None])          # (ns, n_taps)
    return jnp.einsum("mns,sd->dmn", chan.cr, w.astype(jnp.complex64))


def apply_channel_taps(sig, taps):
    """Unsharded linear convolution via FFT (oracle for the sharded
    version). sig (N, Nt), taps (T, Nt, Nr) -> (N, Nr)."""
    n = sig.shape[0]
    t = taps.shape[0]
    size = n + t
    xf = jnp.fft.fft(sig, n=size, axis=0)
    hf = jnp.fft.fft(taps, n=size, axis=0)
    yf = jnp.einsum("fm,fmn->fn", xf, hf)
    return jnp.fft.ifft(yf, axis=0)[:n].astype(jnp.complex64)


def sharded_apply_channel(cfg: SimConfig, mesh: Mesh, sig, taps,
                          axis: str = "seq"):
    """Overlap-save convolution with the time axis sharded over `axis`.

    Each device ppermutes the last (n_taps−1) samples of its chunk to
    its right neighbor (the halo), prepends the received halo, does a
    local FFT convolution and keeps the valid region.

    Args:
      sig: (N, Nt) complex64, N divisible by mesh.shape[axis].
      taps: (T, Nt, Nr) complex64 impulse response.

    Returns:
      (N, Nr) complex64 — bit-close to apply_channel_taps(sig, taps).
    """
    d = mesh.shape[axis]
    n = sig.shape[0]
    assert n % d == 0, "time axis must divide over the mesh"
    chunk = n // d
    t = taps.shape[0]
    halo = t - 1
    assert halo < chunk, "chunk must exceed the channel memory"

    def local(sig_blk, taps_rep):
        # sig_blk: (chunk, Nt) — this device's time slice
        i = jax.lax.axis_index(axis)
        # send my tail to the right neighbor (right shift of halos)
        tail = sig_blk[-halo:]
        perm = [(j, (j + 1) % d) for j in range(d)]
        recv = jax.lax.ppermute(tail, axis, perm)
        # device 0 has no left neighbor: its halo is zeros
        recv = jnp.where(i == 0, jnp.zeros_like(recv), recv)
        ext = jnp.concatenate([recv, sig_blk], axis=0)   # (halo+chunk, Nt)
        size = chunk + 2 * halo
        xf = jnp.fft.fft(ext, n=size, axis=0)
        hf = jnp.fft.fft(taps_rep, n=size, axis=0)
        yf = jnp.einsum("fm,fmn->fn", xf, hf)
        y = jnp.fft.ifft(yf, axis=0)
        # valid output for absolute positions [i*chunk, (i+1)*chunk):
        # position p of ext corresponds to absolute i*chunk − halo + p
        return y[halo:halo + chunk].astype(jnp.complex64)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return shard(jnp.asarray(sig, jnp.complex64),
                 jnp.asarray(taps, jnp.complex64))
