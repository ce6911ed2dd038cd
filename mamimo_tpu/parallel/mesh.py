"""Mesh construction.

The reference has no distributed story at all (SURVEY.md §2.4 — its only
concurrency is `screen` process fanout over SNR levels). Here the
parallel axes are native:

  * ``data``  — packets × antenna-pair samples (DP; gradient psum
                rides ICI)
  * ``model`` — hidden units of the MLP (TP: column-parallel first
                layer, row-parallel second layer)
  * ``seq``   — OFDM-symbol blocks of the 10240-sample preamble
                (sequence parallelism; the LS despread reduces over
                symbols, so the cross-shard state is one psum)
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Mapping[str, int] | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Build a mesh from {axis: size}; sizes must multiply to #devices.

    Default: all devices on a single 'data' axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh {dict(axes)} needs {int(np.prod(shape))} devices, "
            f"got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)
