"""Sharded compute paths: sequence-parallel LS estimation and a
DP+TP training step.

Greenfield distributed design (the reference has none, SURVEY.md §2.4):

* ``sharded_ls_estimate`` — shard_map over the ``seq`` axis: the
  preamble's LTF symbols are distributed across devices at clean
  320-sample symbol boundaries; each device FFT-demods its local symbols
  and computes a *partial* P-despread, and a single ``psum`` over ICI
  completes the estimate. This is the time-block sharding called for by
  BASELINE.json config 5 — the despread *is* the block-boundary
  reduction, so no halo exchange is needed for the sounding path.

* ``make_sharded_train_step`` — jit over a (data, model) mesh: batch on
  ``data`` (gradient allreduce inserted by XLA), MLP hidden dim on
  ``model`` (column-parallel layer 0, row-parallel layer 1 → XLA inserts
  the reduce-scatter/all-reduce pair), stacked real/imag axis replicated.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mamimo_tpu.config import SimConfig, TrainConfig



# ----------------------------------------------------------------------
# Sequence-parallel LS estimation
# ----------------------------------------------------------------------

def sharded_ls_estimate(cfg: SimConfig, mesh: Mesh, rx, axis: str = "seq"):
    """LS channel estimation with the preamble sharded over OFDM symbols.

    Args:
      mesh: mesh containing ``axis`` (num_tx must be divisible by its
        size).
      rx: (B, len_ltf, num_rx) complex received preambles (replicated or
        sharded on batch — only the symbol axis is repartitioned here).

    Returns:
      (B, C, num_tx, num_rx) complex LS estimate, fully replicated.
    """
    from mamimo_tpu.ops.ltf import _hadamard_np, _ltf_np

    n_shard = mesh.shape[axis]
    nsym = cfg.num_tx
    assert nsym % n_shard == 0, "num_tx symbols must divide over seq axis"
    loc = nsym // n_shard
    # NumPy constant sources (jit-safe at trace time)
    P_full = _hadamard_np(cfg.num_tx)                        # (T, nltf)
    ltf = _ltf_np(cfg.fft_length)[np.asarray(cfg.carrier_locations)]
    carr = np.asarray(cfg.carrier_locations, np.int32)

    def local(rx_blk):
        # rx_blk: (B, loc*sym_len, R) — this device's symbols
        b, _, r = rx_blk.shape
        x = rx_blk.reshape(b, loc, cfg.sym_len, r)[:, :, cfg.cp_length:, :]
        X = jnp.fft.fftshift(jnp.fft.fft(x, axis=2), axes=2)
        X = X[:, :, carr, :]                                 # (B, loc, C, R)
        i = jax.lax.axis_index(axis)
        # this device's columns of the despreading matrix
        p_loc = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(P_full), i * loc, loc, axis=1
        )                                                    # (T, loc)
        part = jnp.einsum("bncr,jn->bcjr", X, p_loc.astype(X.dtype))
        total = jax.lax.psum(part, axis)
        denom = (nsym * ltf).astype(jnp.float32)
        return total / denom[None, :, None, None]

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(),
        check_vma=False,
    )
    return shard(jnp.asarray(rx, jnp.complex64))


def sharded_ls_pallas_v2(cfg: SimConfig, mesh: Mesh, planes,
                         mode: str = "data", data_axis: str = "data",
                         seq_axis: str = "seq",
                         block_samples: int = 8,
                         interpret: bool | None = None):
    """The PRODUCTION fused LS kernel (ls_planes_pallas_v2) under
    shard_map — the composition real multi-chip serving would run
    (VERDICT r3: everything sharded previously exercised only the XLA
    forms).

    Args:
      planes: (2, S, len_ltf) float32 canonical planes (S = B·num_rx).
      mode:
        'data' — S shards over ``data_axis``; each device runs the v2
          kernel on its local samples; no collective (embarrassingly
          parallel serving).
        'seq'  — the preamble's time axis shards over ``seq_axis`` at
          OFDM-symbol boundaries; each device DFT-demods its local
          symbols inside the kernel and computes a PARTIAL despread
          with the rectangular K = I ⊗ P[:, local symbol cols]; one
          psum over ICI completes the estimate (the same partial-
          despread+psum contract as sharded_ls_estimate, now with the
          Pallas kernel doing the on-device work).

    Returns:
      (S, num_tx, num_carriers) complex64 rx-major (ls_estimate_planes
      convention): 'data' output sharded on S, 'seq' replicated.
    """
    from mamimo_tpu.ops.ltf import _hadamard_np
    from mamimo_tpu.ops.pallas.fused_ls import (
        ls_planes_pallas_v2,
        ls_planes_pallas_v2_constants,
        ls_v2_to_complex,
    )

    _, s, L = planes.shape
    nsym = cfg.num_tx
    if mode == "data":
        n_shard = mesh.shape[data_axis]
        assert s % n_shard == 0
        s_loc = s // n_shard
        consts = ls_planes_pallas_v2_constants(cfg, block_samples)

        def local(pl_blk):
            h, _ = ls_planes_pallas_v2(cfg, pl_blk, consts,
                                       block_samples=block_samples,
                                       interpret=interpret)
            return ls_v2_to_complex(cfg, h, s_loc)

        shard = jax.shard_map(
            local, mesh=mesh,
            in_specs=P(None, data_axis, None),
            out_specs=P(data_axis, None, None),
            check_vma=False,
        )
        return shard(planes)

    assert mode == "seq", mode
    n_shard = mesh.shape[seq_axis]
    assert nsym % n_shard == 0
    loc = nsym // n_shard
    P_full = jnp.asarray(_hadamard_np(nsym), jnp.float32)
    b_const, _ = ls_planes_pallas_v2_constants(cfg, block_samples)
    eye = jnp.eye(block_samples, dtype=jnp.float32)

    def local(pl_blk):
        # pl_blk: (2, S, loc·sym_len) — this device's symbols; build the
        # rectangular partial-despread K from this shard's P columns
        i = jax.lax.axis_index(seq_axis)
        p_cols = jax.lax.dynamic_slice_in_dim(
            P_full, i * loc, loc, axis=1)             # (nsym, loc)
        k_loc = jnp.kron(eye, p_cols)                 # (bs·nsym, bs·loc)
        h, _ = ls_planes_pallas_v2(cfg, pl_blk, (b_const, k_loc),
                                   block_samples=block_samples,
                                   interpret=interpret)
        h = jax.lax.psum(h, seq_axis)                 # complete despread
        return ls_v2_to_complex(cfg, h, s)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, None, seq_axis),
        out_specs=P(),
        check_vma=False,
    )
    return shard(planes)


def sharded_predict_all_pairs(cfg, tcfg, mesh: Mesh, params, bn_state, rx,
                              axis: str = "antenna", dtype=None):
    """All-pairs DNN inference with the Tx-pilot dimension sharded.

    The Nt·Nr antenna pairs are the natural "expert-like" axis
    (SURVEY.md §2.4): each of the num_tx pilot columns is an independent
    head over the shared signal projection, so device d computes the
    pairs for its slice of Tx antennas and the output concatenates over
    the mesh axis with no collective at all (the shared layer-1 signal
    matmul is replicated work, ~1/32 of total FLOPs).

    Args:
      rx: (B, len_ltf, num_rx) complex64 (replicated).

    Returns:
      (B, C, num_tx, num_rx) complex64, sharded on the num_tx dim.
    """
    from mamimo_tpu.models.mlp import factored_plane_apply
    from mamimo_tpu.ops.ltf import _hadamard_np

    n_shard = mesh.shape[axis]
    ntx = cfg.num_tx
    assert ntx % n_shard == 0
    loc = ntx // n_shard
    P_full = jnp.asarray(_hadamard_np(ntx), jnp.float32)   # (T, nltf)

    def local(rx_rep):
        i = jax.lax.axis_index(axis)
        p_loc = jax.lax.dynamic_slice_in_dim(P_full, i * loc, loc, axis=0)

        # factored inference with this device's pilot rows (heads)
        b, L, nrx = rx_rep.shape
        sig2 = jnp.transpose(rx_rep, (0, 2, 1)).reshape(b * nrx, L)
        planes = jnp.stack([jnp.real(sig2), jnp.imag(sig2)])

        y2 = jax.vmap(
            lambda pp, bb, x: factored_plane_apply(tcfg, pp, bb, x, p_loc,
                                                   dtype=dtype)
        )(params, bn_state, planes)                   # (2, S, loc, C)
        y = jax.lax.complex(y2[0], y2[1])
        y = y.reshape(b, nrx, loc, cfg.num_carriers)
        return jnp.transpose(y, (0, 3, 2, 1))         # (b, C, loc, nrx)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return shard(jnp.asarray(rx, jnp.complex64))


def sharded_estimate_combined(cfg: SimConfig, tcfg: TrainConfig,
                              mesh: Mesh, params, bn_state, rx,
                              data_axis: str = "data",
                              seq_axis: str = "seq",
                              ant_axis: str = "antenna",
                              dtype=None):
    """The full fused estimation step (LS + factored all-pairs DNN) over
    ONE 3-axis (data × seq × antenna) mesh — the combined sharding the
    separate paths above exercise individually:

    * ``data``: packets — embarrassingly parallel;
    * ``seq``: the 10240-sample preamble split at OFDM-symbol boundaries.
      Each device holds loc_sym symbols and contributes (a) a partial
      P-despread for LS and (b) a partial layer-1 signal contraction
      ``x_loc @ W1[rows_loc]`` for the DNN — each completed by one
      ``psum`` over the seq axis (ICI);
    * ``antenna``: the num_tx pilot heads — collective-free (each device
      finishes the MLP for its slice of Tx antennas).

    Args:
      rx: (B, len_ltf, num_rx) complex64; B % mesh.shape[data] == 0.

    Returns:
      (h_ls, h_dnn), each (B, C, num_tx, num_rx) complex64 — h_ls
      replicated over seq/antenna, h_dnn concatenated over the antenna
      axis, both sharded on B over data.
    """
    from mamimo_tpu.models.mlp import factored_heads_apply
    from mamimo_tpu.ops.ltf import _hadamard_np, _ltf_np

    n_seq = mesh.shape[seq_axis]
    n_ant = mesh.shape[ant_axis]
    nsym = cfg.num_tx
    assert nsym % n_seq == 0 and nsym % n_ant == 0
    loc_sym = nsym // n_seq
    loc_heads = nsym // n_ant
    l_loc = loc_sym * cfg.sym_len
    P_full = jnp.asarray(_hadamard_np(nsym), jnp.float32)    # (T, nltf)
    ltf = _ltf_np(cfg.fft_length)[np.asarray(cfg.carrier_locations)]
    carr = np.asarray(cfg.carrier_locations, np.int32)

    def local(p, bn, rx_blk):
        # rx_blk: (B_loc, loc_sym*sym_len, R) — this device's symbols
        b, _, r = rx_blk.shape
        i_seq = jax.lax.axis_index(seq_axis)
        i_ant = jax.lax.axis_index(ant_axis)

        # ---- LS: partial despread over local symbols, psum over seq
        x = rx_blk.reshape(b, loc_sym, cfg.sym_len, r)[:, :, cfg.cp_length:]
        X = jnp.fft.fftshift(jnp.fft.fft(x, axis=2), axes=2)[:, :, carr, :]
        p_cols = jax.lax.dynamic_slice_in_dim(
            P_full, i_seq * loc_sym, loc_sym, axis=1)        # (T, loc)
        part = jnp.einsum("bncr,jn->bcjr", X, p_cols.astype(X.dtype))
        h_ls = jax.lax.psum(part, seq_axis) / (
            nsym * ltf).astype(jnp.float32)[None, :, None, None]

        # ---- DNN: partial layer-1 contraction over local signal rows,
        # psum over seq; pilot heads local to the antenna shard
        sig2 = jnp.transpose(rx_blk, (0, 2, 1)).reshape(b * r, l_loc)
        planes = jnp.stack([jnp.real(sig2), jnp.imag(sig2)])
        pil_rows = jax.lax.dynamic_slice_in_dim(
            P_full, i_ant * loc_heads, loc_heads, axis=0)    # (loc_h, T)

        def plane_fn(pp, bb, xpl):
            w1 = pp["dense"][0]["w"]
            if dtype is not None:
                w1, xpl = w1.astype(dtype), xpl.astype(dtype)
            w1_loc = jax.lax.dynamic_slice_in_dim(
                w1, i_seq * l_loc, l_loc, axis=0)
            sig_proj = jax.lax.psum(
                jnp.matmul(xpl, w1_loc,
                           preferred_element_type=jnp.float32),
                seq_axis)                                    # (S, H)
            return factored_heads_apply(tcfg, pp, bb, sig_proj, pil_rows,
                                        cfg.len_ltf, dtype=dtype)

        y2 = jax.vmap(plane_fn)(p, bn, planes)     # (2, S, loc_h, C)
        y = jax.lax.complex(y2[0], y2[1])
        y = y.reshape(b, r, loc_heads, cfg.num_carriers)
        return h_ls, jnp.transpose(y, (0, 3, 2, 1))

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(data_axis, seq_axis, None)),
        out_specs=(P(data_axis, None, None, None),
                   P(data_axis, None, ant_axis, None)),
        check_vma=False,
    )
    return shard(params, bn_state, jnp.asarray(rx, jnp.complex64))


# ----------------------------------------------------------------------
# DP + TP training step
# ----------------------------------------------------------------------

def param_shardings(mesh: Mesh, params: Any, bn_state: Any,
                    model_axis: str = "model"):
    """NamedShardings for the stacked MLP: layer-0 weight column-parallel,
    layer-1+ row/column alternating, BN vectors follow their layer's
    output sharding. The stacked (real/imag) leading axis is replicated.
    """
    has_model = model_axis in mesh.axis_names

    def w_spec(i):
        if not has_model:
            return P()
        # alternate column-parallel / row-parallel
        return (P(None, None, model_axis) if i % 2 == 0
                else P(None, model_axis, None))

    def b_spec(i):
        if not has_model:
            return P()
        # biases live on the layer output: sharded for col-parallel
        return (P(None, model_axis) if i % 2 == 0 else P(None))

    ns = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
    p_sh = {
        "dense": [
            {"w": ns(w_spec(i)), "b": ns(b_spec(i))}
            for i in range(len(params["dense"]))
        ],
        "out": {"w": ns(P(None, None, None)), "b": ns(P(None))},
        "bn": [
            {"scale": ns(b_spec(i)), "bias": ns(b_spec(i))}
            for i in range(len(params["bn"]))
        ],
    }
    bn_sh = {
        "mean": [ns(b_spec(i)) for i in range(len(bn_state["mean"]))],
        "var": [ns(b_spec(i)) for i in range(len(bn_state["var"]))],
    }
    return p_sh, bn_sh


def make_sharded_train_step(cfg: SimConfig, tcfg: TrainConfig, mesh: Mesh,
                            data_axis: str = "data",
                            model_axis: str = "model",
                            avg_sig_pow: float = 0.0):
    """Build a jitted DP+TP train step over `mesh`.

    Returns (init_fn, step_fn):
      init_fn(key) -> (params, bn_state, opt_state) placed on the mesh
      step_fn(params, bn_state, opt_state, x2, pilot, y2, key, lr)
        -> (params, bn_state, opt_state, loss_per_plane)
    with x2 (2, B, len) / pilot (B, num_tx) / y2 (2, B, C) sharded on
    the batch dim over ``data_axis``.
    """
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.train.loop import make_batch_update, make_optimizer

    opt = make_optimizer(tcfg)
    batch_sh = NamedSharding(mesh, P(None, data_axis))
    pilot_sh = NamedSharding(mesh, P(data_axis))

    def init_fn(key):
        params, bn_state = init_stacked(key, cfg, tcfg)
        p_sh, bn_sh = param_shardings(mesh, params, bn_state, model_axis)
        params = jax.tree.map(jax.device_put, params, p_sh)
        bn_state = jax.tree.map(jax.device_put, bn_state, bn_sh)
        opt_state = opt.init(params)
        return params, bn_state, opt_state

    def constrain(x2, pilot, y2):
        x2 = jax.lax.with_sharding_constraint(x2, batch_sh)
        y2 = jax.lax.with_sharding_constraint(y2, batch_sh)
        pilot = jax.lax.with_sharding_constraint(pilot, pilot_sh)
        return x2, pilot, y2

    # the one shared step semantics (train/loop.py::make_batch_update);
    # the mesh path only adds the batch sharding constraints — XLA then
    # inserts the DP gradient allreduce / TP reduce-scatter pairs
    update, eval_core = make_batch_update(cfg, tcfg, avg_sig_pow, opt,
                                          constrain=constrain)
    _jit_step = functools.partial(jax.jit, donate_argnums=(0, 1, 2))(update)

    def step_fn(*a, **kw):
        return _jit_step(*a, **kw)

    # in-jit gather variants: batch assembly as device gathers from the
    # (replicated) dataset instead of per-step host NumPy indexing —
    # the same fast path the single-chip fit uses (train/loop.py
    # ::_gather_batch), now available under the mesh
    from mamimo_tpu.train.loop import _gather_batch

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def gather_step(params, bn_state, opt_state, data, idx, key, lr):
        x2, pilot, y2 = _gather_batch(cfg, data, idx)
        return update(params, bn_state, opt_state, x2, pilot, y2, key, lr)

    @jax.jit
    def gather_eval(params, bn_state, data, idx):
        x2, pilot, y2 = _gather_batch(cfg, data, idx)
        return eval_core(params, bn_state, x2, pilot, y2)

    step_fn.gather = gather_step
    step_fn.gather_eval = gather_eval
    # array-input eval (host-streamed batches arrive pre-sharded via
    # device_put; the constraint in eval_core keeps them on `data`)
    step_fn.array_eval = jax.jit(eval_core)
    step_fn.batch_sharding = batch_sh
    step_fn.pilot_sharding = pilot_sh
    return init_fn, step_fn
