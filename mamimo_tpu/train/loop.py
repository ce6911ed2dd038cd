"""Training loop for the CSI denoiser.

Replaces the Keras fit of ``massiveMIMO_CSI_prediction_DNN.py:283-328``:

* batch assembly happens **inside jit** as device gathers (replacing the
  per-sample Python dict-lookup hot loop of
  ``massiveMIMO_dataGenerator.py:294-316``);
* the on-the-fly AWGN of the ``changeNoisePower`` callback + GaussianNoise
  layer (``:86-102,191-193,295-308``) is a per-batch noise draw fused into
  the training step: SNR ∈ awgn_snr_levels, per-plane noise std
  ``sqrt(avg_sig_pow / 10^(SNR/10)) / sqrt(2)``;
* both real/imag planes train simultaneously (stacked leading axis)
  instead of two sequential fits;
* EarlyStopping(patience=25, restore_best_weights) and
  ReduceLROnPlateau(factor=0.1, patience=20, min_lr=lr/100) semantics are
  reproduced per plane / on the summed val loss (``:285-286``).
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import (
    init_stacked,
    preprocess_input,
    stacked_apply,
)
from mamimo_tpu.pipeline.dataset import CSIDataset
from mamimo_tpu.train.ckpt import save_checkpoint


class TrainResult(NamedTuple):
    params: Any
    bn_state: Any
    history: Dict[str, list]
    best_val: np.ndarray      # (2,) best val loss per plane
    epochs_ran: int


def _device_data(ds: CSIDataset):
    """Device training container: complex (B, L, R) / (B, C, T, R).

    A "gather-friendly" planes relayout ((2, B, R, L) contiguous rows,
    no per-step real/imag split) was tried in round 4 and REVERTED on
    measurement: identical at batch 1024, 0.33 ms/step SLOWER at batch
    2048 (4.06 vs 3.73 ms, results/train_scaling_r4b.log vs
    train_scaling_r4.log) — XLA's gather over the complex layout
    amortizes the antenna-minor stride across the batch better than
    the planes form's two far-apart plane reads."""
    from mamimo_tpu.utils.numerics import put_complex

    return {
        "rx": put_complex(ds.rx),                   # (B, L, R) complex64
        "h": put_complex(ds.h_ls),                  # (B, C, T, R) complex64
        "P": jnp.asarray(ds.pilot_matrix(), jnp.float32),  # (T, T)
    }


def _gather_batch(cfg: SimConfig, data, idx):
    """Sample indices -> ((2,bs,L) planes, (bs,T) pilots, (2,bs,C) labels).

    Ordering contract: idx = p*(R*T) + r*T + t
    (create_massiveMIMO_CSIest_dnn_dataset.py:62).
    """
    per_pkt = cfg.num_tx * cfg.num_rx
    p = idx // per_pkt
    rem = idx % per_pkt
    r = rem // cfg.num_tx
    t = rem % cfg.num_tx
    sig = data["rx"][p, :, r]                        # (bs, L) complex
    pilot = data["P"].T[t]                           # (bs, T)
    y = data["h"][p, :, t, r]                        # (bs, C) complex
    x2 = jnp.stack([jnp.real(sig), jnp.imag(sig)])   # (2, bs, L)
    y2 = jnp.stack([jnp.real(y), jnp.imag(y)])       # (2, bs, C)
    return x2, pilot, y2


def _split_indices(ds: CSIDataset, tcfg: TrainConfig):
    """By-packet tail validation split (massiveMIMO_dataGenerator.py:47-55)."""
    per_pkt = ds.cfg.num_tx * ds.cfg.num_rx
    n_pkts = ds.num_packets
    n_val_pkts = int(np.floor(n_pkts * tcfg.val_train_ratio))
    if tcfg.val_train_ratio > 0 and n_val_pkts == 0 and n_pkts >= 2:
        n_val_pkts = 1   # tiny sets: an empty val split would yield NaN
        # val losses and best-weights would never update
    n_train = (n_pkts - n_val_pkts) * per_pkt
    all_idx = np.arange(ds.num_samples)
    if tcfg.val_same_train:
        return all_idx, all_idx
    return all_idx[:n_train], all_idx[n_train:]


def _raw_matches(path: str, ds: CSIDataset) -> bool:
    """True iff an existing raw container holds exactly this dataset
    (dims + first/last-sample content) — guards against silently
    training on a stale file left in the workdir."""
    if not os.path.exists(path):
        return False
    try:
        from mamimo_tpu.data.native_loader import NativeBatchLoader

        ld = NativeBatchLoader(path)
        ok = ((ld.B, ld.L, ld.R, ld.C, ld.T)
              == (ds.num_packets, ds.cfg.len_ltf, ds.cfg.num_rx,
                  ds.cfg.num_carriers, ds.cfg.num_tx))
        if ok:
            sig, _ = ld.gather(np.asarray([0, ld.num_samples - 1]))
            ok = (np.array_equal(sig[0, 0], np.real(ds.rx[0, :, 0]))
                  and np.array_equal(sig[1, 0],
                                     np.real(ds.rx[-1, :, -1])))
        ld.close()
        return bool(ok)
    except Exception:
        return False


def make_optimizer(tcfg: TrainConfig):
    """The training optimizer (Adam scaling; lr applied in the step).

    tcfg.opt_dtype='bf16' stores the first moment in bfloat16 — halves
    that moment's HBM traffic in the (HBM-bound) optimizer stage; the
    second moment stays f32 (see TrainConfig.opt_dtype for why)."""
    mu_dtype = jnp.bfloat16 if tcfg.opt_dtype == "bf16" else None
    return optax.scale_by_adam(mu_dtype=mu_dtype)


def _plane_mask(tcfg: TrainConfig):
    """(2,) update mask implementing --onlyReal/--onlyImag
    (massiveMIMO_CSI_prediction_DNN.py:167-171): excluded planes keep
    their initial weights (zero update), included planes train as
    usual."""
    return jnp.asarray([1.0 if "real" in tcfg.dims else 0.0,
                        1.0 if "imag" in tcfg.dims else 0.0])


def _mask_updates(updates, mask):
    return jax.tree.map(
        lambda u: u * mask.reshape((2,) + (1,) * (u.ndim - 1)), updates)


def _mask_bn(new_bn, old_bn, mask):
    """Excluded planes (--onlyReal/--onlyImag) keep their BN running
    statistics too — the reference's second model is never touched."""
    return jax.tree.map(
        lambda n, o: o + (n - o) * mask.reshape((2,) + (1,) * (n.ndim - 1)),
        new_bn, old_bn)


def make_batch_update(cfg: SimConfig, tcfg: TrainConfig, avg_sig_pow, opt,
                      constrain=None):
    """The ONE source of truth for an optimizer step on a materialized
    (x2, pilot, y2) batch — shared by every training path (array /
    in-jit-gather / scanned multi-step / DP+TP sharded), so a semantic
    fix lands everywhere at once.

    The step: per-plane AWGN draw at a random SNR level (the
    ``changeNoisePower`` callback + GaussianNoise layer of
    massiveMIMO_CSI_prediction_DNN.py:86-102,191-193 fused into the
    step), value_and_grad of the stacked-MLP MSE, optimizer update with
    the --onlyReal/--onlyImag plane mask applied to both weight updates
    and BN statistics.

    Args:
      constrain: optional fn (x2, pilot, y2) -> same, applied after the
        noise draw — the sharded path injects with_sharding_constraint
        here.

    Returns (update, eval_core):
      update(params, bn_state, opt_state, x2, pilot, y2, key, lr)
        -> (params, bn_state, opt_state, per_plane_loss)   [un-jitted]
      eval_core(params, bn_state, x2, pilot, y2) -> per-plane MSE
    """
    levels = jnp.asarray(tcfg.awgn_snr_levels, jnp.float32)
    pmask = _plane_mask(tcfg)

    def _rms_norm(x2, y2):
        """Per-sample complex-RMS normalization of signal AND label
        (tcfg.input_norm='rms'; massiveMIMO_dataGenerator.py:506-519):
        a_s = sqrt(mean_L |sig_s|^2) from BOTH planes jointly — the
        two planes are the same physical sample. Returns (x2, y2, a)."""
        if tcfg.input_norm != "rms":
            return x2, y2, None
        a = jnp.sqrt(jnp.sum(jnp.mean(x2 * x2, axis=-1), axis=0)
                     + 1e-30)                       # (bs,)
        return x2 / a[None, :, None], y2 / a[None, :, None], a

    def _store_cast(x2, pilot):
        """bf16 path: materialize the batch in bf16 AT THE GATHER, not
        per-use — the (2, bs, 10240) signal tensor is read by fwd AND
        the dW1 backward matmul, so f32 storage pays 4 full-size HBM
        passes the matmuls immediately re-quantize anyway. Values are
        identical to the per-use cast (same quantization point, gated
        by the same train-parity artifact); only bytes change."""
        if tcfg.matmul_dtype == "bf16":
            return (x2.astype(jnp.bfloat16),
                    pilot.astype(jnp.bfloat16))
        return x2, pilot

    def loss_fn(params, bn_state, x2, pilot, y2, rng):
        xin = preprocess_input(cfg, tcfg, x2, jnp.stack([pilot, pilot]))
        pred, new_bn = stacked_apply(
            tcfg, params, bn_state, xin, train=True, rng=rng
        )
        per_dim = jnp.mean((pred - y2) ** 2, axis=(1, 2))   # (2,)
        return jnp.sum(per_dim), (per_dim, new_bn)

    def update(params, bn_state, opt_state, x2, pilot, y2, key, lr):
        x2, y2, _ = _rms_norm(x2, y2)
        if tcfg.method == "default_snr":
            k_snr, k_noise, k_drop = jax.random.split(key, 3)
            # independent per-plane SNR draw (two independent Keras fits)
            lev = levels[jax.random.randint(k_snr, (2,), 0, len(levels))]
            npow = avg_sig_pow / (10.0 ** (lev / 10.0))      # (2,)
            std = jnp.sqrt(npow) / jnp.sqrt(2.0)
            if tcfg.awgn_rng == "rbg":
                # hardware RngBitGenerator: the threefry draw of these
                # 20.5M normals costs 0.86 ms/step at batch 1024 — 31%
                # of the whole optimizer step (results/probe_r3d.json)
                kd = jax.random.key_data(k_noise)
                k_rbg = jax.random.wrap_key_data(
                    jnp.concatenate([kd, kd]), impl="rbg")
                noise = jax.random.normal(k_rbg, x2.shape)
            elif tcfg.awgn_rng == "rbg_clt":
                # transcendental-free Gaussian: even with the hardware
                # RNG, the Box-Muller map (log/sqrt/sincos) left the
                # AWGN stage VPU-transcendental-bound at 1.39 ms/step,
                # 37% of the bs-2048 step (results/probe_r4_train.json).
                # Here each normal is the Irwin-Hall(4) sum of the four
                # bytes of ONE hardware-RNG u32 — integer lane ops only:
                # mean 4·127.5 = 510, var 4·(256²−1)/12 = 21845 (unit
                # after scaling, exact). Tails truncate at ±3.46σ and
                # excess kurtosis is −0.3 — convergence-gated like every
                # other AWGN variant (results/train_parity.json).
                kd = jax.random.key_data(k_noise)
                k_rbg = jax.random.wrap_key_data(
                    jnp.concatenate([kd, kd]), impl="rbg")
                bits = jax.random.bits(k_rbg, x2.shape, jnp.uint32)
                s = ((bits & 0xFF) + ((bits >> 8) & 0xFF)
                     + ((bits >> 16) & 0xFF) + (bits >> 24))
                noise = (s.astype(jnp.float32) - 510.0) * jnp.float32(
                    1.0 / 147.80054)
            else:
                noise = jax.random.normal(k_noise, x2.shape)
            x2 = x2 + noise * std[:, None, None]
        else:
            k_drop = key
        if constrain is not None:
            x2, pilot, y2 = constrain(x2, pilot, y2)
        x2, pilot = _store_cast(x2, pilot)
        (_, (per_dim, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bn_state, x2, pilot, y2, k_drop)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = _mask_updates(
            jax.tree.map(lambda u: -lr * u, updates), pmask)
        params = optax.apply_updates(params, updates)
        new_bn = _mask_bn(new_bn, bn_state, pmask)
        return params, new_bn, opt_state, per_dim

    def eval_core(params, bn_state, x2, pilot, y2):
        x2, y2, _ = _rms_norm(x2, y2)
        if constrain is not None:
            # the mesh path shards the eval batch over `data` too — the
            # in-jit gather from replicated data would otherwise
            # propagate replicated and run the whole batch on every
            # device (no DP speedup on the validation pass)
            x2, pilot, y2 = constrain(x2, pilot, y2)
        x2, pilot = _store_cast(x2, pilot)
        xin = preprocess_input(cfg, tcfg, x2, jnp.stack([pilot, pilot]))
        pred, _ = stacked_apply(tcfg, params, bn_state, xin, train=False)
        return jnp.mean((pred - y2) ** 2, axis=(1, 2))

    return update, eval_core


def make_array_train_step(cfg: SimConfig, tcfg: TrainConfig, avg_sig_pow,
                          opt):
    """Train/eval steps taking materialized (x2, pilot, y2) batches —
    the host-streaming path fed by the native C++ loader."""
    update, eval_core = make_batch_update(cfg, tcfg, avg_sig_pow, opt)
    # donate params/bn/opt_state: the step overwrites them in place
    # instead of double-buffering ~3 weight-sized arrays per call (the
    # sharded path already donates, parallel/sharded.py)
    return (jax.jit(update, donate_argnums=(0, 1, 2)),
            jax.jit(eval_core))


def make_train_step(cfg: SimConfig, tcfg: TrainConfig, data, avg_sig_pow,
                    opt):
    # `data` is passed through as a jit argument (device arrays), not
    # captured — closure capture would embed the whole dataset as
    # constants in the executable (and trips the axon TPU backend).
    update, eval_core = make_batch_update(cfg, tcfg, avg_sig_pow, opt)

    # params/bn/opt_state are donated (in-place update, no
    # double-buffering); `data` is NOT — it is reused every call
    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def _train_step(data, params, bn_state, opt_state, idx, key, lr):
        x2, pilot, y2 = _gather_batch(cfg, data, idx)
        return update(params, bn_state, opt_state, x2, pilot, y2, key, lr)

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def _train_multi(data, params, bn_state, opt_state, idx2, keys, lr):
        """lax.scan over steps_per_call optimizer steps — one dispatch
        amortizes the per-call RPC latency of remote runtimes."""

        def body(carry, inp):
            params, bn_state, opt_state = carry
            idx, key = inp
            x2, pilot, y2 = _gather_batch(cfg, data, idx)
            params, bn_state, opt_state, per_dim = update(
                params, bn_state, opt_state, x2, pilot, y2, key, lr)
            return (params, bn_state, opt_state), per_dim

        (params, bn_state, opt_state), per = jax.lax.scan(
            body, (params, bn_state, opt_state), (idx2, keys)
        )
        return params, bn_state, opt_state, jnp.mean(per, axis=0)

    @jax.jit
    def _eval_step(data, params, bn_state, idx):
        x2, pilot, y2 = _gather_batch(cfg, data, idx)
        return eval_core(params, bn_state, x2, pilot, y2)

    @jax.jit
    def _eval_multi(data, params, bn_state, idx2):
        """Scanned K-batch validation pass — one dispatch per K batches
        (a per-batch val loop was ~40 s/epoch of pure RPC latency on the
        9000-packet corpus: 675 dispatches × ~60 ms)."""

        def body(_, idx):
            x2, pilot, y2 = _gather_batch(cfg, data, idx)
            return None, eval_core(params, bn_state, x2, pilot, y2)

        _, per = jax.lax.scan(body, None, idx2)
        return jnp.sum(per, axis=0)                  # (2,) summed

    def train_step(params, bn_state, opt_state, idx, key, lr):
        return _train_step(data, params, bn_state, opt_state, idx, key, lr)

    def train_multi(params, bn_state, opt_state, idx2, keys, lr):
        return _train_multi(data, params, bn_state, opt_state, idx2, keys,
                            lr)

    def eval_step(params, bn_state, idx):
        return _eval_step(data, params, bn_state, idx)

    def eval_multi(params, bn_state, idx2):
        return _eval_multi(data, params, bn_state, idx2)

    train_step.multi = train_multi
    eval_step.multi = eval_multi
    return train_step, eval_step


def fit(
    cfg: SimConfig,
    tcfg: TrainConfig,
    train_ds: CSIDataset,
    val_ds: Optional[CSIDataset] = None,
    workdir: Optional[str] = None,
    verbose: bool = True,
    resume: bool = False,
    host_stream: bool = False,
    stream_window_packets: Optional[int] = None,
    mesh=None,
) -> TrainResult:
    """Train the stacked real/imag CSI MLP. Returns best-restored params.

    With resume=True and an existing ``<workdir>/last`` checkpoint,
    training continues from the saved epoch/optimizer state — mid-run
    resume, which the reference lacks entirely (SURVEY.md §5).

    With mesh given (a jax.sharding.Mesh with a 'data' and optionally a
    'model' axis), the train step runs DP+TP sharded over the mesh
    (parallel/sharded.py); resume works (checkpointed host arrays are
    re-placed with the init-time shardings), and host_stream=True
    combines with it (native-loader batches device_put pre-sharded on
    the data axis — the larger-than-HBM corpus never needs a full
    device replica).

    stream_window_packets (host_stream only): WINDOW streaming — per
    epoch the PACKET order is shuffled, windows of N packets are
    shipped to the device once (planes via the native packet gather,
    dl_gather_packets), and batches are assembled from the
    device-resident window by in-jit sample gathers with window-local
    shuffling. A per-SAMPLE stream ships each (packet, rx) preamble
    num_tx times per epoch — the exact T-fold input blowup the
    reference's LTF hash-dedup exists to avoid
    (create_massiveMIMO_CSIest_dnn_dataset.py:52-67); windows move the
    corpus bytes once. Shuffle semantics are two-level
    (packet-level global + sample-level within the window — the
    standard shuffle-buffer compromise); per-window ragged batch tails
    are dropped (< bs samples per window per epoch). The val pass is
    windowed too: from val_ds if given (its own raw container /
    loader), else from the packet-level tail split. COMPOSES with
    mesh=...: each window replicates across the mesh (per-device
    memory stays window-bounded) and batches run the sharded in-jit
    gather step — same DP/TP program and collectives as the in-HBM
    mesh path. Requires (window·T·R) % batch_size == 0.
    """
    key = jax.random.PRNGKey(tcfg.seed)
    k_init, k_train = jax.random.split(key)

    if host_stream:
        # larger-than-HBM path: mmap'd raw container + native C++ gather
        import tempfile

        from mamimo_tpu.data.native_loader import NativeBatchLoader

        raw_dir = workdir or tempfile.mkdtemp(prefix="mamimo_raw_")
        os.makedirs(raw_dir, exist_ok=True)
        raw_path = os.path.join(raw_dir, "train.raw")
        if not _raw_matches(raw_path, train_ds):
            train_ds.save_raw(raw_path)
        loader = NativeBatchLoader(raw_path)
        if verbose:
            print(f"[fit] host-streaming batches via "
                  f"{'native C++' if loader.using_native else 'numpy'} "
                  f"loader: {raw_path}")
        data = None
        val_data = None
        P_host = train_ds.pilot_matrix().T            # (T, num_tx) rows
        if val_ds is not None:
            vraw = os.path.join(raw_dir, "val.raw")
            if not _raw_matches(vraw, val_ds):
                val_ds.save_raw(vraw)
            val_loader = NativeBatchLoader(vraw)
            train_idx = np.arange(train_ds.num_samples)
            val_idx = np.arange(val_ds.num_samples)
        else:
            val_loader = loader
            train_idx, val_idx = _split_indices(train_ds, tcfg)
    else:
        data = _device_data(train_ds)
        if val_ds is not None:
            val_data = _device_data(val_ds)
            train_idx = np.arange(train_ds.num_samples)
            val_idx = np.arange(val_ds.num_samples)
        else:
            val_data = data
            train_idx, val_idx = _split_indices(train_ds, tcfg)

    # average real-plane signal power over the training inputs
    # (generalizes the first-batch estimate of
    #  massiveMIMO_CSI_prediction_DNN.py:298-302 to the full set)
    per_pkt = cfg.num_tx * cfg.num_rx
    train_pkts = max(1, len(train_idx) // per_pkt)
    if tcfg.input_norm == "rms":
        # inputs are per-sample RMS-normalized inside the step: the
        # real-plane signal power the AWGN std derives from is 1/2 by
        # construction (the reference measures it on the inputs it
        # feeds the noise layer, massiveMIMO_CSI_prediction_DNN.py:298)
        avg_sig_pow = 0.5
    else:
        avg_sig_pow = float(
            np.mean(np.real(train_ds.rx[:train_pkts]) ** 2))

    params, bn_state = init_stacked(k_init, cfg, tcfg)
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)

    start_epoch = 0
    resumed_extra = {}
    resumed_best = None
    if resume and workdir is not None and os.path.exists(
        os.path.join(workdir, "last.json")
    ):
        from mamimo_tpu.train.ckpt import load_checkpoint

        ck = load_checkpoint(os.path.join(workdir, "last"),
                             like_opt_state=opt_state)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
        if "opt_state" in ck:
            opt_state = jax.tree.map(jnp.asarray, ck["opt_state"])
        resumed_extra = ck.get("extra", {})
        start_epoch = int(resumed_extra.get("epoch", 0))
        if verbose:
            print(f"[fit] resuming from epoch {start_epoch}")
        # restore the true best weights so the final 'best' save cannot
        # regress to last-epoch params
        if os.path.exists(os.path.join(workdir, "best.json")):
            bck = load_checkpoint(os.path.join(workdir, "best"))
            resumed_best = (jax.device_get(bck["params"]),
                            jax.device_get(bck["bn_state"]))
        else:
            resumed_best = None

    def _make_window_runtime(step_on, eval_on, place, idx_to_dev):
        """Window-streaming scheduler, shared by the single-chip and
        mesh paths (see the fit docstring): per epoch the PACKET order
        shuffles, windows of stream_window_packets ship to the device
        once via `place`, and batches gather from the resident window.

        Args:
          step_on(wdata, params, bn, opt, idx_dev, key, lr) — one
            optimizer step on the window container;
          eval_on(wdata, params, bn, idx_dev) — one val batch;
          place(sig, y) -> window container dict on device;
          idx_to_dev(local_idx_np) -> the idx operand for step/eval.

        Returns (run_train, run_val, make_perm, steps_w, val_idx_new).
        """
        per_pkt_w = cfg.num_tx * cfg.num_rx
        n_pkts = train_ds.num_packets
        n_train_pkts = len(train_idx) // per_pkt_w
        if val_ds is None:
            # the val pass walks packet windows of the TAIL split; a
            # config with no tail val packets (val_same_train,
            # val_split=0) would desync the window schedule at the
            # first val batch
            assert not tcfg.val_same_train and n_train_pkts < n_pkts, (
                "window streaming needs a val_ds or a non-empty "
                "packet-level tail val split")
            n_val_pkts = n_pkts - n_train_pkts
            val_base = n_train_pkts
        else:
            n_val_pkts = val_ds.num_packets
            val_base = 0
        P_w = min(int(stream_window_packets), n_train_pkts)
        bs_w = tcfg.batch_size
        assert (P_w * per_pkt_w) % bs_w == 0, (
            "window samples must be a batch multiple so batches never "
            f"straddle windows ({P_w}*{per_pkt_w} % {bs_w})")
        pos = np.full(max(n_pkts, val_base + n_val_pkts), -1, np.int64)
        wst = {"data": None, "src": None}
        win_sched = {"train": [], "val": []}

        def _load_window(pkts, src):
            pad = P_w - len(pkts)
            pk = (np.concatenate([pkts, np.repeat(pkts[:1], pad)])
                  if pad > 0 else pkts)
            ld = val_loader if (src == "val" and val_ds is not None) \
                else loader
            sig, y = ld.gather_packets(pk)
            wst["data"] = place(sig, y)
            wst["src"] = src if val_ds is not None else "train"
            pos[:] = -1
            pos[pk] = np.arange(P_w)

        def _ensure(idx_np, which):
            src = which if val_ds is not None else "train"
            p = idx_np // per_pkt_w
            if (wst["data"] is not None and wst["src"] == src
                    and not np.any(pos[p] < 0)):
                return
            dq = win_sched[which]
            if not dq and which == "val":
                vp = np.arange(val_base, val_base + n_val_pkts)
                dq.extend(vp[k:k + P_w]
                          for k in range(0, len(vp), P_w))
            while dq:
                _load_window(dq.pop(0), which)
                if not np.any(pos[p] < 0):
                    return
            raise RuntimeError(
                "window schedule out of sync with the batch order")

        def _localize(idx_np):
            p = idx_np // per_pkt_w
            return pos[p] * per_pkt_w + idx_np % per_pkt_w

        def make_perm():
            """Two-level shuffle: packet order globally, samples within
            each window; per-window ragged batch tails dropped."""
            win_sched["train"].clear()
            pkt_perm = rng_host.permutation(n_train_pkts)
            parts = []
            for k in range(0, n_train_pkts, P_w):
                w = pkt_perm[k:k + P_w]
                win_sched["train"].append(w)
                s = (w[:, None] * per_pkt_w
                     + np.arange(per_pkt_w)[None, :]).ravel()
                s = s[rng_host.permutation(len(s))]
                parts.append(s[: (len(s) // bs_w) * bs_w])
            return np.concatenate(parts)

        steps_w = sum((min(P_w, n_train_pkts - k) * per_pkt_w) // bs_w
                      for k in range(0, n_train_pkts, P_w))
        # window-aligned sequential val pass, ragged window tails
        # dropped symmetrically
        vparts = []
        for k in range(0, n_val_pkts, P_w):
            vs = np.arange((val_base + k) * per_pkt_w,
                           (val_base + min(k + P_w, n_val_pkts))
                           * per_pkt_w)
            vparts.append(vs[: (len(vs) // bs_w) * bs_w])
        val_idx_new = (np.concatenate(vparts) if vparts
                       else np.empty(0, np.int64))
        if len(val_idx_new) == 0:
            # val smaller than one batch: a single short batch from the
            # first (only) val window
            val_idx_new = np.arange(
                val_base * per_pkt_w,
                (val_base + min(P_w, n_val_pkts)) * per_pkt_w)

        def run_train(params, bn_state, opt_state, idx_np, kstep, lr,
                      idx_next=None):
            _ensure(idx_np, "train")
            li = _localize(idx_np)
            return step_on(wst["data"], params, bn_state, opt_state,
                           idx_to_dev(li), kstep, lr)

        def run_val(params, bn_state, idx_np):
            _ensure(idx_np, "val")
            li = _localize(idx_np)
            return eval_on(wst["data"], params, bn_state,
                           idx_to_dev(li))

        return run_train, run_val, make_perm, steps_w, val_idx_new

    @jax.jit
    def _relayout(sig, y):
        # native packet planes -> the complex container layouts of
        # _device_data (one complexify per window; shapes already
        # match the (B, L, R)/(B, C, T, R) convention)
        return (jax.lax.complex(sig[0], sig[1]),
                jax.lax.complex(y[0], y[1]))

    make_perm = None
    if mesh is not None:
        from mamimo_tpu.parallel.sharded import (
            make_sharded_train_step,
            param_shardings,
        )

        from jax.sharding import NamedSharding as _NS
        from jax.sharding import PartitionSpec as _PS

        init_fn, sh_step = make_sharded_train_step(
            cfg, tcfg, mesh, avg_sig_pow=avg_sig_pow)
        if not host_stream:
            # replicate the dataset once across the mesh; batches are
            # then assembled as in-jit device gathers (the single-chip
            # fast path), not per-step host NumPy indexing
            rep = _NS(mesh, _PS())
            mesh_data = jax.tree.map(
                lambda a: jax.device_put(a, rep), _device_data(train_ds))
            mesh_val = (jax.tree.map(
                lambda a: jax.device_put(a, rep), _device_data(val_ds))
                if val_ds is not None else mesh_data)
        if start_epoch > 0:
            # resume on the mesh: re-place the checkpointed host arrays
            # with the same shardings a fresh init would use
            host_p, host_b, host_o = params, bn_state, opt_state
            p_sh, bn_sh = param_shardings(mesh, host_p, host_b)
            params = jax.tree.map(jax.device_put, host_p, p_sh)
            bn_state = jax.tree.map(jax.device_put, host_b, bn_sh)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            # optimizer-state shardings WITHOUT materializing a
            # throwaway opt.init(params) on device (that would double
            # the Adam m+v HBM footprint at the resume instant): lower
            # opt.init on abstract sharded inputs and read the
            # propagated output shardings
            abstract = jax.tree.map(
                lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                  sharding=s),
                params, p_sh)
            out_sh = jax.jit(opt.init).lower(abstract).compile() \
                .output_shardings
            rep = NamedSharding(mesh, _P())

            def _replace(sh, v):
                if not isinstance(sh, NamedSharding):
                    sh = rep      # scalars (e.g. adam count): replicate
                return jax.device_put(v, sh)

            opt_state = jax.tree.map(_replace, out_sh, host_o)
        else:
            params, bn_state, opt_state = init_fn(k_init)
        if host_stream and stream_window_packets:
            # window streaming UNDER the mesh (round-5 composition):
            # each window ships once per epoch, replicated across the
            # mesh (per-device memory stays bounded by the window —
            # the windowing contract), and every batch gathers from it
            # through the sharded in-jit gather step, so the DP/TP
            # program and collectives are identical to the in-HBM mesh
            # path. idx/key ride as replicated global arrays (multi-
            # process safe, same as the in-HBM branch below).
            _rep_w = _NS(mesh, _PS())
            P_dev_w = jax.device_put(
                np.asarray(train_ds.pilot_matrix(), np.float32), _rep_w)

            def _place_mesh(sig, y):
                sig_g = jax.device_put(np.ascontiguousarray(sig), _rep_w)
                y_g = jax.device_put(np.ascontiguousarray(y), _rep_w)
                rxc, hc = _relayout(sig_g, y_g)
                return {"rx": rxc, "h": hc, "P": P_dev_w}

            def _tr_mesh(wdata, p, b, o, idx, k, lr):
                return sh_step.gather(p, b, o, wdata, idx,
                                      jax.device_put(k, _rep_w), lr)

            def _ev_mesh(wdata, p, b, idx):
                return sh_step.gather_eval(p, b, wdata, idx)

            run_train, run_val, make_perm, steps_w, val_idx = \
                _make_window_runtime(
                    _tr_mesh, _ev_mesh, _place_mesh,
                    lambda li: jax.device_put(np.asarray(li), _rep_w))
        elif host_stream:
            # larger-than-HBM under the mesh: batches gathered on host
            # by the native C++ loader, device_put pre-sharded on the
            # `data` axis (the DP dim), then the array-input sharded
            # step runs — nothing but the batch ever crosses the host
            # boundary. (The single-chip double-buffer prefetch is not
            # used here: the per-step host gather overlaps the device
            # step through jax's async dispatch.)
            def _put_sharded(sig, y, idx_np):
                t = (idx_np % cfg.num_tx).astype(np.int64)
                return (jax.device_put(sig.transpose(1, 0, 2),
                                       sh_step.batch_sharding),
                        jax.device_put(P_host[t], sh_step.pilot_sharding),
                        jax.device_put(y.transpose(1, 0, 2),
                                       sh_step.batch_sharding))

            def run_train(params, bn_state, opt_state, idx_np, kstep, lr,
                          idx_next=None):
                x2, pilot, y2 = _put_sharded(*loader.gather(idx_np), idx_np)
                return sh_step(params, bn_state, opt_state, x2, pilot,
                               y2, kstep, lr)

            def run_val(params, bn_state, idx_np):
                ld = val_loader if val_ds is not None else loader
                x2, pilot, y2 = _put_sharded(*ld.gather(idx_np), idx_np)
                return sh_step.array_eval(params, bn_state, x2, pilot, y2)
        else:
            # idx/key must be GLOBAL (replicated) arrays: under a
            # multi-process mesh a process-local jnp.asarray would feed
            # jit incompatible single-device operands. Values are
            # identical on every process (same tcfg.seed drives the
            # host shuffle), so replicated device_put is exact; on a
            # single-process mesh this is a no-op placement.
            _rep = _NS(mesh, _PS())

            def run_train(params, bn_state, opt_state, idx_np, kstep, lr,
                          idx_next=None):
                return sh_step.gather(params, bn_state, opt_state,
                                      mesh_data,
                                      jax.device_put(np.asarray(idx_np),
                                                     _rep),
                                      jax.device_put(kstep, _rep), lr)

            def run_val(params, bn_state, idx_np):
                return sh_step.gather_eval(params, bn_state, mesh_val,
                                           jax.device_put(
                                               np.asarray(idx_np), _rep))

        val_multi = None
    elif host_stream and stream_window_packets:
        # WINDOW streaming (see docstring): ship packets once, expand
        # to samples on device via the same in-jit gather the in-HBM
        # path uses — the window is just a small resident `data` dict.
        update, eval_core = make_batch_update(cfg, tcfg, avg_sig_pow, opt)

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def _wstep(data, params, bn_state, opt_state, idx, key, lr):
            x2, pilot, y2 = _gather_batch(cfg, data, idx)
            return update(params, bn_state, opt_state, x2, pilot, y2,
                          key, lr)

        @jax.jit
        def _weval(data, params, bn_state, idx):
            x2, pilot, y2 = _gather_batch(cfg, data, idx)
            return eval_core(params, bn_state, x2, pilot, y2)

        P_dev = jnp.asarray(train_ds.pilot_matrix(), jnp.float32)

        def _place(sig, y):
            rxc, hc = _relayout(jnp.asarray(sig), jnp.asarray(y))
            return {"rx": rxc, "h": hc, "P": P_dev}

        run_train, run_val, make_perm, steps_w, val_idx = \
            _make_window_runtime(_wstep, _weval, _place, jnp.asarray)
        val_multi = None
    elif host_stream:
        arr_train_step, arr_eval_step = make_array_train_step(
            cfg, tcfg, avg_sig_pow, opt)
        _pf = {"idx": None}    # one in-flight native prefetch (train)

        def _to_device(sig, y, idx_np):
            t = (idx_np % cfg.num_tx).astype(np.int64)
            pilot = P_host[t]
            return (jnp.asarray(sig.transpose(1, 0, 2)),
                    jnp.asarray(pilot),
                    jnp.asarray(y.transpose(1, 0, 2)))

        def _batch_arrays(ld, idx_np):
            return _to_device(*ld.gather(idx_np), idx_np)

        def run_train(params, bn_state, opt_state, idx_np, kstep, lr,
                      idx_next=None):
            # double-buffered pipeline: batch k was prefetched on a C++
            # background thread while the device ran step k-1; kick off
            # the gather of batch k+1 before dispatching step k
            if _pf["idx"] is not None:
                sig, y = loader.wait()
                hit = np.array_equal(_pf["idx"], idx_np)
                _pf["idx"] = None
                if not hit:
                    sig, y = loader.gather(idx_np)
            else:
                sig, y = loader.gather(idx_np)
            if idx_next is not None:
                loader.prefetch(np.ascontiguousarray(idx_next, np.int64))
                _pf["idx"] = np.asarray(idx_next)
            x2, pilot, y2 = _to_device(sig, y, idx_np)
            return arr_train_step(params, bn_state, opt_state, x2, pilot,
                                  y2, kstep, lr)

        def run_val(params, bn_state, idx_np):
            x2, pilot, y2 = _batch_arrays(val_loader, idx_np)
            return arr_eval_step(params, bn_state, x2, pilot, y2)

        val_multi = None
    else:
        train_step, eval_step = make_train_step(
            cfg, tcfg, data, avg_sig_pow, opt)
        _, val_eval_step = make_train_step(
            cfg, tcfg, val_data, avg_sig_pow, opt)

        def run_train(params, bn_state, opt_state, idx_np, kstep, lr,
                      idx_next=None):
            return train_step(params, bn_state, opt_state,
                              jnp.asarray(idx_np), kstep, lr)

        def run_val(params, bn_state, idx_np):
            return val_eval_step(params, bn_state, jnp.asarray(idx_np))

        val_multi = val_eval_step.multi

    bs = tcfg.batch_size
    steps_per_epoch = max(1, len(train_idx) // bs)
    val_steps = max(1, len(val_idx) // bs)
    windowed = bool(host_stream and stream_window_packets)
    if windowed:
        steps_per_epoch = steps_w
        val_steps = max(1, len(val_idx) // bs)

    min_lr = tcfg.lr * tcfg.min_lr_factor
    best_val = np.asarray(resumed_extra.get("best_val", [np.inf, np.inf]),
                          np.float64)
    lr = float(resumed_extra.get("lr", tcfg.lr))
    # host snapshots: the sharded step donates its inputs, so device
    # references to the initial state die after the first step
    if resumed_best is not None:
        best_params, best_bn = resumed_best
    else:
        best_params = jax.device_get(params)
        best_bn = jax.device_get(bn_state)
    since_plateau = int(resumed_extra.get("since_plateau", 0))
    best_sum = float(resumed_extra.get("best_sum", np.inf))
    since_best = np.asarray(resumed_extra.get("since_best", [0, 0]))
    history = {"loss_real": [], "loss_imag": [], "val_loss_real": [],
               "val_loss_imag": [], "lr": []}
    if start_epoch > 0 and workdir is not None:
        # keep the pre-resume loss curves (the history artifact must
        # cover the whole run, not just the resumed tail)
        hist_path = os.path.join(workdir, "history.json")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                prev = json.load(f)
            for k in history:
                history[k] = list(prev.get(k, []))[:start_epoch]
    rng_host = np.random.default_rng(tcfg.seed)

    def _next_perm():
        if windowed:
            return make_perm()
        return rng_host.permutation(len(train_idx))

    # fast-forward the shuffle stream past the epochs already run so a
    # resumed run continues the uninterrupted run's batch sequence
    for _ in range(start_epoch):
        _next_perm()
    epochs_ran = 0

    # fuse K optimizer steps per dispatch on the standard path
    kfuse = max(1, int(tcfg.steps_per_call))
    use_multi = kfuse > 1 and mesh is None and not host_stream

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.time()
        perm = _next_perm()
        ep_loss = np.zeros(2)
        n_done = 0
        s = 0
        if use_multi:
            n_groups = steps_per_epoch // kfuse
            for gi in range(n_groups):
                rows = perm[gi * kfuse * bs:(gi + 1) * kfuse * bs]
                idx2 = jnp.asarray(
                    train_idx[rows].reshape(kfuse, bs))
                base = epoch * steps_per_epoch + gi * kfuse
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(k_train, i)
                )(jnp.arange(base, base + kfuse))
                params, bn_state, opt_state, per_dim = train_step.multi(
                    params, bn_state, opt_state, idx2, keys, lr
                )
                ep_loss += np.asarray(per_dim) * kfuse
                n_done += kfuse
            s = n_groups * kfuse
        for s2 in range(s, steps_per_epoch):
            idx = train_idx[perm[s2 * bs:(s2 + 1) * bs]]
            idx_next = (train_idx[perm[(s2 + 1) * bs:(s2 + 2) * bs]]
                        if s2 + 1 < steps_per_epoch else None)
            if idx_next is not None and len(idx_next) < bs:
                idx_next = None
            kstep = jax.random.fold_in(
                k_train, epoch * steps_per_epoch + s2)
            params, bn_state, opt_state, per_dim = run_train(
                params, bn_state, opt_state, idx, kstep, lr,
                idx_next=idx_next
            )
            ep_loss += np.asarray(per_dim)
            n_done += 1
        ep_loss /= max(n_done, 1)

        val_loss = np.zeros(2)
        sv = 0
        if use_multi and val_multi is not None:
            vg = val_steps // kfuse
            for gi in range(vg):
                idx2 = jnp.asarray(
                    val_idx[gi * kfuse * bs:(gi + 1) * kfuse * bs]
                    .reshape(kfuse, bs))
                val_loss += np.asarray(val_multi(params, bn_state, idx2))
            sv = vg * kfuse
        for s in range(sv, val_steps):
            idx = val_idx[s * bs:(s + 1) * bs]
            val_loss += np.asarray(run_val(params, bn_state, idx))
        val_loss /= val_steps

        history["loss_real"].append(float(ep_loss[0]))
        history["loss_imag"].append(float(ep_loss[1]))
        history["val_loss_real"].append(float(val_loss[0]))
        history["val_loss_imag"].append(float(val_loss[1]))
        history["lr"].append(lr)
        epochs_ran = epoch + 1

        # per-plane best tracking (EarlyStopping restore_best_weights)
        improved = val_loss < best_val
        if improved.any():
            host_p = jax.device_get(params)
            host_b = jax.device_get(bn_state)
            for d in range(2):
                if improved[d]:
                    best_val[d] = val_loss[d]
                    since_best[d] = 0
                    best_params = jax.tree.map(
                        lambda bp, p, d=d: _set_plane(bp, p, d),
                        best_params, host_p,
                    )
                    best_bn = jax.tree.map(
                        lambda bb, b, d=d: _set_plane(bb, b, d),
                        best_bn, host_b,
                    )
                else:
                    since_best[d] += 1
        else:
            since_best += 1

        # ReduceLROnPlateau on the summed val loss
        vsum = float(val_loss.sum())
        if vsum < best_sum - 1e-12:
            best_sum = vsum
            since_plateau = 0
        else:
            since_plateau += 1
            if since_plateau >= tcfg.plateau_patience and lr > min_lr:
                lr = max(lr * tcfg.plateau_factor, min_lr)
                since_plateau = 0
                if verbose:
                    print(f"[fit] plateau: reducing lr to {lr:.2e}")

        if verbose:
            print(
                f"[fit] epoch {epoch+1}/{tcfg.epochs} "
                f"loss=({ep_loss[0]:.4e},{ep_loss[1]:.4e}) "
                f"val=({val_loss[0]:.4e},{val_loss[1]:.4e}) "
                f"lr={lr:.1e} {time.time()-t0:.1f}s"
            )

        if workdir is not None:
            save_checkpoint(
                os.path.join(workdir, "last"), cfg, tcfg, params, bn_state,
                extra={"epoch": epoch + 1, "lr": lr,
                       "best_val": best_val.tolist(),
                       "since_best": since_best.tolist(),
                       "since_plateau": since_plateau,
                       "best_sum": best_sum},
                opt_state=opt_state, backend=tcfg.ckpt_backend,
            )
            # keep the loss-curve artifact resumable too (read back by
            # the resume path; final write below also makes the plots)
            with open(os.path.join(workdir, "history.json"), "w") as f:
                json.dump(history, f)
            if improved.any():
                # keep 'best' durable so an interrupted run still has
                # its restore-best-weights artifact
                save_checkpoint(
                    os.path.join(workdir, "best"), cfg, tcfg,
                    best_params, best_bn,
                    extra={"best_val": best_val.tolist(),
                           "epochs": epoch + 1},
                    backend=tcfg.ckpt_backend,
                )

        if (since_best >= tcfg.early_stop_patience).all():
            if verbose:
                print(f"[fit] early stop at epoch {epoch+1}")
            break

    best_params = jax.tree.map(jnp.asarray, best_params)
    best_bn = jax.tree.map(jnp.asarray, best_bn)

    if workdir is not None:
        os.makedirs(workdir, exist_ok=True)
        save_checkpoint(
            os.path.join(workdir, "best"), cfg, tcfg, best_params, best_bn,
            extra={"best_val": best_val.tolist(), "epochs": epochs_ran},
            backend=tcfg.ckpt_backend,
        )
        with open(os.path.join(workdir, "history.json"), "w") as f:
            json.dump(history, f)
        _plot_history(workdir, history)

    return TrainResult(best_params, best_bn, history, best_val, epochs_ran)


def _set_plane(best_leaf, new_leaf, d):
    """Overwrite plane d of a stacked leaf (leading axis 2)."""
    out = np.asarray(best_leaf).copy()
    out[d] = np.asarray(new_leaf)[d]
    return out


def _plot_history(workdir: str, history: Dict[str, list]) -> None:
    """Loss-curve PNGs (massiveMIMO_CSI_prediction_DNN.py:321-328)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    for d in ("real", "imag"):
        plt.figure()
        plt.semilogy(history[f"loss_{d}"], label="train")
        plt.semilogy(history[f"val_loss_{d}"], label="validation")
        plt.title("model loss for CSI mapping")
        plt.ylabel("loss")
        plt.xlabel("epoch")
        plt.legend(loc="upper left")
        plt.savefig(os.path.join(workdir, f"{d}_loss_prediction.png"))
        plt.close()


def evaluate_dataset(
    cfg: SimConfig,
    tcfg: TrainConfig,
    params,
    bn_state,
    ds: CSIDataset,
    batch_packets: int = 4,
    drop_input: bool = False,
    drop_key=None,
):
    """Predict complex CSI for every sample of a dataset, in original
    order, batched by whole packets (test batch = nTX·nRX,
    massiveMIMO_CSI_prediction_DNN.py:337-339).

    Returns (pred (B, C, T, R) complex64, per-plane MSE vs ds.h_ls).
    """
    data = _device_data(ds)

    @jax.jit
    def _step(data, params, bn_state, idx, key):
        x2, pilot, y2 = _gather_batch(cfg, data, idx)
        if tcfg.input_norm == "rms":
            # scale-equivariant inference: normalize the input by its
            # complex RMS, scale the prediction back (the label-side
            # division the trainer applies is inverted here). Computed
            # BEFORE the dropout mask: training normalizes the clean
            # signal, so a post-mask RMS would bias the rescale when
            # dropout-at-eval is enabled.
            a = jnp.sqrt(jnp.sum(jnp.mean(x2 * x2, axis=-1), axis=0)
                         + 1e-30)
            x2 = x2 / a[None, :, None]
        if drop_input:
            # binomial input mask test (--testDropInput, :377-398)
            keep = 1.0 - tcfg.input_dropout
            mask = jax.random.bernoulli(key, keep, x2.shape)
            x2 = x2 * mask
        xin = preprocess_input(cfg, tcfg, x2, jnp.stack([pilot, pilot]))
        pred, _ = stacked_apply(tcfg, params, bn_state, xin, train=False)
        if tcfg.input_norm == "rms":
            pred = pred * a[None, :, None]
        mse = jnp.mean((pred - y2) ** 2, axis=(1, 2))
        return pred, mse

    def step(idx, key):
        return _step(data, params, bn_state, idx, key)

    per_pkt = cfg.num_tx * cfg.num_rx
    preds = []
    mses = []
    key = drop_key if drop_key is not None else jax.random.PRNGKey(0)
    for start in range(0, ds.num_packets, batch_packets):
        n = min(batch_packets, ds.num_packets - start)
        idx = jnp.arange(start * per_pkt, (start + n) * per_pkt)
        k = jax.random.fold_in(key, start)
        pred, mse = step(idx, k)
        preds.append(np.asarray(pred))
        mses.append(np.asarray(mse) * n)
    pred = np.concatenate(preds, axis=1)          # (2, B*T*R, C)
    mse = np.sum(mses, axis=0) / ds.num_packets
    cplx = (pred[0] + 1j * pred[1]).astype(np.complex64)
    # reshape sample order (p, r, t) -> (B, C, T, R)
    out = cplx.reshape(ds.num_packets, cfg.num_rx, cfg.num_tx,
                       cfg.num_carriers)
    out = np.transpose(out, (0, 3, 2, 1))
    return out, mse
