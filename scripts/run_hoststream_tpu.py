#!/usr/bin/env python
"""Host-streaming at real scale (VERDICT r3 missing #3): train one epoch
on a LARGER-THAN-HBM BS64 corpus streamed through the native C++ loader,
and compare against the in-HBM path.

Round-4 redesign, after the round-3 attempts died twice:

* the corpus is NEVER materialized in host RAM — the raw container is
  stream-written tile-by-tile to disk (the mmap'd file IS the corpus;
  round 3's 25.6 GiB host replica + transfer-buffer growth OOM-killed
  a 125 GB host);
* the epoch uses WINDOW streaming (fit(stream_window_packets=...)):
  packets ship to the device ONCE per epoch and are expanded to
  training samples by the same in-jit gather the in-HBM path uses. The
  round-3 per-SAMPLE stream shipped each (packet, rx) preamble
  num_tx=64 times per epoch — 974 GB over a ~34 MB/s tunnel ≈ 10 h for
  ONE epoch (measured ~6.1 s/step; results/supervisor_r3d.log). The
  window form moves exactly the corpus bytes (~25 GiB ≈ 13 min at
  tunnel speed); on a co-located host NIC/PCIe this is
  compute-dominated. This mirrors the reference's LTF hash-dedup
  (create_massiveMIMO_CSIest_dnn_dataset.py:52-67) — dedup the shared
  preamble, expand at batch-assembly time.

A short sample-mode segment is also timed for the measured ratio.
Writes results/hoststream_scale.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def stream_write_raw(path, seed_ds, tile):
    """Stream the tiled raw container to disk without a host replica:
    header, rx block = seed rx bytes × tile, h block = seed h × tile
    (identical bytes to write_raw on the materialized tiled corpus)."""
    import numpy as np

    from mamimo_tpu.data.native_loader import _MAGIC

    B = seed_ds.num_packets * tile
    L, R = seed_ds.rx.shape[1], seed_ds.rx.shape[2]
    C, T = seed_ds.h_ls.shape[1], seed_ds.h_ls.shape[2]
    rx_b = np.ascontiguousarray(seed_ds.rx, np.complex64).tobytes()
    h_b = np.ascontiguousarray(seed_ds.h_ls, np.complex64).tobytes()
    with open(path, "wb") as f:
        f.write(_MAGIC + np.asarray([B, L, R, C, T, 0],
                                    np.int64).tobytes())
        for _ in range(tile):
            f.write(rx_b)
        for _ in range(tile):
            f.write(h_b)
    return B


class RawCorpusView:
    """The minimal train_ds surface fit(host_stream=True) touches when
    the raw container already exists on disk: dims of the FULL corpus,
    the seed rx for the signal-power estimate, and the pilot matrix.
    (fit's _raw_matches content probe reads rx[0,:,0] / rx[-1,:,-1] —
    tiling preserves both.)"""

    def __init__(self, cfg, seed_ds, num_packets):
        self.cfg = cfg
        self.rx = seed_ds.rx            # stats + content probe only
        self._n = num_packets
        self._pm = seed_ds.pilot_matrix()

    @property
    def num_packets(self):
        return self._n

    @property
    def num_samples(self):
        return self._n * self.cfg.num_tx * self.cfg.num_rx

    def pilot_matrix(self):
        return self._pm

    def save_raw(self, path):
        raise RuntimeError(
            "raw container must be stream-written before fit() "
            "(stream_write_raw); refusing to materialize the corpus")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-packets", type=int, default=250)
    ap.add_argument("--tile", type=int, default=48,
                    help="disk replication factor (48*250=12000 pkts "
                         "= 25.4 GiB raw > 16 GiB HBM)")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--inhbm-packets", type=int, default=2000)
    ap.add_argument("--sample-mode-steps", type=int, default=12,
                    help="timed steps of the per-sample stream (the "
                         "round-3 design) for the measured ratio")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--workdir", default="runs/hoststream")
    ap.add_argument("--out", default="results/hoststream_scale.json")
    ap.add_argument("--num-tx", type=int, default=64)
    ap.add_argument("--num-rx", type=int, default=8)
    args = ap.parse_args()

    import dataclasses

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.data.native_loader import NativeBatchLoader
    from mamimo_tpu.pipeline.dataset import CSIDataset, generate_dataset
    from mamimo_tpu.train import fit

    cfg = SimConfig(num_tx=args.num_tx, num_rx=args.num_rx)
    os.makedirs(args.workdir, exist_ok=True)

    seed_path = os.path.join(args.workdir, "seed.npz")
    if os.path.exists(seed_path):
        seed_ds = CSIDataset.load(seed_path)
        log(f"loaded seed corpus ({seed_ds.num_packets} pkts)")
    else:
        t0 = time.time()
        log(f"generating {args.seed_packets} BS64 packets on-chip...")
        seed_ds = generate_dataset(cfg, seed=7,
                                   num_packets=args.seed_packets,
                                   snr_db=120.0, chunk=25)
        seed_ds.save(seed_path)
        log(f"seed corpus in {time.time()-t0:.0f}s")

    B = seed_ds.num_packets * args.tile
    raw_path = os.path.join(args.workdir, "train.raw")
    need = 56 + B * (seed_ds.rx[0].nbytes + seed_ds.h_ls[0].nbytes)
    if not (os.path.exists(raw_path)
            and os.path.getsize(raw_path) == need):
        t0 = time.time()
        log(f"stream-writing raw container ({need/2**30:.1f} GiB)...")
        stream_write_raw(raw_path, seed_ds, args.tile)
        log(f"raw container in {time.time()-t0:.0f}s")
    else:
        log(f"reusing raw container ({need/2**30:.1f} GiB)")
    view = RawCorpusView(cfg, seed_ds, B)
    raw_gb = (need - 56) / 2**30
    log(f"corpus: {B} pkts, raw {raw_gb:.1f} GiB (HBM is 16 GiB)")

    tcfg = TrainConfig(epochs=1, batch_size=args.batch, seed=0,
                       early_stop_patience=10**6, val_train_ratio=0.02)

    # --- window-streamed epoch on the larger-than-HBM corpus ---
    t0 = time.time()
    fit(cfg, tcfg, view, workdir=args.workdir, host_stream=True,
        stream_window_packets=args.window)
    t_stream = time.time() - t0
    per_pkt = cfg.num_tx * cfg.num_rx
    n_train_pkts = B - int(np.floor(B * tcfg.val_train_ratio))
    n_steps = sum(
        (min(args.window, n_train_pkts - k) * per_pkt) // args.batch
        for k in range(0, n_train_pkts, args.window))
    log(f"window-stream epoch: {t_stream:.0f}s "
        f"(~{t_stream/max(n_steps,1)*1e3:.2f} ms/step, {n_steps} steps, "
        f"window {args.window} pkts)")

    # --- sample-mode stream, a few timed steps (the r3 design) ---
    ld = NativeBatchLoader(raw_path)
    from mamimo_tpu.train.loop import make_array_train_step, make_optimizer
    from mamimo_tpu.models.mlp import init_stacked
    import jax.numpy as jnp

    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    opt = make_optimizer(tcfg)
    ostate = jax.jit(opt.init)(params)
    astep, _ = make_array_train_step(cfg, tcfg, 1.0, opt)
    P_host = view.pilot_matrix().T
    rng = np.random.default_rng(0)

    def one_sample_step(params, bn, ostate, i):
        idx = rng.integers(0, ld.num_samples, args.batch)
        sig, y = ld.gather(idx)
        t = (idx % cfg.num_tx).astype(np.int64)
        x2 = jnp.asarray(sig.transpose(1, 0, 2))
        pil = jnp.asarray(P_host[t])
        y2 = jnp.asarray(y.transpose(1, 0, 2))
        params, bn, ostate, loss = astep(params, bn, ostate, x2, pil,
                                         y2, jax.random.PRNGKey(i), 1e-4)
        float(loss[0])
        return params, bn, ostate

    params, bn, ostate = one_sample_step(params, bn, ostate, 0)  # compile
    t0 = time.time()
    for i in range(args.sample_mode_steps):
        params, bn, ostate = one_sample_step(params, bn, ostate, i + 1)
    t_sample = (time.time() - t0) / args.sample_mode_steps
    total_steps = int(B * per_pkt * (1 - tcfg.val_train_ratio)
                      // args.batch)
    log(f"sample-mode stream: {t_sample*1e3:.0f} ms/step -> "
        f"{t_sample*total_steps/3600:.1f} h/epoch extrapolated")
    ld.close()
    del params, bn, ostate

    # --- in-HBM epoch on a fitting slice, same step shape ---
    k = max(1, args.inhbm_packets // seed_ds.num_packets)
    rep = lambda a: (np.concatenate([a] * k, axis=0)  # noqa: E731
                     if a is not None else None)
    h_ls = rep(seed_ds.h_ls)
    small = dataclasses.replace(
        seed_ds, rx=rep(seed_ds.rx), h_ls=h_ls, h_perfect=h_ls,
        snr_cs=rep(seed_ds.snr_cs), noise_db=rep(seed_ds.noise_db),
        tau=rep(seed_ds.tau), chan_delay=rep(seed_ds.chan_delay),
        h_mmse=None, ber=None)
    small_gb = (small.rx.nbytes + small.h_ls.nbytes) / 2**30
    t0 = time.time()
    fit(cfg, tcfg, small, host_stream=False)
    t_hbm = time.time() - t0
    n2 = int(small.num_samples * (1 - tcfg.val_train_ratio)
             // args.batch)
    log(f"in-HBM epoch ({small.num_packets} pkts, {small_gb:.1f} GiB): "
        f"{t_hbm:.0f}s (~{t_hbm/max(n2,1)*1e3:.2f} ms/step, {n2} steps)")

    out = {
        "config": f"BS{args.num_tx}", "batch": args.batch,
        "stream": {"packets": B, "raw_gib": round(raw_gb, 2),
                   "mode": "window", "window_packets": args.window,
                   "epoch_s": round(t_stream, 1), "steps": n_steps,
                   "ms_per_step": round(
                       t_stream / max(n_steps, 1) * 1e3, 3)},
        "sample_mode": {"ms_per_step": round(t_sample * 1e3, 1),
                        "extrapolated_epoch_h": round(
                            t_sample * total_steps / 3600, 2),
                        "steps_timed": args.sample_mode_steps},
        "in_hbm": {"packets": small.num_packets,
                   "gib": round(small_gb, 2),
                   "epoch_s": round(t_hbm, 1), "steps": n2,
                   "ms_per_step": round(t_hbm / max(n2, 1) * 1e3, 3)},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
