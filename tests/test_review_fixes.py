"""Regression tests for review findings: with_ber default fft_size,
num_sts frame-bits scaling, plane-mask BN freezing, tiny-set val split,
resume history/shuffle continuity, and sweep series alignment."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.pipeline.dataset import generate_dataset


def test_with_ber_default_fft_size(small_cfg):
    """generate_dataset(with_ber=True) with the default fft_size=None
    must not crash (previously computed 2*None)."""
    ds = generate_dataset(small_cfg, seed=5, num_packets=2, snr_db=10.0,
                          chunk=2, with_ber=True)
    assert ds.ber.shape == (2,)
    assert np.all(np.isfinite(np.asarray(ds.ber)))


def test_num_frm_bits_scales_with_sts():
    c1 = SimConfig(num_sts=1)
    c2 = SimConfig(num_sts=2)
    # numSTS·(nsym·C·bps·rate) − tails (generate_maMIMO_LTF.m:110-111)
    assert c1.num_frm_bits == (10 * 234 * 2) // 3 - 6
    assert c2.num_frm_bits == (2 * 10 * 234 * 2) // 3 - 6
    # the coded QPSK frame must exactly fill the (nsym, C, ns) grid
    for c in (c1, c2):
        coded = (c.num_frm_bits + c.num_tails) * c.code_rate_den
        assert coded // c.bits_per_subcarrier \
            == c.num_data_symbols * c.num_carriers * c.num_sts


def test_only_real_freezes_imag_bn(small_cfg):
    """--onlyReal: the imag plane's BN running stats must not adapt
    (the reference never touches its second model)."""
    import optax

    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.train.loop import make_array_train_step

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(32, 32), dropout=0.0, method="default",
                       dims=("real",))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    opt = optax.scale_by_adam()
    step, _ = make_array_train_step(cfg, tcfg, 1.0, opt)
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((2, 8, cfg.len_ltf)), jnp.float32)
    pil = jnp.asarray(rng.standard_normal((8, cfg.num_tx)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((2, 8, cfg.num_carriers)),
                     jnp.float32)
    # the step donates params/bn/opt_state — snapshot to host first
    bn_before = [np.asarray(l) for l in jax.tree.leaves(bn)]
    params_before = [np.asarray(l) for l in jax.tree.leaves(params)]
    p1, bn1, _, _ = step(params, bn, opt.init(params), x2, pil, y2,
                         jax.random.PRNGKey(1), 1e-3)
    for a0, leaf1 in zip(bn_before, jax.tree.leaves(bn1)):
        a1 = np.asarray(leaf1)
        np.testing.assert_array_equal(a0[1], a1[1])       # imag frozen
        assert not np.allclose(a0[0], a1[0])              # real adapted
    for a0, leaf1 in zip(params_before, jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a0[1], np.asarray(leaf1)[1])


def test_split_indices_never_empty_val(small_cfg):
    from mamimo_tpu.train.loop import _split_indices

    ds = generate_dataset(small_cfg, seed=6, num_packets=3, snr_db=120.0,
                          chunk=3)
    tr, va = _split_indices(ds, TrainConfig(val_train_ratio=0.15))
    assert len(va) > 0
    assert len(tr) + len(va) == ds.num_samples


def test_resume_keeps_history_and_shuffle_stream(small_cfg, tmp_path):
    """A resumed fit keeps the pre-resume loss curves and continues the
    original shuffle stream (epoch N+1 batches match an uninterrupted
    run)."""
    from mamimo_tpu.train.loop import fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=7, num_packets=8, snr_db=120.0,
                          chunk=4, fft_size=8192)
    base = TrainConfig(hidden=(32, 32), batch_size=16, dropout=0.0,
                       method="default", early_stop_patience=50, seed=3)
    wd_a = os.path.join(tmp_path, "straight")
    res_a = fit(cfg, base.replace(epochs=4), ds, verbose=False,
                workdir=wd_a)
    wd_b = os.path.join(tmp_path, "resumed")
    fit(cfg, base.replace(epochs=2), ds, verbose=False, workdir=wd_b)
    res_b = fit(cfg, base.replace(epochs=4), ds, verbose=False,
                workdir=wd_b, resume=True)
    hist_b = json.load(open(os.path.join(wd_b, "history.json")))
    assert len(hist_b["loss_real"]) == 4          # pre-resume preserved
    np.testing.assert_allclose(hist_b["loss_real"],
                               res_a.history["loss_real"], rtol=1e-4)
    np.testing.assert_allclose(res_b.best_val, res_a.best_val, rtol=1e-4)


def test_sweep_closed_loop_series_stay_aligned(small_cfg):
    """Closed-loop series NaN-pad skipped sources so every series has
    one entry per SNR level."""
    from mamimo_tpu.eval.snr_sweep import run_snr_sweep

    cfg = small_cfg
    ds_ok = generate_dataset(cfg, seed=8, num_packets=2, snr_db=0.0,
                             chunk=2, with_mmse=True, fft_size=8192)
    ds_nom = generate_dataset(cfg, seed=8, num_packets=2, snr_db=10.0,
                              chunk=2, with_mmse=False, fft_size=8192)
    out = run_snr_sweep(cfg, [0.0, 10.0], num_packets=2, closed_loop=True,
                        max_cl_packets=1, verbose=False,
                        datasets={0.0: ds_ok, 10.0: ds_nom})
    for series in (out.ber, out.evm, out.bf_gain, out.nmse):
        for s, vals in series.items():
            assert len(vals) == 2, (s, vals)
    assert np.isnan(out.ber["lmmse"][1])
    assert np.isfinite(out.ber["ls"][0])


def test_awgn_rbg_step_runs(small_cfg):
    """awgn_rng='rbg' (hardware RngBitGenerator AWGN draw — 31% of the
    threefry step, results/probe_r3d.json) must produce a working,
    deterministic-per-key training step with noise of the right scale."""
    import optax

    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.train.loop import make_batch_update

    cfg = small_cfg
    rng = np.random.default_rng(3)
    x2 = jnp.asarray(rng.standard_normal((2, 16, cfg.len_ltf)), jnp.float32)
    pil = jnp.asarray(rng.standard_normal((16, cfg.num_tx)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((2, 16, cfg.num_carriers)),
                     jnp.float32)
    losses = {}
    for impl in ("threefry", "rbg"):
        tcfg = TrainConfig(hidden=(32, 32), dropout=0.0, awgn_rng=impl,
                           awgn_snr_levels=(0.0,))
        params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
        opt = optax.scale_by_adam()
        update, _ = make_batch_update(cfg, tcfg, 1.0, opt)
        step = jax.jit(update)
        out = step(params, bn, opt.init(params), x2, pil, y2,
                   jax.random.PRNGKey(7), 1e-3)
        l1 = np.asarray(out[3])
        # deterministic per key
        out2 = step(params, bn, opt.init(params), x2, pil, y2,
                    jax.random.PRNGKey(7), 1e-3)
        np.testing.assert_array_equal(l1, np.asarray(out2[3]))
        assert np.all(np.isfinite(l1))
        losses[impl] = l1
    # same noise POWER either way (SNR pinned to 0 dB): the per-plane
    # MSE losses must agree closely even though the streams differ
    np.testing.assert_allclose(losses["rbg"], losses["threefry"],
                               rtol=0.2)
