"""Model + training-loop tests on a tiny generated dataset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import (
    csi_mlp_apply,
    init_csi_mlp,
    init_stacked,
    model_input_spec,
    predict_complex,
    preprocess_input,
    stacked_apply,
)
from mamimo_tpu.ops.metrics import nmse_subk
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.train.ckpt import load_checkpoint, save_checkpoint
from mamimo_tpu.train.loop import evaluate_dataset, fit


TINY = SimConfig(num_tx=4, num_rx=2, n_scatterers=10, n_rays=20)
TTC = TrainConfig(hidden=(64, 32), batch_size=16, epochs=4,
                  early_stop_patience=50, seed=1)


@pytest.fixture(scope="module")
def tiny_ds():
    return generate_dataset(TINY, seed=0, num_packets=12, snr_db=120.0,
                            chunk=6, fft_size=4096)


def test_model_shapes():
    sig_len, in_dim = model_input_spec(TINY, TTC)
    assert sig_len == TINY.len_ltf
    assert in_dim == TINY.len_ltf + TINY.num_tx
    params, bn = init_csi_mlp(jax.random.PRNGKey(0), TINY, TTC)
    x = jnp.zeros((8, in_dim))
    y, _ = csi_mlp_apply(TTC, params, bn, x, train=False)
    assert y.shape == (8, TINY.num_carriers)
    # train mode updates bn state
    y2, bn2 = csi_mlp_apply(TTC, params, bn, x + 1.0, train=True,
                            rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(bn2["mean"][0]),
                           np.asarray(bn["mean"][0]))


def test_decimation_options():
    for mode, red in (("max", 2), ("avg", 2), ("none", 1)):
        tc = TTC.replace(decimate=mode)
        sig_len, in_dim = model_input_spec(TINY, tc)
        assert sig_len == TINY.len_ltf // red
        x = jnp.ones((4, TINY.len_ltf))
        p = jnp.zeros((4, TINY.num_tx))
        out = preprocess_input(TINY, tc, x, p)
        assert out.shape == (4, in_dim)
    # fraction option
    tc = TTC.replace(in_fraction=2)
    sig_len, _ = model_input_spec(TINY, tc)
    assert sig_len == TINY.len_ltf // 2


def test_stacked_equals_two_singles():
    params, bn = init_stacked(jax.random.PRNGKey(0), TINY, TTC)
    _, in_dim = model_input_spec(TINY, TTC)
    x2 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, in_dim))
    y2, _ = stacked_apply(TTC, params, bn, x2, train=False)
    for d in range(2):
        pd = jax.tree.map(lambda l: l[d], params)
        bd = jax.tree.map(lambda l: l[d], bn)
        yd, _ = csi_mlp_apply(TTC, pd, bd, x2[d], train=False)
        np.testing.assert_allclose(np.asarray(y2[d]), np.asarray(yd),
                                   atol=1e-5)


def test_fit_reduces_loss_and_beats_noise(tiny_ds, tmp_path):
    """A few epochs on noiseless data should fit the LS labels, and the
    complex prediction should approximate h_ls."""
    res = fit(TINY, TTC, tiny_ds, workdir=str(tmp_path), verbose=False)
    h = res.history
    assert h["loss_real"][-1] < h["loss_real"][0]
    assert h["loss_imag"][-1] < h["loss_imag"][0]
    assert np.all(np.isfinite(res.best_val))

    pred, mse = evaluate_dataset(TINY, TTC, res.params, res.bn_state, tiny_ds)
    assert pred.shape == tiny_ds.h_ls.shape
    assert np.all(np.isfinite(mse))

    # checkpoint roundtrip
    ck = load_checkpoint(os.path.join(str(tmp_path), "best"))
    for a, b in zip(jax.tree.leaves(ck["params"]),
                    jax.tree.leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # history + plots written
    assert os.path.exists(os.path.join(str(tmp_path), "history.json"))
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "real_loss_prediction.png"))


def test_predict_complex_consistency(tiny_ds):
    params, bn = init_stacked(jax.random.PRNGKey(3), TINY, TTC)
    sig = jnp.asarray(tiny_ds.rx[0, :, 0])[None]    # (1, L) complex
    P = tiny_ds.pilot_matrix()
    pilot = jnp.asarray(P[:, 1], jnp.float32)[None]
    y = predict_complex(TINY, TTC, params, bn, sig, pilot)
    assert y.shape == (1, TINY.num_carriers)
    assert y.dtype == jnp.complex64


def test_drop_input_changes_prediction(tiny_ds):
    params, bn = init_stacked(jax.random.PRNGKey(4), TINY, TTC)
    p1, _ = evaluate_dataset(TINY, TTC, params, bn, tiny_ds)
    p2, _ = evaluate_dataset(TINY, TTC, params, bn, tiny_ds,
                             drop_input=True,
                             drop_key=jax.random.PRNGKey(9))
    assert not np.allclose(p1, p2)


def test_dataset_save_load_roundtrip(tiny_ds, tmp_path):
    path = os.path.join(str(tmp_path), "ds.npz")
    tiny_ds.save(path)
    ds2 = type(tiny_ds).load(path)
    np.testing.assert_array_equal(ds2.rx, tiny_ds.rx)
    np.testing.assert_array_equal(ds2.h_ls, tiny_ds.h_ls)
    assert ds2.cfg == tiny_ds.cfg
    assert ds2.seed == tiny_ds.seed
    # extract_packets tail slicing (extract_pkt.m semantics)
    tail = ds2.extract_packets(4, reverse=True)
    np.testing.assert_array_equal(tail.rx, tiny_ds.rx[-4:])


def test_packet_key_reproduces_channel(tiny_ds):
    """Dataset's packet_key regenerates the same channel realization.

    Exactness note: path delays reproduce to float ulp; the per-path
    carrier phases exp(-j2πd/λ) amplify ~1-ulp geometry differences
    between compilation contexts by d/λ ≈ 1e5, so the regenerated rx
    matches to ~1e-2 relative L2 rather than bitwise (the evaluator
    therefore consumes the *saved* rx/labels/tau, and only reuses the
    regenerated channel for the data-Tx leg, where a milliradian path
    rotation is benign channel aging). Within one jitted function the
    draw is bit-exact (test_sounding_seed_reproducible)."""
    from mamimo_tpu.pipeline.sounding import sound_packet

    res, chan = sound_packet(
        tiny_ds.cfg, tiny_ds.packet_key(3), tiny_ds.scenario,
        tiny_ds.snr_target, fft_size=4096,
    )
    np.testing.assert_allclose(np.asarray(chan.tau), tiny_ds.tau[3],
                               rtol=1e-6)
    rel = (np.linalg.norm(np.asarray(res.rx) - tiny_ds.rx[3])
           / np.linalg.norm(tiny_ds.rx[3]))
    assert rel < 2e-2, rel


def test_generate_with_ber_and_multiuser():
    """isOnlyCSI=false leg during generation (usr_data{u,5}) and per-user
    multi-user dataset selection."""
    from mamimo_tpu.config import SimConfig

    cfg = SimConfig(num_tx=4, num_rx=2, n_scatterers=8, num_data_symbols=2)
    ds = generate_dataset(cfg, seed=2, num_packets=2, snr_db=15.0,
                          chunk=2, fft_size=8192, with_ber=True)
    assert ds.ber is not None and ds.ber.shape == (2,)
    assert np.all(ds.ber >= 0) and np.all(ds.ber <= 1)

    mu = SimConfig(num_users=2, num_tx=4, num_rx=2, n_scatterers=8)
    d0 = generate_dataset(mu, seed=3, num_packets=2, snr_db=10.0,
                          chunk=2, fft_size=8192, user=0)
    d1 = generate_dataset(mu, seed=3, num_packets=2, snr_db=10.0,
                          chunk=2, fft_size=8192, user=1)
    assert d0.user == 0 and d1.user == 1
    # users have different placements and channels
    assert not np.allclose(d0.rx, d1.rx)
    assert float(d0.scenario.mobile_range) != float(d1.scenario.mobile_range)


def test_steps_per_call_equivalent(tiny_ds):
    """K fused steps per dispatch produce the same training trajectory
    as single-step dispatch (same batches, same rng)."""
    t1 = TTC.replace(epochs=2, steps_per_call=1)
    tk = TTC.replace(epochs=2, steps_per_call=4)
    r1 = fit(TINY, t1, tiny_ds, verbose=False)
    rk = fit(TINY, tk, tiny_ds, verbose=False)
    np.testing.assert_allclose(r1.history["loss_real"],
                               rk.history["loss_real"], rtol=1e-4)
    np.testing.assert_allclose(r1.history["val_loss_imag"],
                               rk.history["val_loss_imag"], rtol=1e-4)


def test_only_real_plane_training(tiny_ds):
    """--onlyReal: the imag plane's weights stay at init."""
    tc = TTC.replace(epochs=2, dims=("real",))
    res = fit(TINY, tc, tiny_ds, verbose=False)
    from mamimo_tpu.models.mlp import init_stacked as _init

    p0, _ = _init(jax.random.PRNGKey(tc.seed), TINY, tc)
    # note: fit splits its key; recompute the init key the same way
    k_init, _ = jax.random.split(jax.random.PRNGKey(tc.seed))
    p0, _ = _init(k_init, TINY, tc)
    w_res = np.asarray(res.params["dense"][0]["w"])
    w_ini = np.asarray(p0["dense"][0]["w"])
    assert np.array_equal(w_res[1], w_ini[1])      # imag untouched
    assert not np.array_equal(w_res[0], w_ini[0])  # real trained


def test_input_norm_rms_scale_equivariance(small_cfg):
    """tcfg.input_norm='rms' (the reference's per-sample RMS recipe,
    massiveMIMO_dataGenerator.py:506-519): training works on
    tiny-magnitude corpora (the sinr-mode gain-0 convention puts
    signals/labels ~100 dB below the snr-mode scale, where plain MSE
    training collapses), and inference is exactly scale-equivariant."""
    import dataclasses

    import jax

    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.loop import evaluate_dataset, fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=5, num_packets=6, snr_db=120.0,
                          chunk=3, fft_size=8192)
    # shrink the corpus to a testbed-like scale: 80 dB down
    tiny = dataclasses.replace(
        ds, rx=ds.rx * 1e-4, h_ls=ds.h_ls * 1e-4,
        h_perfect=ds.h_perfect * 1e-4)
    tcfg = TrainConfig(hidden=(32,), batch_size=16, epochs=3,
                       dropout=0.0, seed=1, input_norm="rms")
    res = fit(cfg, tcfg, tiny, verbose=False)
    assert np.all(np.isfinite(res.best_val))
    # normalized-space loss must actually improve (an unnormalized MSE
    # on 1e-8-power labels would sit at the init bias scale instead)
    assert res.history["val_loss_real"][-1] < \
        res.history["val_loss_real"][0]

    pred1, _ = evaluate_dataset(cfg, tcfg, res.params, res.bn_state,
                                tiny, batch_packets=3)
    scaled = dataclasses.replace(
        tiny, rx=tiny.rx * 37.0, h_ls=tiny.h_ls * 37.0,
        h_perfect=tiny.h_perfect * 37.0)
    pred2, _ = evaluate_dataset(cfg, tcfg, res.params, res.bn_state,
                                scaled, batch_packets=3)
    np.testing.assert_allclose(pred2, pred1 * 37.0, rtol=2e-4)
