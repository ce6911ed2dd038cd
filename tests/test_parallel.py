"""Multi-device tests on the 8-device virtual CPU mesh — the multi-host
"fake backend" the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.parallel.mesh import make_mesh
from mamimo_tpu.parallel.sharded import (
    make_sharded_train_step,
    sharded_ls_estimate,
)
from mamimo_tpu.pipeline.sounding import estimate_from_rx
from mamimo_tpu.pipeline.dataset import generate_dataset


def test_make_mesh():
    m = make_mesh({"data": 4, "model": 2})
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_sharded_ls_matches_single_device(small_cfg):
    """Sequence-parallel LS == single-device LS (psum correctness)."""
    cfg = small_cfg  # num_tx=8 symbols over 8 devices -> 1 symbol each
    ds = generate_dataset(cfg, seed=3, num_packets=2, snr_db=5.0,
                          chunk=2, fft_size=8192)
    rx = jnp.asarray(ds.rx)
    ref, _ = estimate_from_rx(cfg, rx)
    for n_seq in (2, 4, 8):
        mesh = make_mesh({"seq": n_seq},
                         devices=jax.devices()[:n_seq])
        out = sharded_ls_estimate(cfg, mesh, rx)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"n_seq={n_seq}",
        )


def test_dp_tp_train_step_matches_single(small_cfg):
    """One DP+TP sharded step == one unsharded step (same seed/batch)."""
    cfg = small_cfg
    tcfg = TrainConfig(hidden=(64, 64), batch_size=16, dropout=0.0,
                       method="default", seed=0)
    mesh = make_mesh({"data": 4, "model": 2})
    init_fn, step_fn = make_sharded_train_step(cfg, tcfg, mesh)
    key = jax.random.PRNGKey(0)
    params, bn, opt_state = init_fn(key)

    rng = np.random.default_rng(0)
    bsz = 16
    x2 = jnp.asarray(rng.standard_normal((2, bsz, cfg.len_ltf)),
                     jnp.float32)
    pilot = jnp.asarray(rng.standard_normal((bsz, cfg.num_tx)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((2, bsz, cfg.num_carriers)),
                     jnp.float32)
    kstep = jax.random.PRNGKey(7)
    p1, bn1, _, loss1 = step_fn(params, bn, opt_state, x2, pilot, y2,
                                kstep, 1e-3)

    # unsharded oracle
    import optax
    from mamimo_tpu.models.mlp import (
        init_stacked, preprocess_input, stacked_apply,
    )

    params0, bn0 = init_stacked(key, cfg, tcfg)
    opt = optax.scale_by_adam()
    opt_state0 = opt.init(params0)

    def loss_fn(p, b):
        xin = preprocess_input(cfg, tcfg, x2, jnp.stack([pilot, pilot]))
        pred, new_bn = stacked_apply(tcfg, p, b, xin, train=True, rng=kstep)
        per = jnp.mean((pred - y2) ** 2, axis=(1, 2))
        return jnp.sum(per), (per, new_bn)

    (_, (loss0, bn0n)), g = jax.value_and_grad(loss_fn, has_aux=True)(
        params0, bn0)
    up, _ = opt.update(g, opt_state0, params0)
    p0 = optax.apply_updates(params0, jax.tree.map(lambda u: -1e-3 * u, up))

    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss0),
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_params_actually_sharded(small_cfg):
    cfg = small_cfg
    tcfg = TrainConfig(hidden=(64, 64))
    mesh = make_mesh({"data": 4, "model": 2})
    init_fn, _ = make_sharded_train_step(cfg, tcfg, mesh)
    params, _, _ = init_fn(jax.random.PRNGKey(0))
    w0 = params["dense"][0]["w"]
    # column-parallel layer 0: sharded over last dim
    assert len(w0.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in w0.addressable_shards}
    assert shard_shapes == {(2, cfg.len_ltf + cfg.num_tx, 32)}


def test_fit_with_mesh(small_cfg):
    """fit(mesh=...) trains DP+TP end-to-end on the virtual mesh."""
    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.loop import fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=21, num_packets=8, snr_db=120.0,
                          chunk=4, fft_size=8192)
    tcfg = TrainConfig(hidden=(64, 64), batch_size=16, epochs=2,
                       early_stop_patience=50, seed=0)
    mesh = make_mesh({"data": 4, "model": 2})
    res = fit(cfg, tcfg, ds, verbose=False, mesh=mesh)
    assert res.epochs_ran == 2
    assert np.all(np.isfinite(res.best_val))
    assert res.history["loss_real"][1] < res.history["loss_real"][0] * 1.5


def test_fit_mesh_host_stream_matches(small_cfg, tmp_path):
    """fit(mesh=..., host_stream=True) — native-loader batches
    device_put pre-sharded on the data axis — reproduces the in-HBM
    mesh gather path's loss trajectory (identical batches + rng)."""
    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.loop import fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=22, num_packets=8, snr_db=120.0,
                          chunk=4, fft_size=8192)
    tcfg = TrainConfig(hidden=(64, 64), batch_size=16, epochs=2,
                       early_stop_patience=50, seed=0)
    mesh = make_mesh({"data": 4, "model": 2})
    r_mem = fit(cfg, tcfg, ds, verbose=False, mesh=mesh)
    r_str = fit(cfg, tcfg, ds, verbose=False, mesh=mesh,
                host_stream=True, workdir=str(tmp_path))
    np.testing.assert_allclose(r_str.history["loss_real"],
                               r_mem.history["loss_real"], rtol=2e-4)
    np.testing.assert_allclose(r_str.history["val_loss_imag"],
                               r_mem.history["val_loss_imag"], rtol=2e-4)


def test_sharded_all_pairs_inference(small_cfg):
    """Antenna-pair-sharded inference == unsharded factored inference."""
    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs
    from mamimo_tpu.parallel.sharded import sharded_predict_all_pairs

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(64, 32))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.len_ltf, cfg.num_rx, 2))
    rx = (z[..., 0] + 1j * z[..., 1]).astype(jnp.complex64)
    ref = predict_all_pairs(cfg, tcfg, params, bn, rx)
    for n in (2, 4, 8):
        mesh = make_mesh({"antenna": n}, devices=jax.devices()[:n])
        out = sharded_predict_all_pairs(cfg, tcfg, mesh, params, bn, rx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, err_msg=f"n={n}")


def test_halo_sharded_channel_conv(small_cfg):
    """Overlap-save halo-exchange convolution == unsharded convolution,
    and ≈ the exact phase-ramp channel application."""
    from mamimo_tpu.channel.scattering import (
        apply_channel, make_scenario, realize_channel,
    )
    from mamimo_tpu.parallel.halo import (
        apply_channel_taps, channel_taps, sharded_apply_channel,
    )
    from mamimo_tpu.pipeline.sounding import pad_signal
    from mamimo_tpu.ops.ltf import gen_preamble

    cfg = small_cfg
    key = jax.random.PRNGKey(6)
    scen = make_scenario(cfg, key)
    chan = realize_channel(cfg, jax.random.fold_in(key, 0), scen)
    sig = pad_signal(cfg, jnp.asarray(gen_preamble(cfg, cfg.num_tx)))
    # pad so each of 8 chunks exceeds the 512-tap channel memory
    n = max(((sig.shape[0] + 7) // 8) * 8, 8 * 520)
    sig = jnp.concatenate(
        [sig, jnp.zeros((n - sig.shape[0], cfg.num_tx), sig.dtype)])

    taps = channel_taps(cfg, chan, n_taps=512)
    ref = apply_channel_taps(sig, taps)
    for d in (2, 4, 8):
        mesh = make_mesh({"seq": d}, devices=jax.devices()[:d])
        out = sharded_apply_channel(cfg, mesh, sig, taps)
        err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
               / np.linalg.norm(np.asarray(ref)))
        assert err < 1e-4, (d, err)
    # taps vs exact phase-ramp application (band-limitation tolerance)
    exact = apply_channel(cfg, sig, chan, fft_size=8192)
    err2 = (np.linalg.norm(np.asarray(ref) - np.asarray(exact))
            / np.linalg.norm(np.asarray(exact)))
    assert err2 < 5e-2, err2


def test_combined_mesh_estimate_matches_single(small_cfg):
    """The fused LS+DNN estimation over ONE (data x seq x antenna) mesh
    equals the single-device paths (VERDICT r1 #3: the combined mesh)."""
    from mamimo_tpu.models.mlp import init_stacked, predict_all_pairs
    from mamimo_tpu.ops.estimate import ls_estimate_matmul
    from mamimo_tpu.parallel.sharded import sharded_estimate_combined

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(64, 64))
    params, bn = init_stacked(jax.random.PRNGKey(7), cfg, tcfg)
    ds = generate_dataset(cfg, seed=9, num_packets=4, snr_db=0.0,
                          chunk=4, fft_size=8192)
    rx = jnp.asarray(ds.rx)                       # (4, L, R)
    ref_ls = ls_estimate_matmul(cfg, rx)
    ref_dnn = predict_all_pairs(cfg, tcfg, params, bn, rx)

    mesh = make_mesh({"data": 2, "seq": 2, "antenna": 2})
    h_ls, h_dnn = sharded_estimate_combined(cfg, tcfg, mesh, params, bn,
                                            rx)
    np.testing.assert_allclose(np.asarray(h_ls), np.asarray(ref_ls),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(h_dnn), np.asarray(ref_dnn),
                               rtol=2e-4, atol=2e-4)


def test_fit_with_mesh_resume(small_cfg, tmp_path):
    """fit(mesh=...) resumes from a checkpoint: the resumed run re-places
    the saved host state with the mesh shardings and continues."""
    from mamimo_tpu.config import TrainConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.loop import fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=22, num_packets=8, snr_db=120.0,
                          chunk=4, fft_size=8192)
    mesh = make_mesh({"data": 4, "model": 2})
    wd = str(tmp_path / "wd")

    t1 = TrainConfig(hidden=(64, 64), batch_size=16, epochs=1,
                     early_stop_patience=50, seed=0)
    fit(cfg, t1, ds, verbose=False, mesh=mesh, workdir=wd)
    t2 = TrainConfig(hidden=(64, 64), batch_size=16, epochs=3,
                     early_stop_patience=50, seed=0)
    res = fit(cfg, t2, ds, verbose=False, mesh=mesh, workdir=wd,
              resume=True)
    assert res.epochs_ran == 3
    assert len(res.history["loss_real"]) == 3       # spliced history
    assert np.all(np.isfinite(res.best_val))


def test_sharded_pallas_v2_data_and_seq(small_cfg):
    """The PRODUCTION Pallas kernel (ls_planes_pallas_v2, interpret
    mode on the CPU mesh) composed under shard_map — data-sharded and
    seq-sharded with the rectangular partial despread + psum — equals
    the unsharded XLA planes form (VERDICT r3 item 5)."""
    from mamimo_tpu.ops.estimate import ls_estimate_planes
    from mamimo_tpu.parallel.sharded import sharded_ls_pallas_v2

    cfg = small_cfg
    rng = np.random.default_rng(11)
    s = 8                                     # S = B·num_rx samples
    planes = jnp.asarray(
        rng.standard_normal((2, s, cfg.len_ltf)), jnp.float32)
    ref = np.asarray(ls_estimate_planes(cfg, planes))

    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    out = sharded_ls_pallas_v2(cfg, mesh, planes, mode="data",
                               block_samples=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    for n_seq in (2, 4):
        mesh = make_mesh({"seq": n_seq}, devices=jax.devices()[:n_seq])
        out = sharded_ls_pallas_v2(cfg, mesh, planes, mode="seq",
                                   block_samples=2)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4,
                                   err_msg=f"n_seq={n_seq}")
