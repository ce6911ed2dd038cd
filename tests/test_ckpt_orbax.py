"""Orbax checkpoint backend: roundtrip, sharded-state save/restore, and
end-to-end fit/resume (SURVEY.md §5 'orbax-style checkpointing')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mamimo_tpu.config import TrainConfig
from mamimo_tpu.models.mlp import init_stacked
from mamimo_tpu.train.ckpt import load_checkpoint, save_checkpoint


def test_orbax_roundtrip(small_cfg, tmp_path):
    cfg = small_cfg
    tcfg = TrainConfig(hidden=(32, 32))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    opt_state = optax.scale_by_adam().init(params)
    prefix = os.path.join(tmp_path, "ck")
    save_checkpoint(prefix, cfg, tcfg, params, bn, extra={"epoch": 3},
                    opt_state=opt_state, backend="orbax")
    assert os.path.isdir(prefix + ".orbax")
    ck = load_checkpoint(prefix, like_opt_state=opt_state)
    assert ck["tcfg"].hidden == (32, 32)
    assert ck["extra"]["epoch"] == 3
    for a, b in zip(jax.tree.leaves(ck["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert type(ck["opt_state"]) is type(opt_state)
    for a, b in zip(jax.tree.leaves(ck["opt_state"]),
                    jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_sharded_state(small_cfg, tmp_path):
    """Mesh-sharded params save and restore with values intact — the
    multi-host checkpointing path the npz backend can't express."""
    from mamimo_tpu.parallel.mesh import make_mesh
    from mamimo_tpu.parallel.sharded import make_sharded_train_step

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(64, 64))
    mesh = make_mesh({"data": 4, "model": 2})
    init_fn, _ = make_sharded_train_step(cfg, tcfg, mesh)
    params, bn, _ = init_fn(jax.random.PRNGKey(0))
    assert len(params["dense"][0]["w"].sharding.device_set) == 8
    prefix = os.path.join(tmp_path, "sharded")
    save_checkpoint(prefix, cfg, tcfg, params, bn, backend="orbax")
    ck = load_checkpoint(prefix)
    for a, b in zip(jax.tree.leaves(ck["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_resume_with_orbax(small_cfg, tmp_path):
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.train.loop import fit

    cfg = small_cfg
    ds = generate_dataset(cfg, seed=11, num_packets=8, snr_db=120.0,
                          chunk=4, fft_size=8192)
    tcfg = TrainConfig(hidden=(32, 32), batch_size=16, epochs=2,
                       early_stop_patience=50, seed=0,
                       ckpt_backend="orbax")
    wd = str(tmp_path)
    fit(cfg, tcfg, ds, verbose=False, workdir=wd)
    assert os.path.isdir(os.path.join(wd, "last.orbax"))
    # resume picks up the orbax 'last' state and continues
    res = fit(cfg, tcfg.replace(epochs=3), ds, verbose=False, workdir=wd,
              resume=True)
    assert res.epochs_ran == 3
    assert np.all(np.isfinite(res.best_val))


def test_orbax_namedtuple_field_order(small_cfg, tmp_path):
    """Optimizer states restore by FIELD NAME, not alphabetical leaf
    order (a raw-dict restore + tree_unflatten would silently permute a
    NamedTuple whose declaration order isn't alphabetical)."""
    import typing

    class Weird(typing.NamedTuple):
        zeta: jnp.ndarray    # declared before 'alpha' but sorts after
        alpha: jnp.ndarray

    cfg = small_cfg
    tcfg = TrainConfig(hidden=(32, 32))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    opt_state = Weird(zeta=jnp.arange(2.0), alpha=jnp.arange(3.0) + 10.0)
    prefix = os.path.join(tmp_path, "weird")
    save_checkpoint(prefix, cfg, tcfg, params, bn, opt_state=opt_state,
                    backend="orbax")
    ck = load_checkpoint(prefix, like_opt_state=Weird(
        zeta=jnp.zeros(2), alpha=jnp.zeros(3)))
    np.testing.assert_array_equal(np.asarray(ck["opt_state"].zeta),
                                  np.arange(2.0))
    np.testing.assert_array_equal(np.asarray(ck["opt_state"].alpha),
                                  np.arange(3.0) + 10.0)
    # partial load (no opt template) still restores params
    ck2 = load_checkpoint(prefix)
    assert "opt_state" not in ck2
    for a, b in zip(jax.tree.leaves(ck2["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unknown_backend_raises(small_cfg, tmp_path):
    cfg = small_cfg
    tcfg = TrainConfig(hidden=(32, 32))
    params, bn = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    with pytest.raises(ValueError, match="backend"):
        save_checkpoint(os.path.join(tmp_path, "x"), cfg, tcfg, params,
                        bn, backend="hdf5")
