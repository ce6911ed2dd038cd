"""Fused factored all-pairs Pallas kernel vs the XLA reference paths.

Validates the round-2 production hot path (ops/pallas/fused_factored.py)
against models/mlp.py::predict_all_pairs (itself validated against the
per-sample reference forward pass in test_predict_all_pairs.py), and the
planes-layout LS estimator against the matmul form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import (
    init_stacked,
    predict_all_pairs,
    predict_all_pairs_planes,
)
from mamimo_tpu.ops.estimate import (
    ls_estimate_matmul,
    ls_estimate_planes,
    ls_matmul_constants,
    ls_planes_constants,
)
from mamimo_tpu.ops.pallas import (
    predict_all_pairs_planes_pallas,
    prepare_factored_weights,
)

CFG = SimConfig(num_tx=8, num_rx=2)
TCFG = TrainConfig(hidden=(128, 128))


def _rx(b=3, seed=0):
    key = jax.random.PRNGKey(seed)
    z = jax.random.normal(key, (b, CFG.len_ltf, CFG.num_rx, 2))
    return jax.lax.complex(z[..., 0], z[..., 1])


def _planes(rx):
    """time-major complex -> canonical rx-major planes (2, B, R, L)."""
    rxm = jnp.transpose(rx, (0, 2, 1))
    return jnp.stack([jnp.real(rxm), jnp.imag(rxm)])


def test_planes_wrapper_matches_time_major():
    params, bn = init_stacked(jax.random.PRNGKey(1), CFG, TCFG)
    rx = _rx()
    ref = predict_all_pairs(CFG, TCFG, params, bn, rx)
    got = predict_all_pairs_planes(CFG, TCFG, params, bn, _planes(rx))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 2, 1))), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("dot_dtype,tol", [
    (jnp.float32, 2e-4),
    (jnp.bfloat16, 0.08),
])
def test_fused_factored_kernel_matches_xla(dot_dtype, tol):
    params, bn = init_stacked(jax.random.PRNGKey(2), CFG, TCFG)
    rx = _rx(b=2, seed=3)
    planes = _planes(rx)
    ref = predict_all_pairs_planes(CFG, TCFG, params, bn, planes)

    prep = prepare_factored_weights(CFG, TCFG, params, bn,
                                    dot_dtype=dot_dtype)
    got = predict_all_pairs_planes_pallas(
        CFG, TCFG, prep, planes,
        block_s=64, block_k=512, dot_dtype=dot_dtype, out_dtype=jnp.float32,
    )
    r = np.asarray(ref)
    g = np.asarray(got)
    assert g.shape == r.shape
    scale = np.abs(r).max()
    np.testing.assert_allclose(g, r, atol=tol * scale)


def test_fused_factored_unaligned_batch():
    """S and L not multiples of the block sizes exercise the pad path."""
    params, bn = init_stacked(jax.random.PRNGKey(4), CFG, TCFG)
    rx = _rx(b=3, seed=5)                      # S = 6, L = 2560
    planes = _planes(rx)
    ref = predict_all_pairs_planes(CFG, TCFG, params, bn, planes)
    prep = prepare_factored_weights(CFG, TCFG, params, bn,
                                    dot_dtype=jnp.float32)
    got = predict_all_pairs_planes_pallas(
        CFG, TCFG, prep, planes,
        block_s=128, block_k=384, dot_dtype=jnp.float32,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ls_planes_matches_matmul_form():
    rx = _rx(b=4, seed=6)
    ref = ls_estimate_matmul(CFG, rx, ls_matmul_constants(CFG))
    planes = _planes(rx)
    got = ls_estimate_planes(
        CFG, planes.reshape(2, -1, CFG.len_ltf), ls_planes_constants(CFG)
    )  # (S, ntx, C) rx-major
    got = got.reshape(4, CFG.num_rx, CFG.num_tx, CFG.num_carriers)
    got_tm = jnp.transpose(got, (0, 3, 2, 1))
    np.testing.assert_allclose(np.asarray(got_tm), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ls_planes_bf16_close_to_f32():
    """bf16 MXU DFT (f32 accumulation) stays within bf16 quantization
    (~0.4% relative) of the f32 LS estimate — far below the LS noise
    floor at any operating SNR."""
    rx = _rx(b=4, seed=7)
    planes = _planes(rx).reshape(2, -1, CFG.len_ltf)
    consts = ls_planes_constants(CFG)
    ref = np.asarray(ls_estimate_planes(CFG, planes, consts))
    got = np.asarray(ls_estimate_planes(CFG, planes, consts,
                                        dtype=jnp.bfloat16))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)


def test_dataset_rx_planes_layout():
    """CSIDataset.rx_planes emits the canonical flat planes layout and
    the planes hot path reproduces the time-major estimate on it."""
    from mamimo_tpu.pipeline.dataset import generate_dataset

    ds = generate_dataset(CFG, seed=31, num_packets=3, snr_db=0.0,
                          chunk=3, fft_size=8192)
    planes = jnp.asarray(ds.rx_planes())
    assert planes.shape == (2, 3 * CFG.num_rx, CFG.len_ltf)
    ref = ls_estimate_matmul(CFG, jnp.asarray(ds.rx),
                             ls_matmul_constants(CFG))
    got = ls_estimate_planes(CFG, planes, ls_planes_constants(CFG))
    got = got.reshape(3, CFG.num_rx, CFG.num_tx, CFG.num_carriers)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 2, 1))), np.asarray(ref),
        rtol=2e-4, atol=2e-4)


def test_hybrid_bench_path_matches_xla():
    """make_estimation_fn_planes(ls_pallas=True, input_bf16=True) — the
    production bench path — matches the pure-XLA f32 path to bf16
    tolerance on both products."""
    from mamimo_tpu.bench import make_estimation_fn_planes

    params, bn = init_stacked(jax.random.PRNGKey(11), CFG, TCFG)
    rx = _rx(b=2, seed=12)
    planes = _planes(rx).reshape(2, -1, CFG.len_ltf)

    def run(step, arg):
        # unwrap the chained-step product by recomputing the core:
        # time the reduce path only for API smoke; compare cores below
        return step(arg)

    ref_step = make_estimation_fn_planes(CFG, TCFG, params, bn)
    hyb_step = make_estimation_fn_planes(CFG, TCFG, params, bn,
                                         input_bf16=True, ls_pallas=True)
    _, s_ref = ref_step(planes)
    _, s_hyb = hyb_step(planes.astype(jnp.bfloat16))
    # the value-visible reduction over (h_ls, h_dnn) agrees to bf16
    # input-quantization tolerance
    np.testing.assert_allclose(float(s_hyb), float(s_ref), rtol=0.05)
