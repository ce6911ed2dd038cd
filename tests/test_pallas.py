"""Pallas kernel correctness vs the XLA reference paths (interpret mode
on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import (
    csi_mlp_apply,
    init_csi_mlp,
    init_stacked,
    preprocess_input,
)
from mamimo_tpu.ops.pallas.fused_ls import ls_estimate_pallas
from mamimo_tpu.ops.pallas.mlp_infer import (
    fold_bn_into_dense,
    mlp_infer_pallas,
)
from mamimo_tpu.pipeline.dataset import generate_dataset
from mamimo_tpu.pipeline.sounding import estimate_from_rx


def test_fold_bn_exact():
    """Folded affine equals inference-mode BN."""
    cfg = SimConfig(num_tx=4, num_rx=2)
    tcfg = TrainConfig(hidden=(32, 16))
    params, bn = init_csi_mlp(jax.random.PRNGKey(0), cfg, tcfg)
    # make BN stats non-trivial
    bn = {"mean": [m + 0.3 for m in bn["mean"]],
          "var": [v * 1.7 for v in bn["var"]]}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.len_ltf + 4))
    ref, _ = csi_mlp_apply(tcfg, params, bn, x, train=False)

    ws, bs, sc, sh = fold_bn_into_dense(tcfg, params, bn)
    h = jnp.maximum(x @ ws[0] + bs[0], 0.0) * sc[0] + sh[0]
    h = jnp.maximum(h @ ws[1] + bs[1], 0.0) * sc[1] + sh[1]
    y = h @ ws[2] + bs[2]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_mlp_infer_pallas_matches_reference():
    cfg = SimConfig(num_tx=4, num_rx=2)
    tcfg = TrainConfig(hidden=(128, 64))
    params, bn = init_csi_mlp(jax.random.PRNGKey(0), cfg, tcfg)
    in_dim = cfg.len_ltf + cfg.num_tx
    x = jax.random.normal(jax.random.PRNGKey(2), (50, in_dim)) * 0.5
    ref, _ = csi_mlp_apply(tcfg, params, bn, x, train=False)
    # f32 dot in interpret mode for a tight comparison
    out = mlp_infer_pallas(tcfg, params, bn, x, block_b=32, block_k=256,
                           dot_dtype=jnp.float32, interpret=True)
    assert out.shape == ref.shape
    err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    scale = np.max(np.abs(np.asarray(ref)))
    assert err < 2e-4 * max(scale, 1.0), (err, scale)


def test_mlp_infer_pallas_bf16_close():
    """bf16 MXU path stays within bf16 tolerance of the f32 reference."""
    cfg = SimConfig(num_tx=4, num_rx=2)
    tcfg = TrainConfig(hidden=(128, 64))
    params, bn = init_csi_mlp(jax.random.PRNGKey(0), cfg, tcfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, cfg.len_ltf + 4))
    ref, _ = csi_mlp_apply(tcfg, params, bn, x, train=False)
    out = mlp_infer_pallas(tcfg, params, bn, x, block_b=32, block_k=256,
                           dot_dtype=jnp.bfloat16, interpret=True)
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 2e-2, rel


def test_fused_ls_matches_reference(small_cfg):
    cfg = small_cfg
    ds = generate_dataset(cfg, seed=7, num_packets=3, snr_db=5.0,
                          chunk=3, fft_size=8192)
    rx = jnp.asarray(ds.rx)
    ref, _ = estimate_from_rx(cfg, rx)
    out = ls_estimate_pallas(cfg, rx, pairs_per_block=2, interpret=True)
    assert out.shape == ref.shape
    err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 2e-4, err


def test_fused_ls_pair_padding(small_cfg):
    """Pair count not divisible by the block size still works."""
    cfg = small_cfg
    ds = generate_dataset(cfg, seed=8, num_packets=1, snr_db=0.0,
                          chunk=1, fft_size=8192)
    rx = jnp.asarray(ds.rx)          # 1 packet × 2 rx = 2 pairs
    ref, _ = estimate_from_rx(cfg, rx)
    out = ls_estimate_pallas(cfg, rx, pairs_per_block=8, interpret=True)
    err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 2e-4, err


def test_ls_planes_pallas_matches_xla():
    """The flat-planes fused LS kernel (DFT + Kronecker block-despread,
    z VMEM-resident) equals ls_estimate_planes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.ops.estimate import ls_estimate_planes
    from mamimo_tpu.ops.pallas import ls_planes_pallas

    cfg = SimConfig(num_tx=8, num_rx=2)
    key = jax.random.PRNGKey(3)
    s = 11                                      # odd: exercises row pad
    planes = jax.random.normal(key, (2, s, cfg.len_ltf))
    ref = np.asarray(ls_estimate_planes(cfg, planes))
    got = np.asarray(ls_planes_pallas(cfg, planes, block_samples=4))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)
    # planes output form
    got_p = np.asarray(ls_planes_pallas(cfg, planes, block_samples=4,
                                        as_planes=True))
    np.testing.assert_allclose(got_p[0] + 1j * got_p[1], ref,
                               rtol=0, atol=2e-4)
    # raw serving form (padded kernel output) densifies to the same
    from mamimo_tpu.ops.pallas.fused_ls import ls_raw_to_complex

    hr, hi = ls_planes_pallas(cfg, planes, block_samples=4, raw=True)
    got_r = np.asarray(ls_raw_to_complex(cfg, hr, hi, s))
    np.testing.assert_allclose(got_r, ref, rtol=0, atol=2e-4)


def test_ls_planes_pallas_v2_matches_xla():
    """v2 of the flat-planes kernel (merged complex dots, decoupled
    DMA/despread blocks, fused ssq) — the path behind the headline
    bench number and CSIPredictor.estimate_full — equals
    ls_estimate_planes, including row padding and the ssq partials."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.ops.estimate import ls_estimate_planes
    from mamimo_tpu.ops.pallas import ls_planes_pallas_v2_constants
    from mamimo_tpu.ops.pallas.fused_ls import (
        ls_planes_pallas_v2,
        ls_v2_to_complex,
    )

    cfg = SimConfig(num_tx=8, num_rx=2)
    key = jax.random.PRNGKey(5)
    s = 11                                      # odd: exercises row pad
    planes = jax.random.normal(key, (2, s, cfg.len_ltf))
    ref = np.asarray(ls_estimate_planes(cfg, planes))
    for dma in (None, 8):                       # default 4x and n_sub=2
        h, ssq = ls_planes_pallas_v2(cfg, planes, block_samples=4,
                                     dma_samples=dma, with_ssq=True)
        got = np.asarray(ls_v2_to_complex(cfg, h, s))
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)
        # ssq partials sum to 8·Σ|h|² over the PADDED rows (pad rows
        # are zero so they do not contribute)
        tot = float(np.asarray(jnp.sum(ssq)) / 8.0)
        want = float(np.sum(np.abs(ref) ** 2))
        np.testing.assert_allclose(tot, want, rtol=1e-3)
