"""Throughput benchmark: channel estimates/s/chip.

The headline metric (BASELINE.md): complete channel estimates per second
per chip for the BS32 configuration — one "estimate" is one (Tx, Rx)
link's 234-subcarrier complex CSI produced from the raw time-domain
preamble, i.e. the full fused path

    rx preamble (B, 10240, Nr) ──demod+LS──▶ (B, C, Nt, Nr)
                                └─DNN (real+imag MLPs)─▶ (B, C, Nt, Nr)

The reference's corresponding harness is the TF-profiler timing loop at
``massiveMIMO_CSI_prediction_DNN.py:441-475`` (batch = Nt·Nr = 128) and
the published CPU-vs-GPU bar figure. Since the reference repo vendors no
machine-readable numbers (BASELINE.md), ``vs_baseline`` compares against
a reference-equivalent implementation measured on this host's CPU with
torch (two real-valued Keras-architecture MLPs, batch 128), cached in
``.bench_baseline.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _torch_cpu_baseline(cfg, hidden=(1024, 1024), batch=128,
                        iters=10) -> float:
    """Reference-equivalent DNN inference on CPU (torch): two real MLPs,
    per-plane predict like CSIPredictor.inference (inference.py:24-32).

    Returns channel estimates per second.
    """
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    in_dim = cfg.len_ltf + cfg.num_tx
    layers = []
    d = in_dim
    for h in hidden:
        layers += [torch.nn.Linear(d, h), torch.nn.ReLU(),
                   torch.nn.BatchNorm1d(h)]
        d = h
    layers += [torch.nn.Linear(d, cfg.num_carriers)]
    net_r = torch.nn.Sequential(*layers).eval()
    net_i = torch.nn.Sequential(*[type(m)(*_ctor_args(m)) for m in layers]
                                ).eval()
    x = torch.randn(batch, in_dim)
    with torch.no_grad():
        net_r(x); net_i(x)                       # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            net_r(x)
            net_i(x)
        dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _ctor_args(m):
    import torch

    if isinstance(m, torch.nn.Linear):
        return (m.in_features, m.out_features)
    if isinstance(m, torch.nn.BatchNorm1d):
        return (m.num_features,)
    return ()


def _get_baseline(cfg, cache_path: str) -> float:
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["cpu_estimates_per_s"]
    batch = cfg.num_tx * cfg.num_rx   # the reference's test batch (:337-339)
    try:
        val = _torch_cpu_baseline(cfg, batch=batch)
    except Exception as e:                        # pragma: no cover
        print(f"[bench] baseline measurement failed ({e}); using 1.0",
              file=sys.stderr)
        val = 1.0
    with open(cache_path, "w") as f:
        json.dump({"cpu_estimates_per_s": val,
                   "note": "torch-CPU reference-equivalent DNN inference, "
                           f"batch {batch} (massiveMIMO_CSI_prediction_DNN"
                           ".py:441-475 harness equivalent)"}, f)
    return val


def _abs_sum(out):
    """Scalar float32 reduction over every output leaf (value-visible).

    Squared magnitude, not |x|: it depends on every element just the
    same, but skips 30M+ sqrts per iteration on the VPU — the reduction
    must not become a measurable fraction of the timed step."""
    import jax
    import jax.numpy as jnp

    def one(l):
        if jnp.iscomplexobj(l):
            return (jnp.sum(jnp.real(l) ** 2) + jnp.sum(jnp.imag(l) ** 2)
                    ).astype(jnp.float32)
        return jnp.sum(l.astype(jnp.float32) ** 2)

    return sum(one(l) for l in jax.tree.leaves(out))


def _perturb(rx, s):
    """Perturb the input by a value-visible (~1e-6 relative) function of
    the output reduction — chains iterations so calls serialize and a
    value-hashing result cache never hits.

    Only the first 8 rows of the second axis are touched: enough to
    change the input value (and thus every chained output) each
    iteration, but ~1 MB of writes instead of a full read+write of the
    hundreds-of-MB input — a whole-tensor multiply measured 2.4 ms/iter
    at batch 1024 (scripts/probe_r2b.py), silently inflating every
    timed path by ~25%."""
    import jax
    import jax.numpy as jnp

    # bf16 inputs: 1+1e-6 rounds to exactly 1.0 (8-bit mantissa) and the
    # chain would break; use a relative scale the dtype can represent
    rel = 1e-2 if rx.dtype in (jnp.bfloat16, jnp.float16) else 1e-6
    eps = rel * s * jax.lax.rsqrt(s * s + 1.0)
    scale = (1.0 + eps).astype(rx.dtype)
    if rx.ndim < 2:
        return rx * scale
    n = min(8, rx.shape[1])
    return rx.at[:, :n].multiply(scale)


def _chained_step(core, extra=(), unroll: int = 1):
    """Wrap an un-jitted core fn into a single jitted timing step

        step(rx) -> (perturbed rx, scalar)

    so one benchmark iteration costs exactly ONE dispatch (the tunnel
    RPC is ~2 ms; reduce+chain as separate programs would triple it).
    ``extra`` (e.g. weight pytrees) stays a jit *argument*, never a
    closure constant (axon compile rule, see PERF.md).

    With unroll=K the step runs K *chained* core evaluations under one
    `lax.scan` — one dispatch, K full batches, each iteration's input a
    value-visible function of the previous output (no caching, no
    reordering possible). This measures STEADY-STATE on-device
    throughput with the per-dispatch RPC floor (~1.9 ms on the tunneled
    runtime, measured by the `noop` path) amortized K-fold — the number
    a pipelined production server sees."""
    import jax

    @jax.jit
    def _step(ex, rx):
        def one(r):
            out = core(*ex, r)
            s = _abs_sum(out)
            return _perturb(r, s), s

        if unroll == 1:
            return one(rx)
        rx, ss = jax.lax.scan(lambda r, _: one(r), rx, None, length=unroll)
        return rx, ss[-1]

    return lambda rx: _step(extra, rx)


def _chained_step_invariant(core, extra, perturb, unroll: int = 1):
    """Timing step with loop-INVARIANT big operands: ``step(s) -> (s', s')``.

    The round-2 harness chained iterations by perturbing 8 rows of the
    input *carried through the scan* — measured 0.70 ms/iteration at
    batch 1024, almost all of it XLA double-buffering the 168 MB carry
    (scripts/probe_r3a.py `noop_u8`). Here the batch and weights ride as
    jit arguments that never change across iterations (no carry copy);
    the value-visible chain runs through a (1+eps(s)) scale applied by
    ``perturb(extra, eps)`` to SMALL constants every output element
    depends on (the LS DFT matrix / the layer-1 bias). Serialization is
    unchanged: iteration i+1's outputs are a numeric function of the
    full reduction of iteration i's outputs, and each dispatch's scalar
    input differs, so a value-hashing result cache never hits.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _step(ex, s):
        def one(s, _):
            # bf16-representable relative scale (see _perturb)
            eps = 1e-2 * s * jax.lax.rsqrt(s * s + 1.0)
            out = core(*perturb(ex, eps))
            return _abs_sum(out), None

        s, _ = jax.lax.scan(one, s, None, length=unroll)
        return s, s

    # pin the seed's aval: a python-float warmup followed by
    # device-scalar timed calls would otherwise compile TWO executables
    # and pay the second's load inside the first timed iteration
    return lambda s: _step(extra, jnp.asarray(s, jnp.float32))


def make_estimation_fn_serving_r3(cfg, tcfg, params, bn_state,
                                  unroll: int = 8, block_samples: int = 8,
                                  dma_samples: int | None = None):
    """Round-3 serving hot path: LS v2 kernel (merged complex dots,
    decoupled DMA/despread blocks, fused Σh² benchmark reduction) + the
    XLA factored bf16 DNN, timed under the invariant-operand harness.

    Step input is a float32 scalar seed; the bf16 planes batch rides as
    an invariant jit argument. Per iteration the LS estimate tensor is
    fully computed and written to HBM (bf16 serving form) — only the
    benchmark checksum comes from the kernel's fused partials instead of
    an extra HBM re-read.
    """
    import jax.numpy as jnp

    from mamimo_tpu.models.mlp import _factored_all_pairs
    from mamimo_tpu.ops.pallas import ls_planes_pallas_v2_constants
    from mamimo_tpu.ops.pallas.fused_ls import ls_planes_pallas_v2

    if dma_samples is None:
        # ~1024 rows per DMA block: amortizes per-grid-step overheads
        # while the block's f32 intermediates stay within VMEM at any Nt
        dma_samples = max(block_samples, 1024 // cfg.num_tx)
    consts = ls_planes_pallas_v2_constants(cfg, block_samples,
                                           dtype=jnp.bfloat16)

    def core(p, bn, c, planes):
        _, ssq = ls_planes_pallas_v2(
            cfg, planes, c, block_samples=block_samples,
            dma_samples=dma_samples, with_ssq=True,
            out_dtype=jnp.bfloat16)
        y2 = _factored_all_pairs(cfg, tcfg, p, bn, planes,
                                 dtype=jnp.bfloat16).astype(jnp.bfloat16)
        return ssq, y2

    def perturb(ex, eps):
        p, bn, c, planes = ex
        b, k = c
        scale = 1.0 + eps
        # scale the DFT constant (every LS output element) and the
        # layer-1 bias (every DNN output element, through relu+BN+W2/W3)
        b2 = b * scale.astype(b.dtype)
        b1 = p["dense"][0]["b"] * scale
        p2 = {**p, "dense": [{**p["dense"][0], "b": b1}]
              + list(p["dense"][1:])}
        return p2, bn, (b2, k), planes

    def make(planes):
        return _chained_step_invariant(
            core, (params, bn_state, consts, planes), perturb,
            unroll=unroll)

    return make


def make_estimation_fn(cfg, tcfg, params, bn_state,
                       use_pallas: bool = False, chained: bool = False,
                       use_bf16: bool = False, from_planes: bool = False):
    """Build the jitted fused estimation step: raw preamble batch ->
    (LS estimate, DNN estimate). With use_pallas=True the LS despread
    and the MLP run through the fused Pallas kernels. With use_bf16=True
    the DNN matmuls run in bfloat16 (LS stays float32). With
    chained=True returns a timing step rx -> (rx', scalar) with the
    reduce+chain fused into the same program (see _chained_step). With
    from_planes=True the step input is canonical (2, B, R, L) planes and
    the time-major complex conversion runs inside the step."""
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.models.mlp import preprocess_input
    from mamimo_tpu.ops.ltf import pilot_p_matrix
    from mamimo_tpu.pipeline.sounding import estimate_from_rx

    from mamimo_tpu.models.mlp import predict_all_pairs

    if use_pallas:
        from mamimo_tpu.ops.pallas import ls_estimate_pallas, mlp_infer_pallas

        P = pilot_p_matrix(cfg.num_tx)

    from mamimo_tpu.ops.estimate import ls_estimate_matmul, ls_matmul_constants

    ls_consts = ls_matmul_constants(cfg)

    # NOTE: params/bn_state are jit *arguments*, never closure constants —
    # the axon TPU backend fails to compile programs that combine complex
    # inputs with large embedded weight literals, and argument-passing is
    # the right design anyway (no giant constants in the executable).
    def _estimate(p, bn, lsc, rx):
        """rx: (B, len_ltf, num_rx) complex64 (or canonical planes when
        from_planes=True)."""
        if from_planes:
            rx = _planes_to_time_major(rx, cfg.num_rx)
        b = rx.shape[0]
        if use_pallas:
            h_ls = ls_estimate_pallas(cfg, rx)
            # materialized-input DNN path through the fused MLP kernel
            sig = jnp.transpose(rx, (0, 2, 1))         # (B, R, L)
            sig = jnp.broadcast_to(
                sig[:, :, None, :],
                (b, cfg.num_rx, cfg.num_tx, cfg.len_ltf),
            ).reshape(b * cfg.num_rx * cfg.num_tx, cfg.len_ltf)
            pil = jnp.broadcast_to(
                P.T[None], (b * cfg.num_rx, cfg.num_tx, cfg.num_tx)
            ).reshape(-1, cfg.num_tx)
            xr = preprocess_input(cfg, tcfg, jnp.real(sig), pil)
            xi = preprocess_input(cfg, tcfg, jnp.imag(sig), pil)
            pp = [jax.tree.map(lambda l, d=d: l[d], p) for d in range(2)]
            bb = [jax.tree.map(lambda l, d=d: l[d], bn) for d in range(2)]
            yr = mlp_infer_pallas(tcfg, pp[0], bb[0], xr)
            yi = mlp_infer_pallas(tcfg, pp[1], bb[1], xi)
            h_dnn = (yr + 1j * yi).reshape(
                b, cfg.num_rx, cfg.num_tx, cfg.num_carriers
            )
            h_dnn = jnp.transpose(h_dnn, (0, 3, 2, 1))
        else:
            h_ls = ls_estimate_matmul(cfg, rx, lsc)
            # factored all-pairs inference (layer-1 signal matmul shared
            # across the num_tx pilot columns)
            h_dnn = predict_all_pairs(
                cfg, tcfg, p, bn, rx,
                dtype=jnp.bfloat16 if use_bf16 else None)
        return h_ls, h_dnn

    if chained:
        return _chained_step(_estimate, (params, bn_state, ls_consts))
    _jitted = jax.jit(_estimate)
    return lambda rx: _jitted(params, bn_state, ls_consts, rx)


def make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                              use_bf16: bool = False,
                              ls_bf16: bool = False, unroll: int = 1,
                              input_bf16: bool = False,
                              ls_pallas: bool = False,
                              dnn_int8: bool = False,
                              serving_planes: bool = False):
    """Fused estimation step on the framework's CANONICAL raw layout:
    rx-major float32 planes (2, B, num_rx, len_ltf) — what the dataset
    pipeline stores and the loaders emit (complex64 cannot even cross
    the host↔device boundary on this backend). No complex extraction,
    no big-tensor transposes; the CP drop is zero rows folded into the
    DFT matrix. Outputs stay rx-major. Returns a chained timing step.
    ls_bf16 runs the LS DFT matmuls on the bf16 MXU path (f32
    accumulation, see ls_estimate_planes)."""
    import jax.numpy as jnp

    from mamimo_tpu.models.mlp import predict_all_pairs_planes_flat
    from mamimo_tpu.ops.estimate import ls_estimate_planes, ls_planes_constants

    # input_bf16: the step input is bf16 planes (the deploy storage
    # format — quantization ~−50 dB, far below any operating SNR's LS
    # noise floor; never for noiseless label generation). Constants are
    # PRE-cast so no in-graph downcast exists for
    # --xla_allow_excess_precision to elide.
    if ls_pallas:
        from mamimo_tpu.ops.pallas import (
            ls_planes_pallas,
            ls_planes_pallas_constants,
        )

        ls_consts = ls_planes_pallas_constants(
            cfg, dtype=jnp.bfloat16 if input_bf16 else None)
    else:
        ls_consts = ls_planes_constants(
            cfg, dtype=jnp.bfloat16 if (ls_bf16 or input_bf16) else None)

    if dnn_int8:
        # int8 weights folded once outside the timed step (deploy-time
        # artifact); the v5e MXU runs s8×s8→s32 at 2× the bf16 rate
        import jax

        from mamimo_tpu.models.quant import (
            predict_all_pairs_planes_flat_int8,
            quantize_params_int8,
        )

        qparams = jax.jit(
            lambda p, b: quantize_params_int8(
                tcfg, p, b, sig_len=cfg.len_ltf))(params, bn_state)

        def _estimate_q(qp, lsc, planes):
            if ls_pallas:
                h_ls = ls_planes_pallas(cfg, planes, lsc)
            else:
                h_ls = ls_estimate_planes(cfg, planes, lsc)
            h_dnn = predict_all_pairs_planes_flat_int8(
                cfg, tcfg, qp, planes)
            return h_ls, h_dnn

        return _chained_step(_estimate_q, (qparams, ls_consts),
                             unroll=unroll)

    if serving_planes:
        # SERVING output form: everything stays real planes — complex64
        # cannot cross the host↔device boundary on this backend, so a
        # server fetching results pays the plane split anyway; the
        # device-side slice + lax.complex interleave of the other paths
        # (~3 HBM passes over ~500 MB at batch 1024) is skipped. LS
        # output keeps the kernel's padded-lane layout; the DNN output
        # is the (2, S, ntx, C) f32 planes pair.
        from mamimo_tpu.models.mlp import _factored_all_pairs

        def _estimate_sp(p, bn, lsc, planes):
            # bf16 OUTPUT storage too: halves the ~500 MB of output
            # writes per batch-1024 step. Quantization −50 dB — far
            # below the estimator's own −10 dB NMSE floor; the casts
            # fuse into the producing matmul epilogues.
            h_ls = ls_planes_pallas(cfg, planes, lsc, raw=True,
                                    out_dtype=jnp.bfloat16)
            y2 = _factored_all_pairs(cfg, tcfg, p, bn, planes,
                                     dtype=jnp.bfloat16
                                     ).astype(jnp.bfloat16)
            return h_ls, y2

        return _chained_step(_estimate_sp, (params, bn_state, ls_consts),
                             unroll=unroll)

    def _estimate(p, bn, lsc, planes):
        """planes: FLAT canonical (2, S, len_ltf) float32 (or bfloat16
        with input_bf16), S = B·num_rx (sublane-aligned sample axis —
        see predict_all_pairs_planes_flat)."""
        if ls_pallas:
            h_ls = ls_planes_pallas(cfg, planes, lsc)
        else:
            h_ls = ls_estimate_planes(
                cfg, planes, lsc,
                dtype=(jnp.bfloat16 if (ls_bf16 and not input_bf16)
                       else None))
        h_dnn = predict_all_pairs_planes_flat(
            cfg, tcfg, p, bn, planes,
            dtype=jnp.bfloat16 if (use_bf16 or input_bf16) else None)
        return h_ls, h_dnn

    return _chained_step(_estimate, (params, bn_state, ls_consts),
                         unroll=unroll)


def make_estimation_fn_pallas_factored(cfg, tcfg, params, bn_state,
                                       block_s: int = 128,
                                       block_k: int = 1024,
                                       unroll: int = 1):
    """The production Pallas hot path: fused factored all-pairs DNN
    kernel (ops/pallas/fused_factored.py — W1 streamed through VMEM,
    pilot heads expanded on-chip, bf16 MXU) + the planes LS matmuls.
    Weight folding (BN affines, pilot-head biases, bf16 casts) happens
    ONCE here — it is per-weight-set deploy work, not per-batch work.
    Returns a chained timing step on canonical planes input."""
    import jax
    import jax.numpy as jnp

    from mamimo_tpu.ops.estimate import ls_estimate_planes, ls_planes_constants
    from mamimo_tpu.ops.pallas import (
        fused_factored_planes,
        prepare_factored_weights,
    )

    ls_consts = ls_planes_constants(cfg)
    prepared = prepare_factored_weights(cfg, tcfg, params, bn_state)

    def _estimate(prep, lsc, planes):
        """planes: FLAT canonical (2, S, len_ltf) float32."""
        h_ls = ls_estimate_planes(cfg, planes, lsc)      # (S, ntx, C)
        y = fused_factored_planes(cfg, tcfg, prep, planes,
                                  block_s=block_s, block_k=block_k)
        # kernel output is head-major (2, ntx, S, C); complexify + match
        # the (S, ntx, C) convention inside the timed step
        h_dnn = jax.lax.complex(
            y[0].astype(jnp.float32), y[1].astype(jnp.float32)
        ).swapaxes(0, 1)
        return h_ls, h_dnn

    return _chained_step(_estimate, (prepared, ls_consts), unroll=unroll)


def _planes_to_time_major(planes, num_rx):
    """FLAT (2, S, L) planes -> (B, L, R) complex64 (inside jit)."""
    import jax
    import jax.numpy as jnp

    rx = jax.lax.complex(planes[0], planes[1])        # (S, L)
    s, L = rx.shape
    rx = rx.reshape(s // num_rx, num_rx, L)           # (B, R, L)
    return jnp.transpose(rx, (0, 2, 1))


def _time_fn(step, arg, iters, per_call: int = 1):
    """Honest timing on async/remote runtimes. Three defenses:

    * a data-dependency chain — each call's input is perturbed by a
      VALUE-VISIBLE (~1e-6 relative) function of the previous output, so
      calls serialize and a value-hashing result cache never hits
      (fused into the step program itself: one dispatch per iteration);
    * a forced float32 *scalar fetch* per timing window — on the
      tunneled TPU backend `block_until_ready` acknowledges before
      execution (independent identical calls "measured" 1 EFLOP/s);
      a host transfer is the only true barrier;
    * warmup includes one forced fetch, so compile time stays out.

    ``step(rx) -> (rx', scalar)`` comes from `_chained_step`; with
    ``per_call=K`` (a scan-unrolled step) the per-iteration time is
    dt / (iters · K).
    """
    rx, s = step(arg)                        # warmup/compile
    float(s)                                 # forced warm fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        rx, s = step(rx)
    float(s)                                 # true barrier: scalar fetch
    return (time.perf_counter() - t0) / (iters * per_call)


def run_train_bench(batch_sizes=(256, 1024), steps_per_call: int = 16,
                    calls: int = 10, num_packets: int = 64,
                    repo_root: str | None = None,
                    print_result: bool = True) -> dict:
    """Training-throughput benchmark: optimizer steps/s and achieved
    TFLOP/s for the BS32 train step on one chip.

    Measures the production path of train/loop.py::make_train_step —
    in-jit batch gather from the device dataset, per-plane AWGN draw,
    value_and_grad of the stacked real+imag MLP, Adam update with
    donated params/opt state — scanned ``steps_per_call`` steps per
    dispatch exactly like ``fit(steps_per_call=K)``. Chaining is
    intrinsic (each step consumes the previous step's params), and a
    float32 loss fetch closes every timing window; FLOPs are counted as
    3× forward (fwd + 2× for the backward) over the three dense layers
    of both planes. The matching reference harness is the Keras fit it
    replaces (massiveMIMO_CSI_prediction_DNN.py:283-328).
    """
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(root, ".jax_cache"))

    import jax
    import jax.numpy as jnp
    import optax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked, model_input_spec
    from mamimo_tpu.train.loop import make_optimizer, make_train_step

    cfg = SimConfig(num_tx=int(os.environ.get("BENCH_NT", "32")),
                    num_rx=int(os.environ.get("BENCH_NR", "4")))
    key = jax.random.PRNGKey(0)

    # synthetic device dataset in the training container layout
    # (content does not affect timing; complex arrays built inside jit)
    @jax.jit
    def _mk_data(k):
        k1, k2 = jax.random.split(k)
        rx = jax.random.normal(
            k1, (num_packets, cfg.len_ltf, cfg.num_rx, 2))
        h = jax.random.normal(
            k2, (num_packets, cfg.num_carriers, cfg.num_tx,
                 cfg.num_rx, 2))
        from mamimo_tpu.ops.ltf import pilot_p_matrix

        return {"rx": jax.lax.complex(rx[..., 0], rx[..., 1]),
                "h": jax.lax.complex(h[..., 0], h[..., 1]),
                "P": pilot_p_matrix(cfg.num_tx).astype(jnp.float32)}

    data = _mk_data(key)
    n_samples = num_packets * cfg.num_tx * cfg.num_rx
    results = {}
    # variant grammar: '<f32|bf16>[_rbg][_mubf16]' — matmul dtype,
    # hardware-RNG AWGN, bf16 Adam first-moment storage. Override the
    # grid via env (BENCH_TRAIN_VARIANTS / BENCH_TRAIN_BATCHES) so the
    # headline-compat rows and the batch-scaling push can run as
    # separate invocations without recompiling the union every time.
    variants = tuple(os.environ.get(
        "BENCH_TRAIN_VARIANTS", "f32,bf16,f32_rbg").split(","))
    if os.environ.get("BENCH_TRAIN_BATCHES"):
        batch_sizes = tuple(
            int(b) for b in os.environ["BENCH_TRAIN_BATCHES"].split(","))
    for prec in variants:
        for bs in batch_sizes:
            awgn = "threefry"
            if "_rbgclt" in prec:
                awgn = "rbg_clt"   # Irwin-Hall byte-sum draw (round 5)
            elif "_rbg" in prec:
                awgn = "rbg"
            tcfg = TrainConfig(batch_size=bs,
                               matmul_dtype=prec.split("_")[0],
                               awgn_rng=awgn,
                               # '_noawgn': ablation row (method
                               # 'default' disables the AWGN layer) —
                               # the in-harness floor for decomposing
                               # the draw's cost
                               method=("default" if "_noawgn" in prec
                                       else "default_snr"),
                               opt_dtype=("bf16" if "_mubf16" in prec
                                          else "f32"),
                               steps_per_call=steps_per_call)
            params, bn_state = init_stacked(key, cfg, tcfg)
            # make_train_step applies -lr*u itself: the optimizer must
            # be the bare Adam SCALING (make_optimizer), not
            # optax.adam(lr) whose built-in -lr would compose to a
            # sign-flipped lr^2 update
            opt = make_optimizer(tcfg)
            opt_state = jax.jit(opt.init)(params)
            step = make_train_step(cfg, tcfg, data, 1.0, opt)[0]

            def mk_args(k):
                idx = jax.random.randint(
                    k, (steps_per_call, bs), 0, n_samples)
                keys = jax.random.split(k, steps_per_call)
                return idx, keys

            # warmup/compile + forced fetch
            idx, keys = mk_args(jax.random.PRNGKey(1))
            params, bn_state, opt_state, loss = step.multi(
                params, bn_state, opt_state, idx, keys, tcfg.lr)
            float(loss[0])
            # pre-generate all call args OUTSIDE the timed window: on
            # the tunneled runtime every dispatch costs ~ms of RPC,
            # comparable to the step itself at these sizes
            call_args = [mk_args(jax.random.PRNGKey(2 + i))
                         for i in range(calls)]
            jax.block_until_ready(call_args)
            t0 = time.perf_counter()
            for idx, keys in call_args:
                params, bn_state, opt_state, loss = step.multi(
                    params, bn_state, opt_state, idx, keys, tcfg.lr)
            float(loss[0])                      # true barrier
            dt = (time.perf_counter() - t0) / (calls * steps_per_call)

            _, in_dim = model_input_spec(cfg, tcfg)
            h1, h2 = tcfg.hidden
            fwd = 2 * 2.0 * bs * (in_dim * h1 + h1 * h2
                                  + h2 * cfg.num_carriers)
            results[f"{prec}_bs{bs}"] = {
                "step_ms": round(dt * 1e3, 3),
                "steps_per_s": round(1.0 / dt, 1),
                "samples_per_s": round(bs / dt, 1),
                "achieved_tflops": round(3.0 * fwd / dt / 1e12, 2),
            }

    best = max(results.values(), key=lambda r: r["achieved_tflops"])
    out = {
        "metric": "train_step_tflops",
        "value": best["achieved_tflops"],
        "unit": "TFLOP/s",
        "extra": {"device": str(jax.devices()[0]),
                  "steps_per_call": steps_per_call,
                  "paths": results},
    }
    if print_result:
        print(json.dumps(out))
    return out


def run_gen_bench(num_packets: int = 512, chunk: int = 64,
                  repo_root: str | None = None,
                  print_result: bool = True) -> dict:
    """Dataset-generation throughput: packets/s for the on-device
    sounding pipeline (the reference's M1 hot loop,
    generate_maMIMO_LTF.m:197-366, which it runs one packet per MATLAB
    iteration across `screen` processes).

    Three modes, each a complete generate_dataset call INCLUDING the
    device→host fetch of the corpus (the reference likewise pays the
    .mat write): sounding-only ('ls'), +LMMSE labels ('lmmse'), and the
    full isOnlyCSI=false data-transmission leg ('with_ber',
    generate_maMIMO_LTF.m:403-640). First call compiles (cached);
    the reported number times a second full call.
    """
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(root, ".jax_cache"))
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mamimo_tpu.config import SimConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset

    cfg = SimConfig(num_tx=int(os.environ.get("BENCH_NT", "32")),
                    num_rx=int(os.environ.get("BENCH_NR", "4")))
    modes = {
        "ls": dict(),
        # bf16 corpus drain: halves the device→host bytes of the
        # (tunnel-bound) fetch pipeline — the only axis this
        # environment can still move on end-to-end gen (VERDICT r4 #9)
        "ls_bf16fetch": dict(fetch_dtype="bf16"),
        "lmmse": dict(with_mmse=True),
        "with_ber": dict(with_ber=True),
    }
    results = {}
    for name, kw in modes.items():
        # warm: compile the chunked programs (persistent-cached)
        generate_dataset(cfg, seed=1, num_packets=2 * chunk,
                         snr_db=0.0, chunk=chunk, **kw)
        t0 = time.perf_counter()
        ds = generate_dataset(cfg, seed=2, num_packets=num_packets,
                              snr_db=0.0, chunk=chunk, **kw)
        dt = time.perf_counter() - t0
        assert ds.num_packets == num_packets
        results[name] = {
            "wall_s": round(dt, 3),
            "packets_per_s": round(num_packets / dt, 2),
            "estimates_per_s": round(
                num_packets * cfg.num_tx * cfg.num_rx / dt, 1),
        }

    # device-only sounding rate: back-to-back async chunk dispatches
    # with per-chunk fresh keys (no value-cache reuse), one f32 scalar
    # fetch closing the window — separates the TPU compute rate from
    # the (tunnel-bound) corpus-fetch pipeline rate above
    import jax.numpy as jnp

    from mamimo_tpu.channel.scattering import make_scenario
    from mamimo_tpu.ops.ltf import gen_preamble
    from mamimo_tpu.pipeline.sounding import sound_packet
    from mamimo_tpu.utils.numerics import put_complex

    key = jax.random.PRNGKey(0)
    scen = make_scenario(cfg, key)
    pre = put_complex(gen_preamble(cfg, cfg.num_tx))

    def one(k, p):
        res, _ = sound_packet(cfg, k, scen, 0.0, preamble=p)
        return jnp.sum(res.snr_cs)

    batched = jax.jit(jax.vmap(one, in_axes=(0, None)))
    n_chunks = max(1, num_packets // chunk)

    def run(seed0):
        acc = None
        for i in range(n_chunks):
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.PRNGKey(seed0 + i), jnp.arange(chunk))
            s = batched(keys, pre)
            acc = s if acc is None else acc + s
        return float(jnp.sum(acc))

    run(100)                                     # warm/compile
    t0 = time.perf_counter()
    run(200)
    dt = time.perf_counter() - t0
    results["device_sounding"] = {
        "wall_s": round(dt, 3),
        "packets_per_s": round(n_chunks * chunk / dt, 2),
        "estimates_per_s": round(
            n_chunks * chunk * cfg.num_tx * cfg.num_rx / dt, 1),
    }
    out = {
        "metric": "gen_packets_per_s",
        "value": results["ls"]["packets_per_s"],
        "unit": "packets/s",
        "extra": {"device": str(jax.devices()[0]),
                  "num_packets": num_packets, "chunk": chunk,
                  "config": f"BS{cfg.num_tx}", "modes": results},
    }
    if print_result:
        print(json.dumps(out))
    return out


def run_bench(batch_packets: int = 64, iters: int = 20,
              profile_dir: str = "", repo_root: str | None = None,
              print_result: bool = True) -> dict:
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    # persistent compilation cache: remote TPU compiles take minutes
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(root, ".jax_cache"))

    import jax
    import jax.numpy as jnp

    # honor JAX_PLATFORMS even though the session's TPU sitecustomize
    # force-sets jax_platforms post-import
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.ops.pallas import ls_estimate_pallas
    from mamimo_tpu.pipeline.sounding import estimate_from_rx

    # BS32 by default; BENCH_NT/BENCH_NR select the scaled-array config
    # (e.g. 64/8 = BASELINE.json config 3, 512 antenna pairs)
    cfg = SimConfig(num_tx=int(os.environ.get("BENCH_NT", "32")),
                    num_rx=int(os.environ.get("BENCH_NR", "4")))
    tcfg = TrainConfig()
    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    params, bn_state = init_stacked(key, cfg, tcfg)

    # synthetic received preambles (content doesn't affect timing), in
    # the CANONICAL raw layout: FLAT rx-major float32 planes (2, S, L),
    # S = B*num_rx — what the dataset pipeline stores and every loader
    # emits. The sample axis stays sublane-aligned (multiple of 8); a
    # (2, B, 4, L) form pads its size-4 sublane dim to 8 and doubles HBM
    # traffic (probe_r2b). Paths that want other layouts (complex,
    # time-major) pay the conversion INSIDE their timed step.
    @jax.jit
    def _mk_planes(k):
        return jax.random.normal(
            k, (2, batch_packets * cfg.num_rx, cfg.len_ltf))

    planes = _mk_planes(key)
    n_est = batch_packets * cfg.num_tx * cfg.num_rx

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    from mamimo_tpu.ops.estimate import (
        ls_estimate_matmul,
        ls_estimate_planes,
        ls_matmul_constants,
        ls_planes_constants,
    )

    lsc = ls_matmul_constants(cfg)
    lsp = ls_planes_constants(cfg)
    timings = {}
    # per-dispatch floor: perturb+reduce only (the tunnel RPC + launch
    # overhead every other path also pays once per dispatch)
    timings["noop"] = _time_fn(_chained_step(lambda p: p), planes, iters)
    # canonical-layout XLA paths
    timings["xla_planes"] = _time_fn(
        make_estimation_fn_planes(cfg, tcfg, params, bn_state),
        planes, iters)
    timings["xla_planes_bf16"] = _time_fn(
        make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                  use_bf16=True),
        planes, iters)
    timings["xla_planes_bf16_bf16ls"] = _time_fn(
        make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                  use_bf16=True, ls_bf16=True),
        planes, iters)
    # bf16 STORAGE format: the input itself is bf16 planes (half the
    # input HBM traffic; no in-graph downcasts to elide)
    planes_bf16 = jax.jit(lambda p: p.astype(jnp.bfloat16))(planes)
    timings["xla_planes_bf16in"] = _time_fn(
        make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                  input_bf16=True),
        planes_bf16, iters)

    # legacy time-major paths (the reference's layout): the planes ->
    # complex time-major conversion runs inside the timed step
    def _tm_core(p, bn, c, pl_in):
        from mamimo_tpu.models.mlp import predict_all_pairs

        rx = _planes_to_time_major(pl_in, cfg.num_rx)
        h_ls = ls_estimate_matmul(cfg, rx, c)
        h_dnn = predict_all_pairs(cfg, tcfg, p, bn, rx, dtype=jnp.bfloat16)
        return h_ls, h_dnn

    timings["xla_timemajor_bf16"] = _time_fn(
        _chained_step(_tm_core, (params, bn_state, lsc)), planes, iters)

    # LS-only paths
    timings["ls_planes"] = _time_fn(
        _chained_step(lambda c, pl_in: ls_estimate_planes(cfg, pl_in, c), (lsp,)),
        planes, iters)
    timings["ls_fft"] = _time_fn(
        _chained_step(lambda pl_in: estimate_from_rx(
            cfg, _planes_to_time_major(pl_in, cfg.num_rx))[0]), planes, iters)
    timings["ls_matmul"] = _time_fn(
        _chained_step(lambda c, pl_in: ls_estimate_matmul(
            cfg, _planes_to_time_major(pl_in, cfg.num_rx), c), (lsc,)),
        planes, iters)
    if on_tpu:
        # each pallas path in its own guard: one failed Mosaic compile
        # (e.g. a vmem OOM at a large batch) must not hide the others
        def _try(name, mk):
            try:
                timings[name] = _time_fn(mk(), planes, iters)
            except Exception as e:               # pragma: no cover
                # stderr: stdout carries exactly one JSON line
                print(f"[bench] {name} unavailable: {e}", file=sys.stderr)

        _try("pallas_factored",
             lambda: make_estimation_fn_pallas_factored(cfg, tcfg, params,
                                                        bn_state))
        _try("pallas_full",
             lambda: make_estimation_fn(cfg, tcfg, params, bn_state,
                                        use_pallas=True, chained=True,
                                        from_planes=True))
        _try("ls_pallas",
             lambda: _chained_step(lambda pl_in: ls_estimate_pallas(
                 cfg, _planes_to_time_major(pl_in, cfg.num_rx))))
        # hybrid: fused Pallas LS kernel + XLA bf16 DNN on bf16 planes
        try:
            timings["pallas_ls_bf16in"] = _time_fn(
                make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                          input_bf16=True, ls_pallas=True),
                planes_bf16, iters)
        except Exception as e:                   # pragma: no cover
            print(f"[bench] pallas_ls_bf16in unavailable: {e}",
                  file=sys.stderr)
        # serving form: outputs stay real planes (complex64 cannot cross
        # the host boundary here, so serving fetches planes regardless —
        # the on-device slice+complex interleave is skipped)
        try:
            timings["pallas_ls_serving_bf16in"] = _time_fn(
                make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                          input_bf16=True, ls_pallas=True,
                                          serving_planes=True),
                planes_bf16, iters)
        except Exception as e:                   # pragma: no cover
            print(f"[bench] pallas_ls_serving_bf16in unavailable: {e}",
                  file=sys.stderr)

    # int8 DNN (dynamic per-row activation quant, s8×s8→s32 MXU at 2×
    # the bf16 rate) — guarded: falls back gracefully if the backend
    # lacks int8 dot support
    for name, use_pallas_ls in (("int8_dnn_bf16in", False),
                                ("pallas_ls_int8_bf16in", True)):
        if use_pallas_ls and not on_tpu:
            continue
        try:
            timings[name] = _time_fn(
                make_estimation_fn_planes(cfg, tcfg, params, bn_state,
                                          input_bf16=True, dnn_int8=True,
                                          ls_pallas=use_pallas_ls),
                planes_bf16, iters)
        except Exception as e:                   # pragma: no cover
            print(f"[bench] {name} unavailable: {e}", file=sys.stderr)

    FULL_PATHS = ("pallas_factored", "pallas_full", "pallas_ls_bf16in",
                  "pallas_ls_serving_bf16in",
                  "int8_dnn_bf16in", "pallas_ls_int8_bf16in",
                  "xla_planes", "xla_planes_bf16", "xla_planes_bf16_bf16ls",
                  "xla_planes_bf16in", "xla_timemajor_bf16")
    full_keys = [k for k in FULL_PATHS if k in timings]
    best_dispatch = min(full_keys, key=lambda k: timings[k])

    # steady-state: re-time the two best full paths with K chained
    # batches per dispatch (lax.scan inside one program) — amortizes the
    # per-dispatch RPC floor the way a pipelined server does. Headline.
    # ×16 amortizes the ~2.8 ms dispatch floor below 2% of the window
    # (probe_r3c: serving_r3 5.44 ms/iter at ×8 → 5.18 at ×16)
    unroll = int(os.environ.get("BENCH_UNROLL", "16"))
    steady = {}
    if on_tpu:
        # the round-3 production path (LS v2 kernel + invariant-operand
        # harness) is a steady-state design: measure it there directly
        try:
            steady["pallas_ls_v2_serving_r3"] = _time_fn(
                make_estimation_fn_serving_r3(
                    cfg, tcfg, params, bn_state,
                    unroll=unroll)(planes_bf16),
                1.0, max(iters // 4, 3), per_call=unroll)
        except Exception as e:                   # pragma: no cover
            print(f"[bench] pallas_ls_v2_serving_r3 unavailable: {e}",
                  file=sys.stderr)
    # re-time the two best LEGACY full paths (on top of the pre-seeded
    # serving_r3 entry, which doesn't count against the cap)
    legacy_cap = 2 + ("pallas_ls_v2_serving_r3" in steady)
    for k in sorted(full_keys, key=lambda k: timings[k]):
        if len(steady) >= legacy_cap:
            break
        arg = planes
        if k == "pallas_factored":
            fn = make_estimation_fn_pallas_factored(
                cfg, tcfg, params, bn_state, unroll=unroll)
        elif k == "xla_planes_bf16in":
            fn = make_estimation_fn_planes(
                cfg, tcfg, params, bn_state, input_bf16=True,
                unroll=unroll)
            arg = planes_bf16
        elif k == "pallas_ls_bf16in":
            fn = make_estimation_fn_planes(
                cfg, tcfg, params, bn_state, input_bf16=True,
                ls_pallas=True, unroll=unroll)
            arg = planes_bf16
        elif k == "pallas_ls_serving_bf16in":
            fn = make_estimation_fn_planes(
                cfg, tcfg, params, bn_state, input_bf16=True,
                ls_pallas=True, serving_planes=True, unroll=unroll)
            arg = planes_bf16
        elif k in ("int8_dnn_bf16in", "pallas_ls_int8_bf16in"):
            fn = make_estimation_fn_planes(
                cfg, tcfg, params, bn_state, input_bf16=True,
                dnn_int8=True, ls_pallas=k.startswith("pallas"),
                unroll=unroll)
            arg = planes_bf16
        elif k.startswith("xla_planes"):
            fn = make_estimation_fn_planes(
                cfg, tcfg, params, bn_state,
                use_bf16="bf16" in k, ls_bf16=k.endswith("bf16ls"),
                unroll=unroll)
        else:
            continue
        steady[k] = _time_fn(fn, arg, max(iters // 4, 3),
                             per_call=unroll)

    if profile_dir:
        jax.profiler.stop_trace()

    best_full = (min(steady, key=lambda k: steady[k]) if steady
                 else best_dispatch)
    best_time = steady[best_full] if steady else timings[best_full]
    est_per_s = n_est / best_time

    # achieved-FLOPs sanity (factored DNN path + LS), reported so an
    # implausible number is visible immediately
    s_cnt = batch_packets * cfg.num_rx
    h1, h2 = tcfg.hidden
    dnn_flops = 2 * 2.0 * (
        s_cnt * cfg.len_ltf * h1
        + n_est * h1 * h2
        + n_est * h2 * cfg.num_carriers
    )
    achieved_tflops = dnn_flops / best_time / 1e12
    # the fused step also computes the LS estimate: complex matmuls cost
    # 4 real mults + 2 adds ≈ 8 flops/MAC (demod DFT + P-despread). The
    # planes / rx-major forms fold the CP drop into the DFT as zero
    # columns, so their executed DFT MACs span sym_len, not fft_length.
    # NOTE: this counts USEFUL carriers (234); the Pallas kernel pads to
    # 256 lanes, so its executed MACs are ~9% higher than counted here —
    # the reported TFLOP/s is conservative for pallas_ls paths.
    ls_dft_cols = (cfg.fft_length if best_full.startswith("xla_timemajor")
                   else cfg.sym_len)
    ls_flops = 8.0 * batch_packets * cfg.num_rx * cfg.num_tx * (
        ls_dft_cols * cfg.num_carriers             # selected-bin DFT
        + cfg.num_carriers * cfg.num_tx            # despread
    )
    achieved_total = (dnn_flops + ls_flops) / best_time / 1e12

    bl_name = (".bench_baseline.json"
               if (cfg.num_tx, cfg.num_rx) == (32, 4)
               else f".bench_baseline_{cfg.num_tx}x{cfg.num_rx}.json")
    baseline = _get_baseline(cfg, os.path.join(root, bl_name))

    result = {
        "metric": "channel_estimates_per_s_per_chip",
        "value": round(est_per_s, 1),
        "unit": "estimates/s",
        "vs_baseline": round(est_per_s / baseline, 2),
        "extra": {
            "device": str(dev),
            "batch_packets": batch_packets,
            "best_path": best_full,
            "precision": ("int8" if "int8" in best_full
                          else "bf16" if "bf16" in best_full
                          or best_full.startswith("pallas") else "f32"),
            "steady_state_unroll": unroll if steady else 1,
            "steady_state_estimates_per_s": {
                k: round(n_est / v, 1) for k, v in steady.items()
            },
            "per_dispatch_estimates_per_s": {
                k: round(n_est / v, 1) for k, v in timings.items()
                if k != "noop"
            },
            "dispatch_floor_ms": round(timings["noop"] * 1e3, 3),
            "baseline_cpu_estimates_per_s": round(baseline, 1),
            "full_batch_ms": round(best_time * 1e3, 3),
            "achieved_tflops_dnn_path": round(achieved_tflops, 2),
            "achieved_tflops_incl_ls": round(achieved_total, 2),
        },
    }
    if print_result:
        print(json.dumps(result))
    return result
