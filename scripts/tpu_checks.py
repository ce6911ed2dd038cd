#!/usr/bin/env python
"""On-chip float64-oracle test tier (VERDICT r4 #1) — the round gate.

Runs ON THE REAL CHIP AT DEFAULT MATMUL PRECISION (no global override)
and compares every production numeric path against float64 NumPy host
oracles, writing one JSON row per path to results/tpu_checks_r5.json.
The CPU pytest suite forces `highest` precision globally and is
STRUCTURALLY BLIND to default-precision lowering bugs — round 4 shipped
LMMSE estimators at −31.5/−50.5 dB from exact for two rounds because
`jnp.linalg.solve`'s TPU lowering obeys the default single-pass-bf16
matmul precision (PERF.md round 4 "Morals"). Every tolerance below is
pinned so THAT bug class fails the row.

Checks (reference contracts cited per row):
  (a) LS — all 5 algebraically-identical forms + Pallas v1/v2 kernels
      vs a float64 re-derivation of helperMIMOChannelEstimate.m:24-41;
  (b) LMMSE — all 4 forms (dense / direct / CG / eig) across SNR
      −25…+120 dB vs a float64 solve of LMMSE_ce.m:23-39 semantics;
  (c) OMP hybrid weights (SVD + greedy, omphybweights.m:169-178 /
      ompdecomp.m:105-116) vs the float64 greedy oracle;
  (d) one golden generation packet (generate_maMIMO_LTF.m determinism
      contract, :33-43) vs the committed CPU-highest golden fixture;
  (e) one training run segment: finite grads, decreasing loss, and the
      eval-mode forward pass vs a float64 NumPy MLP.

Exit code: 0 iff every row passes. Intended to run FIRST in the round's
chain script; artifact consumed by the judge.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

# ---------------------------------------------------------------------
# tolerances (NMSE vs float64 oracle, dB). Two tiers:
#   * "exact" paths (precision-pinned internally): must be ≤ −95 dB —
#     the round-4 regression measured −31.5 (direct) / −50.5 (dense),
#     so this bound refuses that class outright;
#   * default-precision f32 matmul paths: the MXU runs them as
#     single-pass bf16 → ~−45…−55 dB is healthy; bound −38 dB catches
#     a drop to half precision or a broken despread;
#   * explicit-bf16 storage paths: documented −50 dB input quantization
#     (PERF.md) → bound −33 dB.
# ---------------------------------------------------------------------
TOL_DB = {
    # (a) LS forms
    "ls_fft": -38.0,
    "ls_matmul": -38.0,
    "ls_planes": -38.0,
    "ls_rxmajor": -38.0,
    "ls_pallas_perpair": -38.0,
    "ls_pallas_v1_f32": -38.0,
    "ls_pallas_v1_bf16": -33.0,
    "ls_pallas_v2_f32": -38.0,
    "ls_pallas_v2_bf16": -33.0,
    # (b) LMMSE forms — exact tier (precision-pinned; per-SNR bounds in
    # LMMSE_TOL_DB below — round 4's regression measured −31.5 dB in
    # the protocol range, 50+ dB outside the −85 bound)
    # (c) OMP
    "omp_decomp_coeff": -55.0,
    "omp_hyb_product": -30.0,
    # (d) golden generation packet (vs CPU-highest fixture; the
    # cross-backend f32 reassociation floor is ~−45 dB on this seed)
    "gen_rx": -30.0,
    "gen_h_ls": -30.0,
    "gen_h_perfect": -30.0,
    "gen_h_mmse": -30.0,
    # (e) forward pass vs float64 NumPy MLP
    "mlp_forward": -40.0,
}

# per-SNR LMMSE bounds (NMSE dB vs the float64 oracle). The protocol
# range (−25…+20, what every sweep/artifact uses) demands near-exact;
# +40/+120 are conditioning-limited in f32 no matter the matmul
# precision (Rpp → Rf, which is nearly singular): measured CPU-f32
# floors are cg −60.7 @ +40 and direct −80.0 @ +120 — bounds leave
# ~5…10 dB of margin while still refusing any precision regression.
LMMSE_TOL_DB = {
    -25.0: -85.0, -10.0: -85.0, 0.0: -85.0, 10.0: -85.0, 20.0: -85.0,
    40.0: -55.0, 120.0: -70.0,
}


def nmse_db(got, ref):
    import numpy as np

    got = np.asarray(got).astype(np.complex128)
    ref = np.asarray(ref).astype(np.complex128)
    num = np.mean(np.abs(got - ref) ** 2)
    den = np.mean(np.abs(ref) ** 2)
    return float(10.0 * np.log10(num / den + 1e-300))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="results/tpu_checks_r5.json")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # the whole point: DEFAULT precision, exactly as production runs
    assert jax.config.jax_default_matmul_precision is None, (
        "tpu_checks must run at the default matmul precision")

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.utils.numerics import get_complex

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"[tpu_checks] device: {dev} (tpu={on_tpu})", flush=True)

    rows = {}
    t_start = time.time()

    def record(name, val_db, extra=None):
        tol = TOL_DB[name]
        ok = bool(val_db <= tol)
        rows[name] = {"nmse_db": round(val_db, 2), "tol_db": tol,
                      "pass": ok, **(extra or {})}
        print(f"[tpu_checks] {name}: {val_db:.1f} dB "
              f"(tol {tol}) {'PASS' if ok else 'FAIL'}", flush=True)

    # =================================================================
    # (a) LS — float64 oracle of helperMIMOChannelEstimate.m:24-41
    # =================================================================
    cfg = SimConfig()
    B, R, L = args.batch, cfg.num_rx, cfg.len_ltf
    S = B * R
    nsym, C, N = cfg.num_tx, cfg.num_carriers, cfg.fft_length
    rng = np.random.default_rng(7)
    planes_np = rng.standard_normal((2, S, L)).astype(np.float32)

    # float64 DFT-select matrix (independent re-derivation; mirrors the
    # semantics of ops/estimate.dft_selected_np but computed in f64)
    from mamimo_tpu.ops.ltf import _ltf_np

    bins = np.asarray(cfg.carrier_locations, np.float64) - N // 2
    t64 = np.arange(N, dtype=np.float64)
    a64 = np.exp(-2j * np.pi * bins[:, None] * t64[None, :] / N)
    ltf64 = _ltf_np(N)[np.asarray(cfg.carrier_locations)].astype(np.float64)
    a64 = a64 / (nsym * ltf64)[:, None]                      # (C, N)

    from tests.golden.reference_oracles import hadamard

    P64 = hadamard(nsym)                                     # (T, T)
    x64 = (planes_np[0] + 1j * planes_np[1]).astype(np.complex128)
    x64 = x64.reshape(S, nsym, cfg.sym_len)[:, :, cfg.cp_length:]
    z64 = np.einsum("cn,stn->stc", a64, x64)                 # (S, T, C)
    ref_ls = np.einsum("jn,snc->sjc", P64, z64)              # (S, T, C)

    planes = jnp.asarray(planes_np)

    def to_stc(h, layout):
        """Normalize a form's output to (S, num_tx, C) complex."""
        h = np.asarray(h)
        if layout == "cjr":      # (B, C, T, R)
            return np.transpose(h, (0, 3, 2, 1)).reshape(S, nsym, C)
        if layout == "brjc":     # (B, R, T, C)
            return h.reshape(S, nsym, C)
        if layout == "sjc":      # (S, T, C)
            return h
        raise ValueError(layout)

    # -- the five XLA forms --------------------------------------------
    from mamimo_tpu.ops.estimate import (
        ls_estimate,
        ls_estimate_matmul,
        ls_estimate_planes,
        ls_estimate_rxmajor,
    )
    from mamimo_tpu.ops.ofdm import ofdm_demodulate

    @jax.jit
    def run_ls_xla(pl):
        rx_c = jax.lax.complex(pl[0], pl[1])                 # (S, L)
        rx_bLr = jnp.transpose(
            rx_c.reshape(B, R, L), (0, 2, 1))                # (B, L, R)
        grid, _ = ofdm_demodulate(cfg, rx_bLr)
        h_fft = ls_estimate(cfg, grid)                       # (B, C, T, R)
        h_mm = ls_estimate_matmul(cfg, rx_bLr)               # (B, C, T, R)
        h_pl = ls_estimate_planes(cfg, pl)                   # (S, T, C)
        h_rx = ls_estimate_rxmajor(cfg, rx_c.reshape(B, R, L))
        return h_fft, h_mm, h_pl, h_rx

    h_fft, h_mm, h_pl, h_rx = run_ls_xla(planes)
    record("ls_fft", nmse_db(to_stc(get_complex(h_fft), "cjr"), ref_ls))
    record("ls_matmul", nmse_db(to_stc(get_complex(h_mm), "cjr"), ref_ls))
    record("ls_planes", nmse_db(to_stc(get_complex(h_pl), "sjc"), ref_ls))
    record("ls_rxmajor", nmse_db(to_stc(get_complex(h_rx), "brjc"), ref_ls))

    # -- the Pallas kernels --------------------------------------------
    from mamimo_tpu.ops.pallas.fused_ls import (
        ls_estimate_pallas,
        ls_planes_pallas,
        ls_planes_pallas_v2,
        ls_v2_to_complex,
    )

    @jax.jit
    def run_ls_pallas(pl):
        rx_c = jax.lax.complex(pl[0], pl[1])
        rx_bLr = jnp.transpose(rx_c.reshape(B, R, L), (0, 2, 1))
        h_pp = ls_estimate_pallas(cfg, rx_bLr)               # (B, C, T, R)
        h_v1 = ls_planes_pallas(cfg, pl)                     # (S, T, C)
        h_v1b = ls_planes_pallas(cfg, pl.astype(jnp.bfloat16))
        h2, _ = ls_planes_pallas_v2(cfg, pl)
        h_v2 = ls_v2_to_complex(cfg, h2, S)                  # (S, T, C)
        h2b, _ = ls_planes_pallas_v2(cfg, pl.astype(jnp.bfloat16))
        h_v2b = ls_v2_to_complex(cfg, h2b.astype(jnp.float32), S)
        return h_pp, h_v1, h_v1b, h_v2, h_v2b

    h_pp, h_v1, h_v1b, h_v2, h_v2b = run_ls_pallas(planes)
    record("ls_pallas_perpair",
           nmse_db(to_stc(get_complex(h_pp), "cjr"), ref_ls))
    record("ls_pallas_v1_f32",
           nmse_db(to_stc(get_complex(h_v1), "sjc"), ref_ls))
    record("ls_pallas_v1_bf16",
           nmse_db(to_stc(get_complex(h_v1b), "sjc"), ref_ls))
    record("ls_pallas_v2_f32",
           nmse_db(to_stc(get_complex(h_v2), "sjc"), ref_ls))
    record("ls_pallas_v2_bf16",
           nmse_db(to_stc(get_complex(h_v2b), "sjc"), ref_ls))

    # =================================================================
    # (b) LMMSE — float64 oracle across the SNR sweep (LMMSE_ce.m
    #     semantics: hhat = h − σ²·(Rf + σ²I)⁻¹·h with the delays-as-h
    #     τ_rms quirk; see probe_cg_accuracy_tpu.py round 4)
    # =================================================================
    from mamimo_tpu.ops.estimate import (
        lmmse_estimate,
        lmmse_estimate_cg,
        lmmse_estimate_direct,
        lmmse_estimate_eig,
    )
    from mamimo_tpu.utils.numerics import put_complex

    b_l = args.batch
    tau_np = rng.uniform(1e-6, 4e-6, (b_l, cfg.n_scatterers)).astype(
        np.float32)
    hls_np = (rng.standard_normal((b_l, C, nsym, R))
              + 1j * rng.standard_normal((b_l, C, nsym, R))).astype(
                  np.complex64)

    def lmmse_oracle(snr_db_val):
        out = np.zeros_like(hls_np, np.complex128)
        k = np.arange(cfg.n_scatterers)
        a = np.arange(C)
        for i in range(b_l):
            t = tau_np[i].astype(np.float64)
            w = t * t
            hh = w.sum()
            tmp = w * k
            r1 = tmp.sum() / hh
            r2 = (tmp * k).sum() / hh
            tau_rms = np.sqrt(max(r2 - r1 * r1, 0.0))
            jw = 1j * 2 * np.pi * tau_rms / C
            rf = 1.0 / (1.0 + jw * (a[:, None] - a[None, :]))
            sig2 = 1.0 / 10 ** (snr_db_val / 10.0)
            rpp = rf + np.eye(C) * sig2
            for j in range(R):
                x = np.linalg.solve(
                    rpp, hls_np[i, :, :, j].astype(np.complex128))
                out[i, :, :, j] = hls_np[i, :, :, j] - sig2 * x
        return out

    h_dev = put_complex(hls_np)
    tau_dev = jnp.asarray(tau_np)

    lm_fns = {"lmmse_dense": lmmse_estimate,
              "lmmse_direct": lmmse_estimate_direct,
              "lmmse_cg": lmmse_estimate_cg,
              "lmmse_eig": lmmse_estimate_eig}
    lm_jit = {name: jax.jit(lambda h, t, s, fn=fn: fn(cfg, h, t, s))
              for name, fn in lm_fns.items()}
    snr_grid = sorted(LMMSE_TOL_DB)
    per_snr = {name: {} for name in lm_fns}
    for snr_val in snr_grid:
        ref = lmmse_oracle(snr_val)
        snr_dev = jnp.full((b_l, R), snr_val, jnp.float32)
        for name, fn in lm_jit.items():
            got = get_complex(fn(h_dev, tau_dev, snr_dev))
            per_snr[name][snr_val] = nmse_db(got, ref)
    for name in lm_fns:
        vals = per_snr[name]
        margins = {s: vals[s] - LMMSE_TOL_DB[s] for s in snr_grid}
        worst_snr = max(margins, key=margins.get)
        ok = bool(all(m <= 0.0 for m in margins.values()))
        rows[name] = {
            "nmse_db_per_snr": {str(s): round(vals[s], 1)
                                for s in snr_grid},
            "tol_db_per_snr": {str(s): LMMSE_TOL_DB[s]
                               for s in snr_grid},
            "worst_margin_db": round(margins[worst_snr], 1),
            "worst_at_snr_db": worst_snr,
            "pass": ok,
        }
        print(f"[tpu_checks] {name}: worst margin "
              f"{margins[worst_snr]:+.1f} dB at SNR {worst_snr} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)

    # =================================================================
    # (c) OMP — float64 greedy oracle (ompdecomp.m:105-116) + the
    #     SVD-seeded hybrid weights (omphybweights.m:169-178)
    # =================================================================
    from tests.golden.reference_oracles import omp_decomp_oracle

    from mamimo_tpu.ops.omp import omp_decomp, omp_hyb_weights

    nt, ns, ntrf, na = cfg.num_tx, 1, 4, 64
    adict_np = (rng.standard_normal((nt, na))
                + 1j * rng.standard_normal((nt, na)))
    adict_np = (adict_np / np.abs(adict_np)).astype(np.complex64) \
        / np.sqrt(nt)
    wopt_np = (rng.standard_normal((nt, ns))
               + 1j * rng.standard_normal((nt, ns))).astype(np.complex64)

    coeff_o, atoms_o, idx_o, _ = omp_decomp_oracle(
        wopt_np, adict_np.astype(np.complex128), ntrf)
    r_dev = jax.jit(lambda w, a: omp_decomp(w, a, ntrf))(
        put_complex(wopt_np), put_complex(adict_np))
    idx_got = np.asarray(r_dev.atom_idx)
    idx_match = bool(np.array_equal(np.sort(idx_got), np.sort(idx_o)))
    record("omp_decomp_coeff",
           nmse_db(get_complex(r_dev.coeff), coeff_o),
           {"atom_idx_match": idx_match})
    rows["omp_decomp_coeff"]["pass"] &= idx_match

    # hybrid weights on a small carrier batch; compare the phase-aligned
    # Fbb·Frf product against the float64 SVD+OMP oracle
    n_carr = 8
    h_np = (rng.standard_normal((n_carr, nt, R))
            + 1j * rng.standard_normal((n_carr, nt, R))).astype(
                np.complex64)
    fbb_d, frf_d = jax.jit(
        lambda h, a: omp_hyb_weights(h, ns, ntrf, a))(
            put_complex(h_np), put_complex(adict_np))
    prod_got = np.einsum("lst,ltn->lsn", get_complex(fbb_d),
                         get_complex(frf_d))        # (L, ns, Nt)
    errs = []
    for li in range(n_carr):
        H = h_np[li].astype(np.complex128).T        # (Nr, Nt)
        _, _, vh = np.linalg.svd(H)
        fopt = vh.conj().T[:, :ns]
        co, at_o, _, _ = omp_decomp_oracle(
            fopt, adict_np.astype(np.complex128), ntrf)
        pr = at_o @ co                              # (Nt, ns)
        pr = pr * (np.sqrt(ns) / max(np.linalg.norm(pr), 1e-30))
        ref_row = pr[:, 0]
        got_row = prod_got[li, 0].astype(np.complex128)
        ph = np.vdot(ref_row, got_row)
        ph = ph / max(abs(ph), 1e-30)
        errs.append(np.mean(np.abs(got_row * np.conj(ph) - ref_row) ** 2)
                    / np.mean(np.abs(ref_row) ** 2))
    record("omp_hyb_product", float(10 * np.log10(np.mean(errs) + 1e-300)))

    # =================================================================
    # (d) golden generation packet — the generate_maMIMO_LTF.m:33-43
    #     determinism contract, exercised ON CHIP at default precision
    #     against the committed CPU-highest fixture
    # =================================================================
    from mamimo_tpu.pipeline.dataset import generate_dataset

    gcfg = SimConfig(num_tx=8, num_rx=2, n_scatterers=16)
    ds = generate_dataset(gcfg, seed=777, num_packets=2, snr_db=5.0,
                          with_mmse=True, chunk=2, fft_size=8192)
    g = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                             "tests", "golden", "bs8_seed777.npz"))
    for field, row in (("rx", "gen_rx"), ("h_ls", "gen_h_ls"),
                       ("h_perfect", "gen_h_perfect"),
                       ("h_mmse", "gen_h_mmse")):
        record(row, nmse_db(getattr(ds, field), g[field]))

    # =================================================================
    # (e) training: finite grads, decreasing loss, forward vs float64
    # =================================================================
    from mamimo_tpu.models.mlp import (
        init_stacked,
        model_input_spec,
        stacked_apply,
    )

    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    params, bn_state = init_stacked(key, cfg, tcfg)

    # float64 NumPy forward (eval mode) on a small random batch
    bs_f = 32
    _, in_dim = model_input_spec(cfg, tcfg)
    x2_np = rng.standard_normal((2, bs_f, in_dim)).astype(np.float32)

    def np_forward(plane):
        p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        b = jax.tree.map(lambda a: np.asarray(a, np.float64), bn_state)
        h = x2_np[plane].astype(np.float64)
        for i in range(len(p["dense"])):
            h = np.maximum(h @ p["dense"][i]["w"][plane]
                           + p["dense"][i]["b"][plane], 0.0)
            mu, var = b["mean"][i][plane], b["var"][i][plane]
            h = (h - mu) / np.sqrt(var + tcfg.bn_eps)
            h = h * p["bn"][i]["scale"][plane] + p["bn"][i]["bias"][plane]
        return h @ p["out"]["w"][plane] + p["out"]["b"][plane]

    ref_fwd = np.stack([np_forward(0), np_forward(1)])
    got_fwd, _ = jax.jit(
        lambda pp, bb, x: stacked_apply(tcfg, pp, bb, x, train=False)
    )(params, bn_state, jnp.asarray(x2_np))
    record("mlp_forward", nmse_db(np.asarray(got_fwd), ref_fwd))

    # short training segment on synthetic data: loss must decrease and
    # every grad/param must stay finite (catches NaN-producing noise /
    # BN / optimizer regressions on the chip)
    from mamimo_tpu.train.loop import make_batch_update, make_optimizer

    update, _ = make_batch_update(cfg, tcfg, 1.0, make_optimizer(tcfg))
    step = jax.jit(update, donate_argnums=(0, 1, 2))
    bs_t = 128
    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    x2 = jax.random.normal(kx, (2, bs_t, L), jnp.float32)
    pilot = jnp.tile(jnp.asarray(hadamard(nsym), jnp.float32)[None, 0],
                     (bs_t, 1))
    # learnable target: a fixed random projection of the input
    wtrue = jax.random.normal(ky, (L, C), jnp.float32) * 0.01
    y2 = jnp.einsum("pbl,lc->pbc", x2, wtrue)
    opt_state = jax.jit(make_optimizer(tcfg).init)(params)
    losses = []
    p_t, b_t, o_t = params, bn_state, opt_state
    for i in range(30):
        p_t, b_t, o_t, per = step(p_t, b_t, o_t, x2, pilot, y2,
                                  jax.random.fold_in(key, i), 1e-3)
        losses.append(np.asarray(per))
    losses = np.asarray(losses)             # (30, 2)
    finite = bool(np.all(np.isfinite(losses)))
    p_finite = bool(all(np.all(np.isfinite(np.asarray(lf)))
                        for lf in jax.tree.leaves(p_t)))
    first = float(losses[:3].sum(axis=1).mean())
    last = float(losses[-3:].sum(axis=1).mean())
    ok_train = finite and p_finite and last < 0.7 * first
    rows["train_step"] = {
        "loss_first": round(first, 6), "loss_last": round(last, 6),
        "finite": finite, "params_finite": p_finite, "pass": ok_train}
    print(f"[tpu_checks] train_step: {first:.4f} -> {last:.4f} "
          f"finite={finite} {'PASS' if ok_train else 'FAIL'}", flush=True)

    # =================================================================
    all_ok = all(r["pass"] for r in rows.values())
    out = {
        "device": str(dev),
        "on_tpu": on_tpu,
        "default_matmul_precision": "default(bf16-pass)",
        "wall_s": round(time.time() - t_start, 1),
        "all_pass": all_ok,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[tpu_checks] {'ALL PASS' if all_ok else 'FAILURES'} "
          f"({sum(r['pass'] for r in rows.values())}/{len(rows)}) "
          f"-> {args.out}", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
