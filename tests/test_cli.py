"""CLI end-to-end smoke: gen → train → test(+export) → convert."""

import json
import os

import numpy as np

from mamimo_tpu.cli import main


def test_cli_pipeline_roundtrip(tmp_path):
    d = str(tmp_path)
    common = ["--num-tx", "4", "--num-rx", "2", "--scatterers", "8"]
    main(["gen", *common, "--packets", "8", "--snr", "120",
          "--chunk", "4", "-o", f"{d}/train.npz"])
    assert os.path.exists(f"{d}/train.npz")

    main(["train", "-x", f"{d}/train.npz", "-d", f"{d}/model",
          "--nn", "32", "32", "--bs", "16", "--epochs", "2"])
    assert os.path.exists(f"{d}/model/best.json")

    main(["gen", *common, "--packets", "4", "--snr", "0", "--mmse",
          "--chunk", "4", "-o", f"{d}/test.npz"])
    main(["test", "-x", f"{d}/test.npz", "--modeldir", f"{d}/model",
          "-d", f"{d}/out", "--export-mat"])
    assert os.path.exists(f"{d}/out/predictions.npz")
    assert os.path.exists(f"{d}/out/test_csi_predictions_real_1.mat")
    rep = json.load(open(f"{d}/out/test_report.json"))
    assert "ls" in rep and "dnn" in rep

    main(["convert", "-x", f"{d}/train.npz", "--datasource", "mamimo_npz",
          "--to", "pickle", "-o", f"{d}/ref.b"])
    main(["convert", "-x", f"{d}/ref.b", "--datasource", "matlab_maMimo",
          "--to", "npz", "-o", f"{d}/back.npz"])
    z1 = np.load(f"{d}/train.npz")
    z2 = np.load(f"{d}/back.npz")
    np.testing.assert_allclose(z1["rx"], z2["rx"], atol=1e-6)


def test_cli_sweep(tmp_path):
    d = str(tmp_path)
    main(["sweep", "--num-tx", "4", "--num-rx", "2", "--scatterers", "8",
          "--snr", "0", "10", "--packets", "3", "--chunk", "3",
          "-o", f"{d}/sweep"])
    assert os.path.exists(f"{d}/sweep/sweep.json")
    assert os.path.exists(f"{d}/sweep/MSE.png")


def test_cli_mu_sweep_with_dnn(tmp_path):
    """--num-users>1 --modeldir: per-user checkpoints under u{N}/ feed
    the 'dnn' CSI source of the MU closed-loop sweep (the CLI face of
    generate_maMIMO_LTF.m:427-440 + BER_test_maMIMO_LTF.m:347)."""
    import json

    import jax

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.pipeline.dataset import generate_dataset
    from mamimo_tpu.pipeline.multiuser import index_user, make_scenarios
    from mamimo_tpu.train import fit

    d = str(tmp_path)
    cfg = SimConfig(num_users=2, num_tx=8, num_rx=2, n_scatterers=12)
    tcfg = TrainConfig(hidden=(16, 16), epochs=2, batch_size=32,
                       dropout=0.0, seed=3)
    # train on the SAME placements the sweep will draw (seed contract)
    scens = make_scenarios(cfg, jax.random.PRNGKey(3))
    for u in range(2):
        ds = generate_dataset(cfg, seed=3, num_packets=6, snr_db=120.0,
                              chunk=3, scenario=index_user(scens, u),
                              user=u)
        fit(cfg, tcfg, ds, workdir=f"{d}/mu/u{u}", verbose=False)
        assert os.path.exists(f"{d}/mu/u{u}/best.npz")

    main(["sweep", "--num-tx", "8", "--num-rx", "2", "--scatterers", "12",
          "--num-users", "2", "--seed", "3", "--snr", "0",
          "--packets", "2", "--chunk", "2", "--modeldir", f"{d}/mu",
          "-o", f"{d}/musweep"])
    out = json.load(open(f"{d}/musweep/mu_sweep.json"))
    assert set(out["sources"]) == {"ls", "lmmse", "dnn", "perfect"}
    assert len(out["sources"]["dnn"]["ber"][0]) == 2   # per-user values


def test_cli_mu_modeldir_validation(tmp_path):
    """The per-user checkpoint consistency gates (ADVICE r3): missing
    u1 sidecar and dimension-mismatched checkpoints fail with clear
    SystemExit messages instead of opaque stack errors."""
    import pytest

    import jax

    from mamimo_tpu.config import SimConfig, TrainConfig
    from mamimo_tpu.models.mlp import init_stacked
    from mamimo_tpu.train.ckpt import save_checkpoint

    d = str(tmp_path)
    cfg_ok = SimConfig(num_users=2, num_tx=8, num_rx=2, n_scatterers=12)
    cfg_bad = SimConfig(num_users=2, num_tx=4, num_rx=2, n_scatterers=12)
    tcfg = TrainConfig(hidden=(16, 16))
    args = ["sweep", "--num-tx", "8", "--num-rx", "2", "--scatterers",
            "12", "--num-users", "2", "--seed", "3", "--snr", "0",
            "--packets", "2", "--chunk", "2", "-o", f"{d}/out"]

    # u0 only -> missing-u1 error names the expected path
    p, b = init_stacked(jax.random.PRNGKey(0), cfg_ok, tcfg)
    save_checkpoint(f"{d}/m1/u0/best", cfg_ok, tcfg, p, b)
    with pytest.raises(SystemExit, match="u1/best.json"):
        main(args + ["--modeldir", f"{d}/m1"])

    # u1 trained at the wrong num_tx -> dimension gate
    save_checkpoint(f"{d}/m2/u0/best", cfg_ok, tcfg, p, b)
    pb, bb = init_stacked(jax.random.PRNGKey(0), cfg_bad, tcfg)
    save_checkpoint(f"{d}/m2/u1/best", cfg_bad, tcfg, pb, bb)
    with pytest.raises(SystemExit, match="num_tx"):
        main(args + ["--modeldir", f"{d}/m2"])

    # u1 with a different TrainConfig -> tcfg gate
    save_checkpoint(f"{d}/m3/u0/best", cfg_ok, tcfg, p, b)
    save_checkpoint(f"{d}/m3/u1/best", cfg_ok,
                    TrainConfig(hidden=(16, 16), dropout=0.5), p, b)
    with pytest.raises(SystemExit, match="TrainConfig"):
        main(args + ["--modeldir", f"{d}/m3"])
