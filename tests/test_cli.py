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
