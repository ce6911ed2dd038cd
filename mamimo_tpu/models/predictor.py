"""Deployment inference wrapper — the ``CSIPredictor`` capability of
``inference.py:6-68``: load a trained checkpoint, run complex-valued
prediction through the two real-plane networks, with per-experiment
pre/post-processing hooks (including the RICE_RENEW null-subcarrier
reinsertion + ifftshift of ``inference.py:48-68``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig
from mamimo_tpu.models.mlp import predict_complex
from mamimo_tpu.utils.numerics import get_complex, put_complex
from mamimo_tpu.train.ckpt import load_checkpoint


class CSIPredictor:
    """Load a trained model directory and serve complex CSI predictions."""

    def __init__(self, model_path: str, experiment: str = "matlab_maMimo",
                 verbose: bool = False):
        self.path = model_path
        self.experiment = experiment
        self.verbose = verbose
        ck = load_checkpoint(os.path.join(model_path, "best"))
        self.cfg: SimConfig = ck["cfg"]
        self.tcfg: TrainConfig = ck["tcfg"]
        self.params = ck["params"]
        self.bn_state = ck["bn_state"]
        self._qparams = None
        if verbose:
            n = sum(int(np.prod(l.shape))
                    for l in jax.tree.leaves(self.params))
            print(f"[CSIPredictor] loaded {model_path}: {n} params")

    def all_pairs(self, rx_planes: np.ndarray,
                  int8: bool = False) -> np.ndarray:
        """All-pairs CSI from rx-major planes (2, B, num_rx, len_ltf)
        float32 — the deployment estimation call (one factored layer-1
        matmul shared by every pilot head).

        int8=True serves the quantized path (models/quant.py): int8
        weights folded once on first use, ~2× MXU rate on TPU, <0.05 dB
        NMSE impact (tests/test_quant.py).

        Returns:
          (B, num_rx, num_tx, num_carriers) complex64.
        """
        from mamimo_tpu.models.mlp import predict_all_pairs_planes

        x = jnp.asarray(rx_planes, jnp.float32)
        if int8:
            from mamimo_tpu.models.quant import (
                predict_all_pairs_planes_int8,
                quantize_params_int8,
            )

            if self._qparams is None:
                self._qparams = jax.jit(
                    lambda p, b: quantize_params_int8(
                        self.tcfg, p, b, sig_len=self.cfg.len_ltf)
                )(self.params, self.bn_state)
            y = predict_all_pairs_planes_int8(
                self.cfg, self.tcfg, self._qparams, x)
        else:
            y = predict_all_pairs_planes(
                self.cfg, self.tcfg, self.params, self.bn_state, x)
        return get_complex(y)

    def inference(self, input_batch: np.ndarray, pilot: np.ndarray):
        """input_batch: (B, len_ltf) complex; pilot: (B, num_tx).

        Returns post-processed (B, out) complex prediction.
        """
        x = self.preprocess_data(input_batch)
        y = predict_complex(
            self.cfg, self.tcfg, self.params, self.bn_state,
            put_complex(x), jnp.asarray(pilot, jnp.float32),
        )
        return self.postprocess_data(get_complex(y))

    # ------------------------------------------------------------------
    def preprocess_data(self, input_batch: np.ndarray) -> np.ndarray:
        if self.experiment == "RICE_RENEW":
            if input_batch.dtype != np.complex128:
                raise TypeError(
                    "[CSIPredictor] input batch must be complex128 for "
                    "RICE_RENEW (inference.py:41-43)"
                )
        return input_batch

    def postprocess_data(self, out: np.ndarray) -> np.ndarray:
        if self.experiment == "RICE_RENEW":
            # reinsert null subcarriers and undo the fftshift
            # (inference.py:52-66; assumes FFT 64 / 52 active tones)
            if out.shape[1] != 52:
                raise ValueError(
                    "[CSIPredictor] RICE_RENEW output must have 52 tones"
                )
            b = out.shape[0]
            tmp = np.concatenate(
                [np.zeros((b, 6), out.dtype), out[:, :26],
                 np.zeros((b, 1), out.dtype), out[:, 26:],
                 np.zeros((b, 5), out.dtype)], axis=1,
            )
            return np.fft.ifftshift(tmp, axes=1)
        return out
