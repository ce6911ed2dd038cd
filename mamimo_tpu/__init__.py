"""mamimo_tpu — TPU-native massive-MIMO DL channel-estimation framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
mauro-belgiovine/DL-channel-estimation-MaMIMO (Belgiovine et al., "Deep
Learning at the Edge for Channel Estimation in Beyond-5G Massive MIMO",
IEEE WCM 2021).  The reference is a MATLAB + TF2 batch pipeline glued by
bash; this package re-designs every stage as on-device array code:

- ``config``    : one typed config (replaces setenv.sh + argparse + `prm`)
- ``ops``       : OFDM mod/demod, LTF/P preamble, LS/LMMSE estimators,
                  OMP hybrid beamforming, conv-coding/Viterbi, metrics,
                  Pallas fused kernels
- ``channel``   : scattering MIMO channel + receiver noise chain
                  (replaces phased.ScatteringMIMOChannel / ReceiverPreamp)
- ``pipeline``  : channel sounding + dataset generation + closed-loop
                  data transmission (replaces generate_maMIMO_LTF.m /
                  BER_test_maMIMO_LTF.m)
- ``models``    : CSI denoiser MLP (real+imag stacked), inference wrapper
- ``train``     : jit training loop with on-the-fly AWGN, early stopping,
                  LR-on-plateau, orbax checkpointing
- ``eval``      : NMSE/EVM/BER SNR sweeps + plots
- ``parallel``  : device meshes, sharded (seq-parallel) estimation,
                  DP+TP training step
- ``data``      : dataset containers + reference-format interop (.mat/.b)
- ``utils``     : rng, logging, profiling helpers
"""

__version__ = "0.1.0"

from mamimo_tpu.config import SimConfig, TrainConfig  # noqa: F401
