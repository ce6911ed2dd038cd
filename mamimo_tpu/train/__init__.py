"""Training: jit train loop with on-the-fly AWGN, early stopping,
LR-on-plateau and checkpoint/resume."""

from mamimo_tpu.train.loop import TrainResult, fit, evaluate_dataset  # noqa: F401
from mamimo_tpu.train.ckpt import save_checkpoint, load_checkpoint  # noqa: F401
