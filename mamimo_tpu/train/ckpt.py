"""Checkpoint save/load — flattened-pytree npz + config JSONs.

Exceeds the reference's best-weights-only HDF5 snapshots
(``massiveMIMO_CSI_prediction_DNN.py:319``): full train-state
checkpoints (params, BN stats, optimizer state, epoch counters) enable
mid-training resume, which the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

from mamimo_tpu.config import SimConfig, TrainConfig

def save_pytree(path: str, tree) -> None:
    """Save an arbitrary pytree of arrays plus its structure."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of `like`."""
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(prefix: str, cfg: SimConfig, tcfg: TrainConfig,
                    params, bn_state, extra: Dict[str, Any] | None = None,
                    opt_state=None) -> None:
    """Write <prefix>.npz (+ optional <prefix>_opt.npz) and <prefix>.json."""
    os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
    save_pytree(prefix + ".npz", {"params": params, "bn_state": bn_state})
    if opt_state is not None:
        save_pytree(prefix + "_opt.npz", opt_state)
    meta = {
        "cfg": json.loads(cfg.to_json()),
        "tcfg": json.loads(tcfg.to_json()),
        "extra": extra or {},
    }
    with open(prefix + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(prefix: str, like_opt_state=None) -> Dict[str, Any]:
    """Load a checkpoint written by save_checkpoint.

    Reconstructs the params/bn pytree structure by re-initializing from
    the stored configs (deterministic structure, stored values).
    """
    with open(prefix + ".json") as f:
        meta = json.load(f)
    cfg = SimConfig(**meta["cfg"])
    tcfg = TrainConfig.from_json(json.dumps(meta["tcfg"]))
    from mamimo_tpu.models.mlp import init_stacked

    params0, bn0 = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    state = load_pytree(prefix + ".npz", {"params": params0, "bn_state": bn0})
    out = {
        "cfg": cfg,
        "tcfg": tcfg,
        "params": state["params"],
        "bn_state": state["bn_state"],
        "extra": meta.get("extra", {}),
    }
    if like_opt_state is not None and os.path.exists(prefix + "_opt.npz"):
        out["opt_state"] = load_pytree(prefix + "_opt.npz", like_opt_state)
    return out
