"""Checkpoint save/load — flattened-pytree npz + config JSONs, with an
optional orbax backend for sharded/multi-host state.

Exceeds the reference's best-weights-only HDF5 snapshots
(``massiveMIMO_CSI_prediction_DNN.py:319``): full train-state
checkpoints (params, BN stats, optimizer state, epoch counters) enable
mid-training resume, which the reference lacks (SURVEY.md §5).

Backends:
  * ``npz`` (default) — single-host flattened pytree, zero deps, what
    the long TPU runs use.
  * ``orbax`` — `orbax.checkpoint.PyTreeCheckpointer`; arrays sharded
    over a mesh are written/restored distributed-aware, which is the
    right backend once training spans hosts (SURVEY.md §5
    "orbax-style checkpointing with resume"). Auto-detected on load.
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
                    opt_state=None, backend: str = "npz") -> None:
    """Write <prefix>.npz (+ optional <prefix>_opt.npz) and <prefix>.json,
    or an orbax checkpoint directory <prefix>.orbax."""
    os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        state = {"params": params, "bn_state": bn_state}
        if opt_state is not None:
            state["opt_state"] = opt_state
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(prefix) + ".orbax", state, force=True)
    elif backend == "npz":
        save_pytree(prefix + ".npz",
                    {"params": params, "bn_state": bn_state})
        if opt_state is not None:
            save_pytree(prefix + "_opt.npz", opt_state)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    meta = {
        "cfg": json.loads(cfg.to_json()),
        "tcfg": json.loads(tcfg.to_json()),
        "extra": extra or {},
        "backend": backend,
        "has_opt": opt_state is not None,
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
    out = {
        "cfg": cfg,
        "tcfg": tcfg,
        "extra": meta.get("extra", {}),
    }
    from mamimo_tpu.models.mlp import init_stacked

    params0, bn0 = init_stacked(jax.random.PRNGKey(0), cfg, tcfg)
    if meta.get("backend") == "orbax" or (
            not os.path.exists(prefix + ".npz")
            and os.path.isdir(prefix + ".orbax")):
        import orbax.checkpoint as ocp

        # Restore into an explicit item template: (a) NamedTuple states
        # (optax) keep their field structure — a raw dict restore would
        # re-order leaves alphabetically and silently permute them on
        # tree_unflatten; (b) restore_type=np.ndarray makes the restore
        # topology-independent (no sharding reconstruction — callers
        # re-place arrays on whatever mesh they run on).
        item = {"params": params0, "bn_state": bn0}
        has_opt = meta.get("has_opt", False)
        if like_opt_state is not None and has_opt:
            item["opt_state"] = like_opt_state
        ra = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)
        kwargs = {"item": item, "restore_args": ra}
        if has_opt and "opt_state" not in item:
            kwargs["transforms"] = {}    # partial restore: skip opt_state
        state = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(prefix) + ".orbax", **kwargs)
        out["params"] = state["params"]
        out["bn_state"] = state["bn_state"]
        if "opt_state" in item:
            out["opt_state"] = state["opt_state"]
        return out
    state = load_pytree(prefix + ".npz", {"params": params0, "bn_state": bn0})
    out["params"] = state["params"]
    out["bn_state"] = state["bn_state"]
    if like_opt_state is not None and os.path.exists(prefix + "_opt.npz"):
        out["opt_state"] = load_pytree(prefix + "_opt.npz", like_opt_state)
    return out
