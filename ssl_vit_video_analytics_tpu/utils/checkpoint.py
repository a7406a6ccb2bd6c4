"""Checkpointing: Orbax-backed save/restore of train-state PyTrees.

Implements the reference's three tiers (SURVEY.md §5.4):
- full resume checkpoints {epoch, params, opt_state, extra, cfg_hash} with
  save_every / keep_last_n rolling retention (ref: src/mae/utils.py:73-104,
  src/mae/train_mae.py:165-178)
- periodic weights-only saves
- best-metric checkpoints with metric-encoded directory names, matching the
  reference's ``finetune_epoch_{e}_top1_{acc:.4f}`` convention
  (ref: src/train_finetune.py:156-161, consumed by configs/dynamic.yaml:11)
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

from .io import ensure_dir


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, tree: Any, meta: dict | None = None) -> str:
    """Save a PyTree under ckpt_dir/name (overwrites). Returns the path.

    Orbax handles array leaves; ``meta`` (strings, nested dicts of plain
    python scalars — cfg hashes, best-metric records, epoch counters) goes to
    a JSON sidecar ``meta.json`` inside the checkpoint directory and is
    merged back into the restored dict by ``restore_checkpoint``.
    """
    ensure_dir(ckpt_dir)
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = _ckptr()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    if meta is not None:
        import json
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


def _restore_numpy(path: str) -> Any:
    """Restore every leaf as a host numpy array, ignoring saved shardings."""
    import numpy as np

    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(path)
    tree = getattr(meta, "tree", None)
    if tree is None:  # orbax >= 0.11 wraps item metadata in StepMetadata
        tree = meta.item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a PyTree; ``target`` provides structure/shardings if given.

    If a ``meta.json`` sidecar exists and the restored object is a dict, the
    metadata is merged in under its original keys.
    """
    ckptr = _ckptr()
    path = os.path.abspath(path)
    try:
        if target is not None:
            template = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            out = ckptr.restore(path, template)
        else:
            out = ckptr.restore(path)
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        # Checkpoint was written under a device topology that is absent here
        # (e.g. TPU-saved, CPU-restored for offline analysis). Fall back to a
        # host-memory numpy restore — callers device_put as needed.
        out = _restore_numpy(path)
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path) and isinstance(out, dict):
        import json
        with open(meta_path) as f:
            out = {**out, **json.load(f)}
    return out


_EPOCH_RE = re.compile(r"epoch_(\d+)")


def keep_last_n_checkpoints(ckpt_dir: str, keep: int, prefix: str = "ckpt_epoch_") -> list[str]:
    """Delete all but the newest ``keep`` checkpoints matching prefix.

    Sorted by epoch number parsed from the name (the reference sorts by mtime,
    src/mae/utils.py:95-104; epoch order is equivalent and deterministic).
    Returns the deleted paths.
    """
    if not os.path.isdir(ckpt_dir):
        return []
    entries = []
    for name in os.listdir(ckpt_dir):
        if not name.startswith(prefix) or ".orbax-checkpoint-tmp" in name \
                or name.endswith(".meta.json"):
            continue
        m = _EPOCH_RE.search(name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    deleted = []
    for _, name in entries[:-keep] if keep > 0 else entries:
        path = os.path.join(ckpt_dir, name)
        shutil.rmtree(path, ignore_errors=True)
        if os.path.exists(path + ".meta.json"):
            os.remove(path + ".meta.json")
        deleted.append(path)
    return deleted


def best_ckpt_name(task: str, epoch: int, metric_name: str, metric_value: float) -> str:
    """Metric-encoded checkpoint name, e.g. finetune_epoch_28_top1_0.6715."""
    return f"{task}_epoch_{epoch}_{metric_name}_{metric_value:.4f}"


def find_latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_epoch_") -> str | None:
    """Newest checkpoint path by epoch number, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best: tuple[int, str] | None = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith(prefix) or ".orbax-checkpoint-tmp" in name \
                or name.endswith(".meta.json"):
            continue
        m = _EPOCH_RE.search(name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), name)
    return os.path.join(ckpt_dir, best[1]) if best else None
