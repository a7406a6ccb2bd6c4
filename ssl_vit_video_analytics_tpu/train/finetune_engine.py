"""Supervised finetune engine: the 4 modes, jitted train/eval steps.

Mode semantics follow the reference exactly (ref: src/train_finetune.py:198-210
resolve_mode; :294-313 freeze policy; :334-340 two-stage unfreeze + optimizer
rebuild; :164-195 per-group LRs). TPU-first: freezing is an optax trainability
mask (frozen leaves get zero updates) instead of requires_grad flips, and the
stage-2 "rebuild" swaps the optax transformation + re-inits opt_state at the
epoch boundary — both are host-side decisions, so each stage is one compiled
step function.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models import VideoClassifier, MobileViTBackbone, TinyViTBackbone
from ..ops.preprocess import normalize_clip
from ..utils.metrics import topk_accuracy
from .state import TrainState, make_optimizer, apply_updates

VALID_MODES = ("ft_random", "linear_probe", "ft_ssl", "two_stage")


def resolve_mode(ft_cfg: dict, cli_mode: str | None) -> str:
    mode = cli_mode or ft_cfg.get("experiment", {}).get("mode", "ft_ssl")
    if mode not in VALID_MODES:
        raise ValueError(f"[ERROR] Unknown mode={mode}, must be one of {sorted(VALID_MODES)}")
    return mode


def build_model(num_classes: int, embed_dim: int, dtype=jnp.float32,
                attn_impl: str | None = None, backbone: str = "mobilevit_s",
                backbone_kwargs: dict | None = None) -> VideoClassifier:
    """``backbone``: "mobilevit_s" (reference parity — pipeline-A SSL
    checkpoints) or "tinyvit" (MAE-pretrained transfer — pipeline-B/C
    encoder checkpoints; embed dim is fixed by the tapped stage, so
    ``embed_dim`` is ignored there)."""
    kw = dict(backbone_kwargs or {})
    if backbone in ("tinyvit", "tinyvit_21m"):
        bb = TinyViTBackbone(dtype=dtype, attn_impl=attn_impl, **kw)
    elif backbone in ("mobilevit_s", "mobilevit"):
        bb = MobileViTBackbone(embed_dim=embed_dim, dtype=dtype,
                               attn_impl=attn_impl, **kw)
    else:
        raise ValueError(f"[ERROR] Unknown backbone={backbone}")
    return VideoClassifier(backbone=bb, num_classes=num_classes)


def init_model(model: VideoClassifier, rng, clip_shape) -> dict:
    dummy = jnp.zeros(clip_shape, jnp.float32)
    return jax.jit(lambda k: model.init(k, dummy))(rng)


def load_pretrained_ssl(variables: dict, ssl_variables: dict) -> dict:
    """Remap an SSL checkpoint's ``encoder`` subtree onto the classifier's
    ``backbone`` (ref: src/train_finetune.py:43-63 remaps encoder.* keys).

    Handles both checkpoint families:
      pipeline A:  encoder IS the MobileViT backbone -> drop onto ``backbone``
      pipeline B/C: encoder is a TinyViT nested as ``backbone/encoder`` in
        the TinyViTBackbone adapter -> drop one level deeper. A stage_limit=3
        classifier matches the pipeline-B encoder tree exactly (the MAE init
        only ever traced stages 0-2, entry/train_ssl_mae.py save path).
    """
    out = jax.tree.map(lambda x: x, variables)  # shallow copy via rebuild
    for col in ("params", "batch_stats"):
        src = ssl_variables.get(col, {}).get("encoder")
        if src is None or col not in out or "backbone" not in out[col]:
            continue
        tgt = out[col]["backbone"]
        nested = isinstance(tgt, dict) and set(tgt.keys()) == {"encoder"}
        if nested:
            tgt = tgt["encoder"]
        if jax.tree.structure(tgt) != jax.tree.structure(src):
            raise ValueError(
                f"[ERROR] SSL encoder/{col} tree does not match classifier backbone")
        bad = [s.shape for t, s in zip(jax.tree.leaves(tgt), jax.tree.leaves(src))
               if t.shape != s.shape]
        if bad:
            # same module names but different widths would load silently and
            # crash (or worse, broadcast) later — fail at the checkpoint
            raise ValueError(
                f"[ERROR] SSL encoder/{col} leaf shapes do not match classifier "
                f"backbone ({len(bad)} mismatched leaves, e.g. {bad[0]})")
        loaded = jax.tree.map(lambda t, s: s.astype(t.dtype), tgt, src)
        out[col]["backbone"] = {"encoder": loaded} if nested else loaded
    return out


def trainable_mask(params: Any, freeze_backbone: bool) -> Any:
    """bool PyTree: False under 'backbone' when frozen, True elsewhere."""
    def label(path, _):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        if freeze_backbone and keys and keys[0] == "backbone":
            return False
        return True
    return jax.tree_util.tree_map_with_path(label, params)


def build_finetune_tx(ft_training_cfg: dict, mode: str, params: Any,
                      freeze_backbone: bool) -> optax.GradientTransformation:
    """AdamW with mode-dependent LR structure (ref: src/train_finetune.py:164-195)."""
    wd = float(ft_training_cfg.get("weight_decay", 0.05))
    # reference finetune never clips (src/train_finetune.py has no
    # clip_grad_norm_); grad_clip stays available as an opt-in config knob
    clip = (float(ft_training_cfg["grad_clip"])
            if ft_training_cfg.get("grad_clip") is not None else None)
    lr = float(ft_training_cfg["learning_rate"])
    if mode == "two_stage":
        head_lr = float(ft_training_cfg.get("head_lr", lr))
        backbone_lr = float(ft_training_cfg.get("backbone_lr", lr))

        def label(path, _):
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            if keys and keys[0] == "backbone":
                return "freeze" if freeze_backbone else "backbone"
            return "head"

        labels = jax.tree_util.tree_map_with_path(label, params)
        return optax.multi_transform(
            {
                "head": make_optimizer(head_lr, weight_decay=wd, grad_clip=clip),
                "backbone": make_optimizer(backbone_lr, weight_decay=wd, grad_clip=clip),
                "freeze": optax.set_to_zero(),
            },
            labels,
        )
    mask = trainable_mask(params, freeze_backbone)
    return make_optimizer(lr, weight_decay=wd, grad_clip=clip, trainable_mask=mask)


def make_train_step(model: VideoClassifier, tx: optax.GradientTransformation,
                    compute_dtype=jnp.float32, seed: int = 0, augment=None):
    """One jitted supervised step: normalize [-> augment] -> forward -> CE
    -> update.

    Dropout/DropPath RNG = fold_in(key(seed), step): per-step unique, and
    different run seeds get different regularization streams. ``augment`` is
    an optional on-device (key, clip) -> clip fn (ops/augment.py) fused into
    the same compiled step; the reference's supervised path has none, so the
    default is None.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        clip = normalize_clip(batch["clip"], dtype=compute_dtype)
        labels = batch["label"]

        if augment is not None:
            clip = augment(
                jax.random.fold_in(jax.random.key(seed + 1), state.step), clip)
        drop_key = jax.random.fold_in(jax.random.key(seed), state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clip, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_key},
            )
            logits = out.astype(jnp.float32)
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx, new_batch_stats=new_bs)
        metrics = {"loss": loss, **topk_accuracy(logits, labels)}
        return new_state, metrics

    return train_step


def make_eval_step(model: VideoClassifier, compute_dtype=jnp.float32):
    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        clip = normalize_clip(batch["clip"], dtype=compute_dtype)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            clip, train=False,
        ).astype(jnp.float32)
        return logits

    return eval_step


def evaluate(eval_step, state: TrainState, batches, ks=(1, 5)) -> dict:
    """Masked (padding-aware) top-k over an eval split."""
    total = 0
    correct = {k: 0.0 for k in ks}
    loss_sum = 0.0
    for batch in batches:
        logits = eval_step(state, batch)
        valid = batch.get("valid")
        labels = batch["label"]
        maxk = min(max(ks), logits.shape[-1])
        _, topi = jax.lax.top_k(logits, maxk)
        match = jax.device_get(topi == labels[:, None])
        v = jax.device_get(valid) if valid is not None else None
        for i in range(match.shape[0]):
            if v is not None and not v[i]:
                continue
            total += 1
            for k in ks:
                correct[k] += bool(match[i, :k].any())
    return {f"top{k}": (correct[k] / max(total, 1)) for k in ks}
