"""Functional train state + optimizer factory.

One TrainState serves every pipeline: params + batch_stats (flax BN
collection) + optax state (+ optional EMA params for SSL pipeline A's teacher,
ref: src/train_ssl.py:333-335). Pure PyTree -> trivially checkpointable with
Orbax and shardable with pjit.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def ema_variables(self) -> dict:
        v = {"params": self.ema_params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup then cosine decay (the schedule every reference pipeline
    builds by hand, e.g. ref: src/mae/train_mae.py:53-69, src/lr_decay.py:3-25)."""
    if warmup_steps >= total_steps:
        warmup_steps = max(total_steps - 1, 0)
    warmup_steps = max(warmup_steps, 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps > 0 else base_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        # optax needs a strictly positive cosine span; tiny smoke runs
        # (total steps <= warmup) were crashing with decay_steps=0
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=min_lr,
    )


def make_optimizer(
    learning_rate: float | optax.Schedule,
    weight_decay: float = 0.05,
    # None: clipping is strictly opt-in — the reference clips only where a
    # config sets it (pipelines A/C), and a silent clip default froze
    # pipeline-B training for two rounds (docs/ROUND3_NOTES.md)
    grad_clip: float | None = None,
    betas: tuple[float, float] = (0.9, 0.999),
    trainable_mask: Any | None = None,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip + optional trainability mask.

    ``trainable_mask`` is a bool PyTree (prefix) — False leaves get zero
    updates. This replaces the reference's requires_grad freezing
    (ref: src/train_finetune.py:294-313) functionally: frozen params simply
    never receive updates, and the optimizer state for them stays zero.
    """
    chain = []
    if grad_clip is not None and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                             weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def param_group_optimizer(
    groups: dict[str, optax.GradientTransformation],
    label_fn: Callable[[Any], Any],
    params: Any,
) -> optax.GradientTransformation:
    """Per-param-group optimizers (head LR vs backbone LR,
    ref: src/train_finetune.py:164-195) via optax.multi_transform."""
    return optax.multi_transform(groups, label_fn(params))


def create_train_state(params, tx: optax.GradientTransformation,
                       batch_stats=None, ema_params=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=ema_params,
    )


def apply_updates(state: TrainState, grads, tx: optax.GradientTransformation,
                  new_batch_stats=None) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=new_batch_stats if new_batch_stats is not None else state.batch_stats,
    )


def update_ema(ema_params, params, momentum: float):
    """EMA teacher update: e = m*e + (1-m)*p (ref: src/train_ssl.py:36-39)."""
    return jax.tree.map(lambda e, p: e * momentum + p.astype(e.dtype) * (1.0 - momentum),
                        ema_params, params)


def path_label_fn(predicate: Callable[[tuple], bool], true_label: str, false_label: str):
    """Build a multi_transform label tree from a key-path predicate."""
    def fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: true_label
            if predicate(tuple(getattr(k, "key", str(k)) for k in path))
            else false_label,
            params,
        )
    return fn
