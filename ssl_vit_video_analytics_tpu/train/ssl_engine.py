"""SSL pipeline A engine: EMA teacher-student masked feature modeling +
VICReg variance + 4-way temporal-order prediction (TOP).

Faithful to the reference loop (ref: src/train_ssl.py:165-295):
- teacher = EMA copy, sees the FULL sequence; student sees masked frames,
- loss = mfm_weight * cosine(pred_masked, teacher_masked)
       + var_weight * variance_hinge(pred_masked)
       (+ top_weight * CE over 4-way frame permutations on epochs/steps where
        TOP is enabled, with batch subsampling),
- EMA momentum update after each optimizer step (ref: :36-39, :265).

XLA adaptations: masked-token gathers become mask-weighted reductions
(identical values, static shapes); the per-sample Python permutation loop
(ref: :76-90) becomes a constant [4, T] permutation table indexed by random
labels + take_along_axis; TOP on/off is a host-side choice between two
compiled step functions (the reference's ``step % top_every`` gate, :224).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.masking import frame_mask
from ..ops.preprocess import normalize_clip
from .state import TrainState, apply_updates, update_ema


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def masked_cosine_loss(p, z, mask):
    """2 - 2*cos per masked row, mean over masked rows.

    p, z: [B, T, D] L2-normalized; mask: [B, T] bool.
    """
    m = mask.astype(jnp.float32)
    cos = jnp.sum(p * z, axis=-1)  # [B, T]
    per_row = 2.0 - 2.0 * cos
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_variance_loss(z, mask, target_std=1.0, eps=1e-4):
    """VICReg hinge over masked rows only (weighted mean/var across rows)."""
    m = mask.astype(jnp.float32)[..., None]  # [B, T, 1]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(z * m, axis=(0, 1), keepdims=True) / denom
    var = jnp.sum(((z - mean) ** 2) * m, axis=(0, 1)) / denom
    std = jnp.sqrt(var + eps)
    return jnp.mean(jax.nn.relu(target_std - std))


def perm_table_4way(T: int) -> np.ndarray:
    """[4, T] permutation index table (ref: src/train_ssl.py:55-74):
    identity / reverse / swap-halves / rotate-quarter."""
    idx = np.arange(T)
    half, q = T // 2, T // 4
    rows = [
        idx,
        idx[::-1],
        np.concatenate([idx[half:], idx[:half]]),
        idx if q == 0 else np.concatenate([idx[q:], idx[:q]]),
    ]
    return np.stack(rows).astype(np.int32)


def permute_frames_4way(rng: jax.Array, clip: jax.Array):
    """Per-sample random 4-way permutation -> (clip_top, labels [B])."""
    B, T = clip.shape[0], clip.shape[1]
    table = jnp.asarray(perm_table_4way(T))
    labels = jax.random.randint(rng, (B,), 0, 4)
    perms = table[labels]  # [B, T]
    clip_top = jnp.take_along_axis(clip, perms[:, :, None, None, None], axis=1)
    return clip_top, labels


def make_ssl_step(model, tx: optax.GradientTransformation, ssl_cfg: dict,
                  with_top: bool, compute_dtype=jnp.float32):
    """Build the jitted pipeline-A step (one variant per TOP on/off)."""
    mask_ratio = float(ssl_cfg.get("mask_ratio", 0.75))
    mfm_weight = float(ssl_cfg.get("mfm_weight", 1.0))
    var_weight = float(ssl_cfg.get("var_weight", 25.0))
    var_target_std = float(ssl_cfg.get("var_target_std", 1.0))
    var_eps = float(ssl_cfg.get("var_eps", 1e-4))
    top_weight = float(ssl_cfg.get("top_weight", 1.0))
    top_subsample = float(ssl_cfg.get("top_subsample", 1.0))
    top_detach = bool(ssl_cfg.get("top_detach_backbone", False))
    ema_momentum = float(ssl_cfg.get("ema_momentum", 0.996))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict, rng: jax.Array):
        clip = normalize_clip(batch["clip"], dtype=compute_dtype)
        B, T = clip.shape[0], clip.shape[1]
        k_mask, k_top_sel, k_top_perm, k_drop, k_drop_top = jax.random.split(rng, 5)
        mask = frame_mask(k_mask, B, T, mask_ratio)  # [B, T] bool

        # Teacher: full sequence, EMA params, no grad.
        ctx_t = model.apply(
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            clip, None, train=False, method="forward_tokens",
        )
        z_t = jax.lax.stop_gradient(_l2norm(ctx_t.astype(jnp.float32)))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            ctx_s, mutated = model.apply(
                variables, clip, mask, train=True, method="forward_tokens",
                mutable=["batch_stats"], rngs={"dropout": k_drop},
            )
            bs1 = mutated["batch_stats"]
            D = ctx_s.shape[-1]
            pred_flat, mutated2 = model.apply(
                {"params": params, "batch_stats": bs1},
                ctx_s.reshape(B * T, D), train=True, method="predictor",
                mutable=["batch_stats"],
            )
            new_bs = mutated2["batch_stats"]
            z_s = _l2norm(pred_flat.astype(jnp.float32).reshape(B, T, D))

            loss_mfm = masked_cosine_loss(z_s, z_t, mask)
            loss_var = masked_variance_loss(z_s, mask, var_target_std, var_eps)
            loss = mfm_weight * loss_mfm + var_weight * loss_var
            metrics = {"mfm": loss_mfm, "var": loss_var}

            if with_top and top_weight > 0:
                if top_subsample < 1.0:
                    k = max(2, int(B * top_subsample))
                    sel = jax.random.permutation(k_top_sel, B)[:k]
                    clip_src = clip[sel]
                else:
                    clip_src = clip
                clip_top, labels = permute_frames_4way(k_top_perm, clip_src)
                # Train-mode forward like the reference (ref:
                # src/train_ssl.py:238-241): batch statistics + dropout in
                # the TOP branch, BN running stats updated by it too.
                ctx_top, mutated3 = model.apply(
                    {"params": params, "batch_stats": new_bs},
                    clip_top, None, train=True, method="forward_tokens",
                    mutable=["batch_stats"], rngs={"dropout": k_drop_top},
                )
                new_bs = mutated3["batch_stats"]
                feat = jnp.mean(ctx_top, axis=1)
                if top_detach:
                    feat = jax.lax.stop_gradient(feat)
                logits = model.apply(
                    {"params": params, "batch_stats": new_bs},
                    feat[:, None, :], method="top_logits",
                ).astype(jnp.float32)
                loss_top = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, labels))
                loss = loss + top_weight * loss_top
                metrics["top"] = loss_top

            metrics["loss"] = loss
            return loss, (metrics, new_bs)

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx, new_batch_stats=new_bs)
        new_state = new_state.replace(
            ema_params=update_ema(new_state.ema_params, new_state.params, ema_momentum))
        return new_state, metrics

    return step
