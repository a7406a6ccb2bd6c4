"""Dynamic-inference kernels: motion scoring, top-k frame gating, streaming
early-exit — all jittable with static shapes.

Counterparts of the reference's dynamic_infer library
(ref: src/models/dynamic_infer.py). The hard part under XLA is the
data-dependent early exit; the reference exits per sample with Python control
flow (:152-186). Here the streaming loop is a ``lax.while_loop`` whose body
encodes ONE frame for the whole batch and updates per-sample running means /
decided masks; the loop terminates as soon as every sample in the batch is
decided — the same batch-granular compute saving as the reference's
``break`` (its per-frame encoder call also always runs the full batch,
:175). ``used_frames``/``final_conf`` accounting matches exactly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EarlyExitStats(NamedTuple):
    used_frames: jax.Array  # [B] int32
    final_conf: jax.Array   # [B] float32


def motion_scores_l1(clip: jax.Array) -> jax.Array:
    """Per-frame L1 frame-difference motion scores, [B, T, H, W, C] -> [B, T].

    scores[:, 0] = 0; scores[:, t] = mean |frame_t - frame_{t-1}|
    (ref: src/models/dynamic_infer.py:33-49).
    """
    B, T = clip.shape[:2]
    if T <= 1:
        return jnp.zeros((B, T), dtype=jnp.float32)
    diffs = jnp.mean(jnp.abs(clip[:, 1:] - clip[:, :-1]).astype(jnp.float32), axis=(2, 3, 4))
    return jnp.concatenate([jnp.zeros((B, 1), dtype=jnp.float32), diffs], axis=1)


def select_topk_frames(
    clip: jax.Array, k: int, score_type: str = "motion", key: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Keep k frames per sample, temporally ordered.

    Returns (clip_sel [B, k, H, W, C], idx [B, k] ascending)
    (ref: src/models/dynamic_infer.py:52-82).
    """
    B, T = clip.shape[:2]
    k_eff = min(int(k), T)
    if score_type == "motion":
        scores = motion_scores_l1(clip)
    elif score_type == "random":
        if key is None:
            raise ValueError("random score_type needs a PRNG key")
        scores = jax.random.uniform(key, (B, T))
    else:
        raise ValueError(f"Unknown score_type: {score_type}")
    _, idx = jax.lax.top_k(scores, k_eff)       # [B, k]
    idx = jnp.sort(idx, axis=1)
    clip_sel = jnp.take_along_axis(clip, idx[:, :, None, None, None], axis=1)
    return clip_sel, idx


def streaming_early_exit(
    embed_fn: Callable[[jax.Array], jax.Array],
    classify_fn: Callable[[jax.Array], jax.Array],
    clip: jax.Array,
    threshold: float,
    min_frames: int = 4,
    max_frames: int | None = None,
    frame_step: int = 1,
) -> tuple[jax.Array, EarlyExitStats]:
    """Confidence-based streaming early exit; each frame encoded at most once.

    embed_fn: [B, H, W, C] -> [B, D]; classify_fn: [B, D] -> [B, K].
    Returns (final_logits [B, K], EarlyExitStats).
    Semantics match ref: src/models/dynamic_infer.py:92-189.
    """
    B, T = clip.shape[:2]
    if max_frames is not None:
        T = min(T, int(max_frames))
        clip = clip[:, :T]
    frame_step = max(int(frame_step), 1)
    min_frames = max(int(min_frames), 1)

    emb0 = embed_fn(clip[:, 0])
    D = emb0.shape[-1]
    num_classes = classify_fn(jnp.zeros((1, D), emb0.dtype)).shape[-1]

    def check_and_update(state):
        sum_emb, cnt, decided, final_logits, used = state
        mean_emb = sum_emb / jnp.maximum(cnt, 1)[:, None].astype(sum_emb.dtype)
        logits = classify_fn(mean_emb)
        conf = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), axis=1), axis=1)
        newly = (~decided) & (conf >= threshold) & (cnt >= min_frames)
        final_logits = jnp.where(newly[:, None], logits, final_logits)
        used = jnp.where(newly, cnt, used)
        return sum_emb, cnt, decided | newly, final_logits, used

    init = (
        emb0,                                              # sum_emb
        jnp.ones((B,), jnp.int32),                         # cnt
        jnp.zeros((B,), bool),                             # decided
        jnp.zeros((B, num_classes), emb0.dtype),           # final_logits
        jnp.zeros((B,), jnp.int32),                        # used
    )
    init = check_and_update(init)

    def cond(carry):
        t, state = carry
        return (t < T) & ~jnp.all(state[2])

    def body(carry):
        t, (sum_emb, cnt, decided, final_logits, used) = carry
        frame = jax.lax.dynamic_index_in_dim(clip, t, axis=1, keepdims=False)
        emb = embed_fn(frame)
        active = ~decided
        sum_emb = sum_emb + jnp.where(active[:, None], emb, 0)
        cnt = cnt + active.astype(jnp.int32)
        state = check_and_update((sum_emb, cnt, decided, final_logits, used))
        return t + frame_step, state

    _, (sum_emb, cnt, decided, final_logits, used) = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), init))

    # finalize undecided samples with full running mean (ref :180-186)
    mean_emb = sum_emb / jnp.maximum(cnt, 1)[:, None].astype(sum_emb.dtype)
    logits = classify_fn(mean_emb)
    remain = ~decided
    final_logits = jnp.where(remain[:, None], logits, final_logits)
    used = jnp.where(remain, cnt, used)

    final_conf = jnp.max(jax.nn.softmax(final_logits.astype(jnp.float32), axis=1), axis=1)
    return final_logits, EarlyExitStats(used_frames=used, final_conf=final_conf)
