"""Regression test for the round-3 frozen-training fix.

Pipeline B (pixel MAE on the TinyViT variant) was silently frozen for two
rounds: the stride-2 downsample MBConv zero-inits its projection BN scale
(faithful to ref: src/models/tiny_vit.py:50), so at init the transformer
stages see constant input, grad norms are astronomically large, and a
global-norm clip (a non-reference default we had added) scaled every
coordinate below Adam's eps — loss stayed at its init value forever while
everything LOOKED healthy (finite loss, no non-finite skips).

This test asserts actual optimization: 40 tiny-scale steps must cut the
raw-pixel reconstruction loss roughly in half. With the old clip default it
stays within a few percent of the init value.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
from ssl_vit_video_analytics_tpu.train.mae_engine import (
    make_pixel_mae_step, wrap_accum_and_skip)
from ssl_vit_video_analytics_tpu.train.state import (
    create_train_state, make_optimizer)


def test_pixel_mae_step_actually_learns():
    B, T, S = 4, 4, 32
    cfg = {"model": {"type": "tiny_vit_21m_variant",
                     "embed_dims": [8, 16, 24, 32],
                     "decoder_embed_dim": 16, "decoder_depth": 1,
                     "decoder_num_heads": 2, "use_checkpoint": False},
           "dataset": {"clip_len": T, "image_size": S}}
    model = build_model(cfg, jnp.float32)
    L = (S // 8) ** 2
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, T, S, S, 3), jnp.float32),
        jnp.zeros((1, T, L), bool)))(jax.random.key(0))
    # production default: no grad clip (reference pipeline B never clips)
    tx = wrap_accum_and_skip(
        make_optimizer(1e-3, weight_decay=0.05, grad_clip=None), 1)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step_fn = make_pixel_mae_step(model, tx, mask_ratio=0.75, patch_size=8,
                                  norm_pix_loss=False,
                                  compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (16, T, S, S, 3)).astype(np.uint8)
    for i in range(16):  # structured: constant background + fixed square
        clips[i] = rng.integers(40, 200, 3)
        clips[i, :, 5:15, 5:15] = rng.integers(0, 255, 3)

    key = jax.random.key(1)
    losses = []
    for _ in range(40):
        idx = rng.integers(0, 16, B)
        key, k = jax.random.split(key)
        state, m = step_fn(state, {"clip": jnp.asarray(clips[idx])}, k)
        losses.append(float(m["loss"]))

    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert np.isfinite(last), losses
    assert last < 0.6 * first, (first, last)
    # the grad_norm metric must be populated (observability for this class
    # of failure)
    assert float(m["grad_norm"]) > 0
