"""MAE training engines for SSL pipelines B (pixel) and C (feature tokens).

One fused, jitted step each: on-device normalize -> fused mask generation ->
encode/decode -> masked loss -> update. Mask generation uses the step's PRNG
key (no host-side randperm loops, ref: src/datasets/mae_loader.py:80-90).

Pipeline-C extras reproduced from the reference engine
(ref: src/mae/engine.py:14-162): gradient accumulation (optax.MultiSteps),
global-norm clipping, NON-FINITE-LOSS SKIP (optax.apply_if_finite — a step
with non-finite grads leaves params/opt state untouched, :89-93), and the
representation-collapse detector (pred_std < 0.05 -> [WARN:pred_std_low],
:143-145) surfaced through step metrics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..data.masking import get_tube_mask
from ..ops.patchify import patchify
from ..ops.preprocess import normalize_clip
from .losses import build_mae_loss, mae_loss_l2, reconstruction_error_stats
from .state import TrainState, apply_updates

COLLAPSE_STD_THRESHOLD = 0.05  # ref: src/mae/engine.py:143-145


def make_pixel_mae_step(
    model,
    tx: optax.GradientTransformation,
    mask_ratio: float,
    patch_size: int = 8,
    norm_pix_loss: bool = True,
    compute_dtype=jnp.float32,
    pp_mesh=None,
    pp_microbatches: int | None = None,
    pp_axis: str = "pipe",
    moe_aux_weight: float = 0.0,
):
    """Pipeline-B step: tube mask -> TinyVideoMAE -> masked MSE on pixels
    (ref: src/train_ssl_mae.py:66-89).

    ``moe_aux_weight`` > 0 (requires a MoE decoder,
    model.decoder_moe_experts > 0) adds the Switch-style load-balance
    auxiliary each MoeMlp sows (mean over decoder blocks) to the loss —
    without it, top-1 routing degenerates to one hot expert. Reported as
    the ``moe_aux`` metric (1.0 = perfectly balanced).

    With ``pp_mesh`` set, the decoder's transformer blocks run PIPELINE-
    PARALLEL over the mesh's ``pp_axis`` (parallel/pp.py): the model's
    ``embed_tokens``/``predict_pixels`` halves run as usual and the block
    stack in between streams ``pp_microbatches`` microbatches through the
    stages (default: one per stage). Requires decoder_depth divisible by the
    axis size and batch divisible by the microbatch count. Numerically
    equivalent to the sequential decoder (tests/test_pp.py pins this at the
    full-train-step level).
    """
    if pp_mesh is not None:
        if getattr(model, "decoder_moe_experts", 0):
            raise ValueError("pipeline-parallel decoder does not support the "
                             "MoE decoder (use device.expert_parallel)")
        from ..models.layers import TransformerBlock
        from ..parallel.pp import pipeline_transformer_encoder
        pp_block = TransformerBlock(
            model.decoder_num_heads, mlp_ratio=4.0, dtype=model.dtype,
            attn_impl=model.attn_impl)
        n_micro = pp_microbatches or pp_mesh.shape[pp_axis]
    moe_aux_on = moe_aux_weight > 0 and getattr(model, "decoder_moe_experts", 0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict, rng: jax.Array):
        clip = normalize_clip(batch["clip"], dtype=compute_dtype)
        B, T = clip.shape[0], clip.shape[1]
        L = (clip.shape[2] // patch_size) * (clip.shape[3] // patch_size)
        k_mask, k_drop = jax.random.split(rng)
        mask = get_tube_mask(k_mask, B, T, L, mask_ratio)   # [B, T, L]
        target = patchify(clip.astype(jnp.float32), patch_size)  # [B, T*L, p*p*3]
        flat_mask = mask.reshape(B, T * L)

        def forward(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            mut = ["batch_stats", "intermediates"] if moe_aux_on else ["batch_stats"]
            if pp_mesh is None:
                return model.apply(variables, clip, mask, train=True,
                                   mutable=mut,
                                   rngs={"dropout": k_drop})
            x_dec, mutated = model.apply(
                variables, clip, mask, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop}, method="embed_tokens")
            x_dec = pipeline_transformer_encoder(
                pp_block, params["decoder"], x_dec, n_micro, pp_mesh,
                axis=pp_axis)
            pred = model.apply({"params": params}, x_dec,
                               method="predict_pixels")
            return pred, mutated

        def loss_fn(params):
            pred, mutated = forward(params)
            loss = mae_loss_l2(pred, target, flat_mask, normalize_target=norm_pix_loss)
            aux = jnp.float32(0.0)
            if moe_aux_on:
                sown = [v for path, v in jax.tree_util.tree_flatten_with_path(
                            mutated["intermediates"])[0]
                        if any(getattr(k, "key", None) == "moe_aux_loss"
                               for k in path)]
                aux = sum(sown) / len(sown)  # mean over decoder MoE blocks
                loss = loss + moe_aux_weight * aux
            return loss, (pred, mutated["batch_stats"], aux)

        (loss, (pred, new_bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx, new_batch_stats=new_bs)
        pred_std = jnp.std(pred.astype(jnp.float32))
        # grad_norm is the PER-MICROBATCH global norm: with
        # training.accumulation_steps > 1 (optax.MultiSteps) it is NOT the
        # norm of the accumulated update an opted-in clip would see — read it
        # as a per-step health signal (inf/collapse detection), not the
        # clipped quantity.
        metrics = {"loss": loss, "pred_std": pred_std,
                   "grad_norm": optax.global_norm(grads),
                   "collapse": (pred_std < COLLAPSE_STD_THRESHOLD).astype(jnp.float32)}
        if moe_aux_on:
            metrics["moe_aux"] = aux
        return new_state, metrics

    return step


def make_token_mae_step(
    model,
    tx: optax.GradientTransformation,
    tokens_per_frame: int,
    mask_mode: str = "random",
    loss_type: str = "l2",
    normalize_target: bool = True,
    augment_hflip: bool = False,
    compute_dtype=jnp.float32,
):
    """Pipeline-C step: token mask -> TinyViTMAE -> masked feature loss.

    mask_ratio is passed per-call (donated as a traced scalar) so the
    epoch-indexed schedule (ref: configs/mae_train.yaml mask-ratio schedule)
    does NOT retrigger compilation. ``augment_hflip`` applies the reference's
    clip-level p=0.5 horizontal flip (ref: src/datasets/mae_dataset.py:118) —
    on device, per sample, from the step key.
    """
    loss_fn_masked = build_mae_loss(loss_type, normalize_target=normalize_target)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict, rng: jax.Array, mask_ratio: jax.Array):
        clip = normalize_clip(batch["clip"], dtype=compute_dtype)
        B, T = clip.shape[0], clip.shape[1]
        N = T * tokens_per_frame
        k_mask, k_drop, k_flip = jax.random.split(rng, 3)
        if augment_hflip:
            flip = jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1, 1))
            clip = jnp.where(flip, clip[:, :, :, ::-1, :], clip)
        # traced-ratio variant of make_token_mask: rank-vs-count comparison
        noise = jax.random.uniform(k_mask, (B, N) if mask_mode == "random" else (B, tokens_per_frame))
        order = jnp.argsort(noise, axis=-1, descending=True)
        ranks = jnp.argsort(order, axis=-1)
        if mask_mode == "random":
            num_mask = jnp.maximum(1, jnp.round(N * mask_ratio)).astype(jnp.int32)
            token_mask = ranks < num_mask
        else:  # tube
            num_mask = jnp.maximum(1, jnp.round(tokens_per_frame * mask_ratio)).astype(jnp.int32)
            token_mask = jnp.tile(ranks < num_mask, (1, T))

        def loss_fn(params):
            (rec, target), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clip, token_mask, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            loss = loss_fn_masked(rec, target, token_mask)
            return loss, (rec, target, mutated["batch_stats"])

        (loss, (rec, target, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx, new_batch_stats=new_bs)
        stats = reconstruction_error_stats(rec, target, token_mask)
        metrics = {"loss": loss, **stats,
                   "grad_norm": optax.global_norm(grads),
                   "collapse": (stats["pred_std"] < COLLAPSE_STD_THRESHOLD).astype(jnp.float32)}
        return new_state, metrics

    return step


def wrap_accum_and_skip(tx: optax.GradientTransformation,
                        accum_steps: int = 1,
                        skip_nonfinite: bool = True) -> optax.GradientTransformation:
    """Gradient accumulation + non-finite-update skip
    (ref: src/mae/engine.py:89-108)."""
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10_000)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
