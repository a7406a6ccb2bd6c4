"""On-device clip augmentation for supervised finetuning (opt-in).

The reference's supervised path has NO augmentation (resize+normalize only,
ref: src/datasets/transforms.py:34-41), so this is a TPU-native extension,
off by default for parity. Everything is a pure function of a PRNG key with
static shapes, so it fuses into the compiled train step: per-sample spatial
translation via pad + per-sample dynamic_slice (temporally consistent across
the clip), photometric brightness/contrast jitter in normalized-float space,
and optional horizontal flip (off by default — flipping mirrors motion
trajectories, which can be class-bearing in video).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def augment_clip(key: jax.Array, clip: jax.Array, *, max_shift: int = 8,
                 brightness: float = 0.2, contrast: float = 0.2,
                 hflip: bool = False) -> jax.Array:
    """clip: [B, T, H, W, C] float (post-normalize). Returns same shape/dtype.

    Each sample draws one (dy, dx) shift, one brightness delta, one contrast
    gain — shared across its T frames so the clip stays temporally coherent.
    """
    B, T, H, W, C = clip.shape
    k_shift, k_bri, k_con, k_flip = jax.random.split(key, 4)
    out = clip

    if max_shift > 0:
        pad = [(0, 0), (0, 0), (max_shift, max_shift),
               (max_shift, max_shift), (0, 0)]
        padded = jnp.pad(out, pad, mode="edge")
        offs = jax.random.randint(k_shift, (B, 2), 0, 2 * max_shift + 1)

        def slice_one(img, off):  # img [T, H+2s, W+2s, C]
            return jax.lax.dynamic_slice(
                img, (0, off[0], off[1], 0), (T, H, W, C))

        out = jax.vmap(slice_one)(padded, offs)

    if brightness > 0:
        delta = jax.random.uniform(
            k_bri, (B, 1, 1, 1, 1), out.dtype, -brightness, brightness)
        out = out + delta
    if contrast > 0:
        gain = jax.random.uniform(
            k_con, (B, 1, 1, 1, 1), out.dtype, 1.0 - contrast, 1.0 + contrast)
        mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
        out = (out - mean) * gain + mean
    if hflip:
        flip = jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1, 1))
        out = jnp.where(flip, out[:, :, :, ::-1, :], out)
    return out


def augment_from_cfg(train_cfg: dict):
    """Returns augment fn (key, clip) -> clip, or None when disabled.

    Config: ``training.augment: true`` for defaults, or a mapping
    ``{max_shift: 8, brightness: 0.2, contrast: 0.2, hflip: false}``.
    """
    aug = train_cfg.get("augment", False)
    if not aug:
        return None
    kwargs = dict(aug) if isinstance(aug, dict) else {}
    return functools.partial(augment_clip, **kwargs)
