"""On-device pixel preprocessing.

The reference normalizes on the host, per frame, in float32
(ref: src/datasets/transforms.py:18-31). TPU-first: the host ships uint8
NHWC batches (4x less PCIe/ICI traffic than float32) and this fused op runs
inside the jitted step, where XLA folds it into the first convolution's input.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ImageNet statistics (ref: src/datasets/transforms.py:35-36)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_clip(clip_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [..., H, W, 3] -> ImageNet-standardized float [..., H, W, 3]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32) * 255.0
    x = clip_u8.astype(jnp.float32)
    return ((x - mean) / std).astype(dtype)


def denormalize_clip(clip: jax.Array) -> jax.Array:
    """Inverse of normalize_clip, producing float pixels in [0, 255]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32) * 255.0
    return clip.astype(jnp.float32) * std + mean


def gaussian_blur_nhwc(img: jax.Array, kernel_size: int, sigma: float | None = None) -> jax.Array:
    """Separable Gaussian blur on [..., H, W, C] float images.

    Device-side replacement for cv2.GaussianBlur in the visual-privacy path
    (ref: src/privacy/visual_mask.py:33-41). Sigma default follows OpenCV:
    0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    k = int(kernel_size) | 1  # odd kernel enforcement, like the reference
    if sigma is None or sigma <= 0:
        sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    half = k // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (xs / sigma) ** 2)
    g = (g / jnp.sum(g)).astype(img.dtype)

    orig_shape = img.shape
    H, W, C = orig_shape[-3:]
    x = img.reshape((-1, H, W, C))
    # depthwise separable conv: blur H then W
    kernel_h = jnp.tile(g.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kernel_w = jnp.tile(g.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel_h.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kernel_h, (1, 1), [(half, half), (0, 0)], dimension_numbers=dn, feature_group_count=C)
    x = jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), [(0, 0), (half, half)], dimension_numbers=dn, feature_group_count=C)
    return x.reshape(orig_shape)
