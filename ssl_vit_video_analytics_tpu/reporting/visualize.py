"""Training-time visualization hooks.

- ``save_mae_vis``: every-N-epoch token-mask grid + masked-token error
  heatmap PNGs for pipeline C (ref: src/mae/visualize.py:10-84). Gracefully
  no-ops without matplotlib (ref: :19-24).
- ``save_reconstruction_triptych``: pipeline-B orig|masked|recon frame strips
  (ref: src/visualize_mae.py:195-210).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:  # pragma: no cover
    plt = None

from ..data.masking import make_token_mask
from ..ops.patchify import patchify, unpatchify
from ..ops.preprocess import denormalize_clip, normalize_clip


def save_mae_vis(model, state, ds, out_dir: str, epoch: int, tokens_per_frame: int,
                 mask_ratio: float, mask_mode: str, dtype) -> str | None:
    """One-sample mask grid [T, P] + per-token reconstruction-error heatmap."""
    if plt is None:
        return None
    clip_u8 = ds.get_clip(0)[None]  # [1, T, H, W, 3]
    T = clip_u8.shape[1]
    key = jax.random.key(epoch)
    mask = make_token_mask(key, 1, T, tokens_per_frame, mask_ratio, mask_mode)
    clip = normalize_clip(jnp.asarray(clip_u8), dtype=dtype)
    rec, target = jax.jit(lambda v, c, m: model.apply(v, c, m))(
        {"params": state.params, "batch_stats": state.batch_stats}, clip, mask)
    err = np.asarray(jnp.mean((rec.astype(jnp.float32)
                               - target.astype(jnp.float32)) ** 2, axis=-1))[0]
    mask_np = np.asarray(mask)[0].reshape(T, tokens_per_frame)
    err_np = err.reshape(T, tokens_per_frame)

    ensure = os.path.join(out_dir, "vis")
    os.makedirs(ensure, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].imshow(mask_np, aspect="auto", cmap="gray_r", interpolation="nearest")
    axes[0].set_title(f"token mask (ep {epoch}, ratio {mask_ratio:.2f}, {mask_mode})")
    axes[0].set_xlabel("token")
    axes[0].set_ylabel("frame")
    im = axes[1].imshow(err_np * mask_np, aspect="auto", cmap="magma", interpolation="nearest")
    axes[1].set_title("masked-token error")
    fig.colorbar(im, ax=axes[1])
    path = os.path.join(ensure, f"mae_vis_epoch_{epoch}.png")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def save_reconstruction_triptych(model, variables, clip_u8: np.ndarray, mask,
                                 patch_size: int, out_path: str, dtype,
                                 max_frames: int = 4,
                                 norm_pix: bool = False) -> str | None:
    """orig | masked | recon rows for the first few frames (pipeline B).

    With ``norm_pix`` the decoder predicts per-patch standardized pixels
    (train/losses.py norm-pix targets), so predictions are un-standardized
    with the ground-truth patch mean/std before unpatchify — the standard
    MAE visualization convention.
    """
    if plt is None:
        return None
    clip = normalize_clip(jnp.asarray(clip_u8[None]), dtype=dtype)
    B, T, H, W, C = clip.shape
    pred = jax.jit(lambda v, c, m: model.apply(v, c, m))(variables, clip, mask)
    pred = pred.astype(jnp.float32)
    if norm_pix:
        tgt = patchify(clip.astype(jnp.float32), patch_size)
        mean = jnp.mean(tgt, axis=-1, keepdims=True)
        var = jnp.var(tgt, axis=-1, keepdims=True)
        pred = pred * jnp.sqrt(var + 1e-6) + mean
    recon = denormalize_clip(unpatchify(pred, patch_size, T, H, W))
    recon_np = np.clip(np.asarray(recon)[0], 0, 255).astype(np.uint8)

    gh = H // patch_size
    mask_img = np.asarray(mask)[0].reshape(T, gh, gh)
    mask_up = np.kron(mask_img, np.ones((patch_size, patch_size)))[..., None]
    masked_np = (clip_u8 * (1 - mask_up)).astype(np.uint8)
    # MAE-paper convention: paste VISIBLE patches from the input — the loss
    # is masked-only, so predictions at visible positions are untrained
    # (visibly garbage under raw-pixel loss) and not part of the pretext
    recon_np = (clip_u8 * (1 - mask_up) + recon_np * mask_up).astype(np.uint8)

    n = min(max_frames, T)
    fig, axes = plt.subplots(3, n, figsize=(2.2 * n, 6.8))
    if n == 1:
        axes = axes[:, None]
    for t in range(n):
        for r, (img, title) in enumerate(
                [(clip_u8[t], "orig"), (masked_np[t], "masked"), (recon_np[t], "recon")]):
            axes[r, t].imshow(img)
            axes[r, t].axis("off")
            if t == 0:
                axes[r, t].set_ylabel(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
