"""Synthetic tiny datasets for tests and smoke runs.

The reference has no test suite at all (SURVEY.md §4); we build one, and it
needs data that exists nowhere on disk. ``make_synthetic_dataset`` writes a
miniature frame-folder tree + split files in the exact on-disk format the real
pipeline consumes (packed uint8 arrays, ``<frame_dir> <label>`` split lines),
with class-dependent structure (per-class mean color + moving square) so tiny
models can actually fit it in a few steps.
"""
from __future__ import annotations

import os

import numpy as np

from .splits import write_split

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _synth_video(rng: np.random.Generator, label: int, num_frames: int, size: int, num_classes: int) -> np.ndarray:
    """uint8 [N, S, S, 3] with class-coded color and motion."""
    base = np.zeros((num_frames, size, size, 3), dtype=np.float32)
    hue = 255.0 * (label + 1) / (num_classes + 1)
    base[..., label % 3] = hue
    sq = max(2, size // 4)
    for t in range(num_frames):
        # square moves with class-dependent velocity
        x = int((t * (label + 1)) % max(1, size - sq))
        base[t, x:x + sq, x:x + sq, :] = 255.0 - hue
    noise = rng.normal(0, 8, base.shape).astype(np.float32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def make_synthetic_dataset(
    root: str,
    num_classes: int = 4,
    videos_per_class: int = 3,
    num_frames: int = 24,
    image_size: int = 32,
    seed: int = 0,
    write_jpegs: bool = False,
) -> dict[str, str]:
    """Create frame dirs + packed arrays + train/val split files under root.

    Returns {"train": path, "val": path, "root": root}.
    """
    rng = np.random.default_rng(seed)
    items: list[tuple[str, int]] = []
    for label in range(num_classes):
        for v in range(videos_per_class):
            frame_dir = os.path.join(root, f"class{label:02d}", f"vid{v:02d}")
            os.makedirs(frame_dir, exist_ok=True)
            frames = _synth_video(rng, label, num_frames, image_size, num_classes)
            np.save(os.path.join(frame_dir, f"packed_{image_size}.npy"), frames)
            if write_jpegs and cv2 is not None:
                for t in range(num_frames):
                    cv2.imwrite(
                        os.path.join(frame_dir, f"frame_{t:05d}.jpg"),
                        cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR),
                    )
            items.append((frame_dir, label))

    # deterministic interleaved split: last video of each class -> val
    train = [(p, y) for (p, y) in items if not p.endswith(f"vid{videos_per_class - 1:02d}")]
    val = [(p, y) for (p, y) in items if p.endswith(f"vid{videos_per_class - 1:02d}")]
    split_dir = os.path.join(root, "splits")
    os.makedirs(split_dir, exist_ok=True)
    train_path = os.path.join(split_dir, "train.txt")
    val_path = os.path.join(split_dir, "val.txt")
    write_split(train, train_path)
    write_split(val, val_path)
    return {"train": train_path, "val": val_path, "root": root}
