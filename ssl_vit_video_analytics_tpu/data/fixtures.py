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


def _synth_face(rng: np.random.Generator, size: int = 224) -> np.ndarray:
    """BGR uint8 [size, size, 3] with one synthetic face YuNet actually
    detects (score ~0.9 at default thresholds): soft radially-shaded skin,
    sclera/iris/pupil eyes, brows, nose shadow, two-tone lips, hair. Position
    and scale are jittered per call."""
    assert cv2 is not None, "cv2 required for synthetic faces"
    img = np.zeros((size, size, 3), np.uint8)
    img[:] = rng.integers(40, 100, 3, dtype=np.uint8)
    s = int(size * rng.uniform(0.22, 0.38))
    cx = int(rng.uniform(s, size - s))
    cy = int(rng.uniform(s * 1.1, size - s * 1.1))
    yy, xx = np.mgrid[0:size, 0:size]
    d = np.sqrt(((xx - cx) / (s * 0.72)) ** 2 + ((yy - cy) / float(s)) ** 2)
    head = np.clip(1.0 - d, 0, 1)
    skin = np.stack([120 + 60 * head, 150 + 70 * head, 190 + 55 * head], -1)
    m = (d < 1.0).astype(np.float32)[..., None]
    img = (img * (1 - m) + skin * m).astype(np.uint8)
    cv2.ellipse(img, (cx, cy - int(s * 0.55)), (int(s * 0.78), int(s * 0.55)),
                0, 180, 360, (30, 25, 20), -1)
    for dx in (-int(s * 0.33), int(s * 0.33)):
        ex, ey = cx + dx, cy - int(s * 0.15)
        cv2.ellipse(img, (ex, ey), (int(s * 0.18), int(s * 0.09)), 0, 0, 360,
                    (245, 245, 245), -1)
        cv2.circle(img, (ex, ey), int(s * 0.07), (90, 60, 30), -1)
        cv2.circle(img, (ex, ey), max(1, int(s * 0.03)), (10, 10, 10), -1)
        cv2.ellipse(img, (ex, ey), (int(s * 0.18), int(s * 0.09)), 0, 0, 360,
                    (70, 60, 50), 1)
        cv2.ellipse(img, (ex, ey - int(s * 0.2)), (int(s * 0.2), int(s * 0.06)),
                    0, 200, 340, (40, 35, 30), 4)
    cv2.line(img, (cx, cy - int(s * 0.1)), (cx - int(s * 0.06), cy + int(s * 0.22)),
             (120, 140, 170), 2)
    cv2.ellipse(img, (cx, cy + int(s * 0.25)), (int(s * 0.1), int(s * 0.05)),
                0, 0, 180, (100, 110, 140), 2)
    cv2.ellipse(img, (cx, cy + int(s * 0.52)), (int(s * 0.25), int(s * 0.08)),
                0, 0, 180, (90, 90, 170), -1)
    cv2.ellipse(img, (cx, cy + int(s * 0.50)), (int(s * 0.25), int(s * 0.05)),
                0, 180, 360, (110, 110, 190), -1)
    return img


def make_synthetic_faces(root: str, num_frames: int = 32, size: int = 224,
                         face_rate: float = 0.75, seed: int = 0) -> str:
    """Write a frame tree of JPEGs for the VISUAL privacy path: ~face_rate of
    the frames contain a YuNet-detectable synthetic face, the rest are
    face-free backgrounds — so detection-rate stats are non-degenerate.
    Returns root."""
    assert cv2 is not None, "cv2 required for synthetic faces"
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(num_frames):
        if rng.uniform() < face_rate:
            img = _synth_face(rng, size)
        else:
            img = np.zeros((size, size, 3), np.uint8)
            img[:] = rng.integers(30, 120, 3, dtype=np.uint8)
            cv2.rectangle(img, (size // 4, size // 4), (size // 2, size // 2),
                          tuple(int(v) for v in rng.integers(0, 255, 3)), -1)
        cv2.imwrite(os.path.join(root, f"frame_{i:05d}.jpg"), img)
    return root


def _synth_hard_video(rng: np.random.Generator, label: int, num_frames: int,
                      size: int, num_classes: int, appearance_signal: float,
                      motion_signal: float, nuisance: float) -> np.ndarray:
    """uint8 [N, S, S, 3] where the CLASS lives mostly in the sprite's motion
    trajectory (angle/oscillation), while appearance (colors, background,
    distractors, brightness) is per-clip nuisance.

    Unlike ``_synth_video`` (trivially separable per-class color), this is
    hard enough that (a) a random-init classifier does not saturate in a few
    epochs — leaving room for an SSL-pretrain advantage to show — and (b) a
    re-identification attacker on embeddings stays below 1.0, so the
    feature-privacy sigma x mask grid traces a real frontier
    (VERDICT r2 #2/#3).
    """
    bg = rng.normal(110, 40 * nuisance, 3).clip(20, 235)
    img = np.empty((num_frames, size, size, 3), np.float32)
    img[:] = bg
    # per-clip random background clutter (static distractor squares)
    for _ in range(int(3 * nuisance) + 1):
        x0, y0 = rng.integers(0, size - 4, 2)
        w = int(rng.integers(3, max(4, size // 4)))
        img[:, y0:y0 + w, x0:x0 + w] = rng.uniform(0, 255, 3)
    # class-coded trajectory: angle + oscillation frequency; phase/speed jitter
    theta = 2.0 * np.pi * label / num_classes + rng.normal(0, 0.15 * nuisance)
    freq = 1.0 + (label % 5) * 0.5 * motion_signal
    phase = rng.uniform(0, 2 * np.pi)
    speed = rng.uniform(0.8, 1.2)
    sq = max(3, size // 8)
    color = rng.uniform(0, 255, 3)  # sprite color is nuisance
    if appearance_signal > 0:  # optional appearance hint
        hue = 255.0 * (label + 1) / (num_classes + 1)
        color = (1 - appearance_signal) * color + appearance_signal * np.array(
            [hue, 255 - hue, (hue * 2) % 255])
    c, s_ = np.cos(theta), np.sin(theta)
    amp = (size - sq - 2) / 2.0
    for t in range(num_frames):
        u = motion_signal * amp * np.sin(
            2 * np.pi * freq * speed * t / num_frames + phase)
        x = int(np.clip(size / 2 + c * u - sq / 2, 0, size - sq))
        y = int(np.clip(size / 2 + s_ * u - sq / 2, 0, size - sq))
        img[t, y:y + sq, x:x + sq] = color
    # per-clip photometric nuisance + pixel noise
    gain = rng.uniform(1 - 0.3 * nuisance, 1 + 0.3 * nuisance)
    img = img * gain + rng.normal(0, 6 + 14 * nuisance, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_hard_synthetic_dataset(
    root: str,
    num_classes: int = 24,
    videos_per_class: int = 48,
    num_frames: int = 16,
    image_size: int = 112,
    seed: int = 0,
    val_fraction: float = 0.2,
    appearance_signal: float = 0.0,
    motion_signal: float = 1.0,
    nuisance: float = 1.0,
) -> dict[str, str]:
    """Scaled, non-trivial synthetic dataset (motion-coded classes, randomized
    appearance) for SSL-transfer evidence runs and the feature-privacy grid.
    Same on-disk format as make_synthetic_dataset. Returns split paths.

    Idempotent: generation is deterministic per argument tuple, so if the
    split files already list the expected clip count and the last clip's
    packed frames exist on disk, the (expensive, minutes at 8x scale)
    regeneration is skipped and the existing paths are returned."""
    split_dir = os.path.join(root, "splits")
    train_path = os.path.join(split_dir, "train.txt")
    val_path = os.path.join(split_dir, "val.txt")
    last_clip = os.path.join(root, f"class{num_classes - 1:02d}",
                             f"vid{videos_per_class - 1:03d}",
                             f"packed_{image_size}.npy")
    if os.path.exists(train_path) and os.path.exists(val_path) \
            and os.path.exists(last_clip):
        n = sum(1 for _ in open(train_path)) + sum(1 for _ in open(val_path))
        if n == num_classes * videos_per_class:
            return {"train": train_path, "val": val_path, "root": root}
    rng = np.random.default_rng(seed)
    items: list[tuple[str, int]] = []
    for label in range(num_classes):
        for v in range(videos_per_class):
            frame_dir = os.path.join(root, f"class{label:02d}", f"vid{v:03d}")
            os.makedirs(frame_dir, exist_ok=True)
            frames = _synth_hard_video(rng, label, num_frames, image_size,
                                       num_classes, appearance_signal,
                                       motion_signal, nuisance)
            np.save(os.path.join(frame_dir, f"packed_{image_size}.npy"), frames)
            items.append((frame_dir, label))
    n_val = max(1, int(videos_per_class * val_fraction))
    train = [(p, y) for (p, y) in items
             if int(p.rsplit("vid", 1)[1]) < videos_per_class - n_val]
    val = [(p, y) for (p, y) in items
           if int(p.rsplit("vid", 1)[1]) >= videos_per_class - n_val]
    split_dir = os.path.join(root, "splits")
    os.makedirs(split_dir, exist_ok=True)
    train_path = os.path.join(split_dir, "train.txt")
    val_path = os.path.join(split_dir, "val.txt")
    write_split(train, train_path)
    write_split(val, val_path)
    return {"train": train_path, "val": val_path, "root": root}


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
