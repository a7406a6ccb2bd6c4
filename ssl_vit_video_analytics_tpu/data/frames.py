"""Frame stores: random access to video frames as uint8 RGB arrays.

Two backends:

- ``JpegFolderStore`` — the reference's layout: one directory of ``*.jpg``
  per video, read with cv2 + BGR->RGB + bilinear resize
  (ref: src/datasets/loader.py:79-99, src/datasets/transforms.py:9-15).
- ``PackedFolderStore`` — TPU-first fast path: each video directory also holds
  a ``packed_{S}.npy`` uint8 array [N, S, S, 3] written once by
  ``preprocess/pack_frames.py``. Random frame access is then a memmap gather
  with zero JPEG decode — essential because the bench host has a single CPU
  core and the model consumes >5k clips/s. Decoding happens once, offline,
  exactly like the reference's one-time frame extraction
  (ref: preprocess/extract_frames.py:32 resizes at extraction time).

Both return channel-last uint8; normalization to ImageNet-standardized float
happens on device inside the jitted step (see ``normalize_clip``).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@lru_cache(maxsize=100_000)
def _list_jpgs(frame_dir: str) -> tuple[str, ...]:
    try:
        names = sorted(n for n in os.listdir(frame_dir) if n.endswith(".jpg"))
    except FileNotFoundError:
        return ()
    return tuple(os.path.join(frame_dir, n) for n in names)


class JpegFolderStore:
    """Frame-folder JPEGs, decoded on demand."""

    def num_frames(self, frame_dir: str) -> int:
        return len(_list_jpgs(frame_dir))

    def read_frames(self, frame_dir: str, indices, image_size: int) -> np.ndarray:
        paths = _list_jpgs(frame_dir)
        out = np.zeros((len(indices), image_size, image_size, 3), dtype=np.uint8)
        for i, idx in enumerate(indices):
            img = cv2.imread(paths[idx])
            if img is None:
                raise RuntimeError(f"[ERROR] Failed to read image {paths[idx]}")
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if img.shape[0] != image_size or img.shape[1] != image_size:
                img = cv2.resize(img, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
            out[i] = img
        return out


class PackedFolderStore:
    """Memmapped ``packed_{S}.npy`` per video; falls back to JPEGs if absent."""

    def __init__(self, image_size: int):
        self.image_size = image_size
        self._fallback = JpegFolderStore()
        self._maps: dict[str, np.ndarray] = {}

    def _packed_path(self, frame_dir: str) -> str:
        return os.path.join(frame_dir, f"packed_{self.image_size}.npy")

    def _get_map(self, frame_dir: str) -> np.ndarray | None:
        arr = self._maps.get(frame_dir)
        if arr is None:
            path = self._packed_path(frame_dir)
            if not os.path.exists(path):
                return None
            arr = np.load(path, mmap_mode="r")
            self._maps[frame_dir] = arr
        return arr

    def num_frames(self, frame_dir: str) -> int:
        arr = self._get_map(frame_dir)
        if arr is not None:
            return arr.shape[0]
        return self._fallback.num_frames(frame_dir)

    def read_frames(self, frame_dir: str, indices, image_size: int) -> np.ndarray:
        arr = self._get_map(frame_dir)
        if arr is None:
            return self._fallback.read_frames(frame_dir, indices, image_size)
        return np.asarray(arr[np.asarray(indices)])


def pack_frame_dir(frame_dir: str, image_size: int, overwrite: bool = False) -> str | None:
    """Decode a JPEG frame folder once into packed_{S}.npy. Returns the path."""
    out_path = os.path.join(frame_dir, f"packed_{image_size}.npy")
    if os.path.exists(out_path) and not overwrite:
        return out_path
    store = JpegFolderStore()
    n = store.num_frames(frame_dir)
    if n == 0:
        return None
    frames = store.read_frames(frame_dir, list(range(n)), image_size)
    np.save(out_path, frames)
    return out_path


class VideoFileStore:
    """Direct-from-video frames via cv2.VideoCapture seek.

    The reference's orphaned LazyVideoDataset variant
    (ref: src/datasets/lazy_video_dataset.py:11-80): CAP_PROP_POS_FRAMES
    seeking with last-frame padding on read failure. Slow (decode on every
    access) — the packed store supersedes it; kept for datasets that were
    never frame-extracted.
    """

    def __init__(self):
        self._lengths: dict[str, int] = {}

    def num_frames(self, video_path: str) -> int:
        n = self._lengths.get(video_path)
        if n is None:
            cap = cv2.VideoCapture(video_path)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            cap.release()
            self._lengths[video_path] = n
        return n

    def read_frames(self, video_path: str, indices, image_size: int) -> np.ndarray:
        cap = cv2.VideoCapture(video_path)
        out = np.zeros((len(indices), image_size, image_size, 3), dtype=np.uint8)
        last = None
        try:
            for i, idx in enumerate(indices):
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
                ok, frame = cap.read()
                if not ok or frame is None:
                    if last is not None:
                        out[i] = last  # last-frame padding
                    continue
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if frame.shape[:2] != (image_size, image_size):
                    frame = cv2.resize(frame, (image_size, image_size),
                                       interpolation=cv2.INTER_LINEAR)
                out[i] = frame
                last = out[i]
        finally:
            cap.release()
        return out


def make_store(backend: str, image_size: int):
    if backend in ("packed", "frame_packed"):
        return PackedFolderStore(image_size)
    if backend in ("frames", "frame_lazy", "jpeg"):
        return JpegFolderStore()
    if backend in ("video", "video_lazy"):
        return VideoFileStore()
    raise ValueError(f"Unknown frame store backend: {backend}")
