"""End-to-end dataset tooling: synthetic .avi videos -> extract_frames
(-> jpegs + packed arrays) -> generate_splits_lazy -> verify_dataset ->
loadable by ClipDataset. Covers the L7 preprocess layer (SURVEY §2.8) the
same way a user would drive it: via the CLIs' main() with patched argv."""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    for cls in ("walk", "jump"):
        d = root / cls
        d.mkdir()
        for v in range(4):
            path = str(d / f"v{v}.avi")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                10.0, (64, 64))
            assert w.isOpened()
            for t in range(24):
                frame = np.full((64, 64, 3), (10 * t) % 255, np.uint8)
                frame[:, : 8 * (v + 1)] = rng.integers(0, 255, 3, dtype=np.uint8)
                w.write(frame)
            w.release()
    return root


def _run_cli(script, argv):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + argv,
        capture_output=True, text=True, cwd=REPO)


def test_full_preprocess_pipeline(video_tree, tmp_path):
    frames = tmp_path / "frames"
    # 1. videos -> resized frame folders + packed arrays
    r = _run_cli("preprocess/extract_frames.py",
                 ["--video_root", str(video_tree), "--out_root", str(frames),
                  "--size", "32", "--pack"])
    assert r.returncode == 0, r.stderr
    dirs = sorted(str(p) for p in frames.rglob("packed_32.npy"))
    assert len(dirs) == 8
    arr = np.load(dirs[0], mmap_mode="r")
    assert arr.shape == (24, 32, 32, 3) and arr.dtype == np.uint8

    # 2. frame tree -> train/val/test split files
    splits = tmp_path / "splits"
    r = _run_cli("preprocess/generate_splits_lazy.py",
                 ["--frame_root", str(frames), "--out_dir", str(splits),
                  "--prefix", "SYN", "--ratios", "0.5", "0.25", "0.25"])
    assert r.returncode == 0, r.stderr
    train = splits / "SYN_train.txt"
    assert train.exists()
    lines = [l.split() for l in open(train).read().splitlines() if l]
    split_files = [splits / f"SYN_{n}.txt" for n in ("train", "val", "test")]
    all_lines = []
    for f in split_files:
        all_lines += [l for l in open(f).read().splitlines() if l]
    assert len(all_lines) == 8  # every video lands in exactly one split
    assert all(len(l.split()) == 2 for l in all_lines)
    assert (splits / "SYN_classes.txt").exists()

    # 3. verify_dataset accepts the splits
    r = _run_cli("verify_dataset.py",
                 ["--splits"] + [str(f) for f in split_files]
                 + ["--min_frames", "8", "--image_size", "32"])
    assert r.returncode == 0, r.stderr

    # 4. the training loader consumes the result
    from ssl_vit_video_analytics_tpu.data.loader import ClipDataset as LazyFrameDataset
    ds = LazyFrameDataset(str(train), mode="supervised", clip_len=4, stride=2,
                          image_size=32, verbose=False)
    clip = ds.get_clip(0)
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8


def test_video_backend_reads_avi_directly(video_tree, tmp_path):
    """backend="video" (VideoFileStore, ref lazy_video_dataset.py): clips
    decode straight from the .avi files, no frame extraction step."""
    from ssl_vit_video_analytics_tpu.data.loader import ClipDataset
    from ssl_vit_video_analytics_tpu.data.splits import write_split

    vids = sorted(str(p) for p in video_tree.rglob("*.avi"))
    split = tmp_path / "video_split.txt"
    write_split([(v, i % 2) for i, v in enumerate(vids)], str(split))

    ds = ClipDataset(str(split), mode="supervised", clip_len=4, stride=2,
                     image_size=32, backend="video", verbose=False)
    clip = ds.get_clip(0)
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8
    assert clip.max() > 0  # actually decoded content, not zero padding


def test_download_dataset_offline_paths(tmp_path):
    """download_dataset.py (counterpart of ref download_dataset.ipynb) must
    be no-network-tolerant: --list works, a missing artifact without network
    fails with instructions (rc=1), --synthetic-fallback still produces a
    runnable dataset, and an already-extracted tree short-circuits."""
    r = _run_cli("preprocess/download_dataset.py", ["--list"])
    assert r.returncode == 0 and "UCF101_frames" in r.stdout

    root = str(tmp_path / "data")
    r = _run_cli("preprocess/download_dataset.py",
                 ["--dataset", "UCF101_frames", "--root", root])
    assert r.returncode == 1
    assert "Manual path" in r.stdout and "drive.google.com" in r.stdout

    r = _run_cli("preprocess/download_dataset.py",
                 ["--dataset", "UCF101_frames", "--root", root,
                  "--synthetic-fallback"])
    assert r.returncode == 0, r.stdout + r.stderr
    dest = os.path.join(root, "UCF101_frames")
    assert os.path.isdir(os.path.join(dest, "splits"))

    # extracted tree present -> nothing to do, rc=0
    r = _run_cli("preprocess/download_dataset.py",
                 ["--dataset", "UCF101_frames", "--root", root])
    assert r.returncode == 0 and "already extracted" in r.stdout
