"""Data layer tests: sampling parity, splits, masking invariants."""
import random

import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.data import (
    ClipDataset, iterate_batches, sample_frame_indices,
    make_class_shard_splits, read_split, write_split,
    make_token_mask, get_tube_mask, frame_mask, get_mask_ratio,
)


def test_sample_frame_indices_reference_parity():
    """Must equal the reference's Random(seed+index) semantics
    (ref: src/datasets/loader.py:65-76)."""
    for num_frames, index, clip_len, stride, seed in [
        (100, 3, 16, 2, 42), (10, 0, 16, 2, 42), (33, 7, 8, 4, 1)
    ]:
        rng = random.Random(seed + index)
        max_start = max(0, num_frames - clip_len * stride)
        start = rng.randint(0, max_start) if max_start > 0 else 0
        expected = [min(start + i * stride, num_frames - 1) for i in range(clip_len)]
        got = sample_frame_indices(num_frames, index, clip_len, stride, seed)
        assert got == expected


def test_clip_dataset_shapes_and_determinism(synth_data):
    ds = ClipDataset(synth_data["train"], mode="supervised", clip_len=8, stride=2,
                     image_size=32, seed=42, verbose=False)
    clip1 = ds.get_clip(0)
    clip2 = ds.get_clip(0)
    assert clip1.shape == (8, 32, 32, 3) and clip1.dtype == np.uint8
    np.testing.assert_array_equal(clip1, clip2)

    batches = list(iterate_batches(ds, batch_size=4, shuffle=True, seed=0, epoch=1))
    assert batches[0]["clip"].shape == (4, 8, 32, 32, 3)
    assert batches[0]["label"].shape == (4,)

    # padded tail with drop_last=False
    all_b = list(iterate_batches(ds, batch_size=5, shuffle=False, drop_last=False))
    assert all_b[-1]["valid"].sum() == len(ds) % 5 or all_b[-1]["valid"].all()


def test_hard_fixture_idempotent(tmp_path):
    """make_hard_synthetic_dataset skips regeneration when the fixture is
    already complete on disk (generation is deterministic per argument
    tuple; at 8x campaign scale a redundant rebuild costs minutes)."""
    import os

    from ssl_vit_video_analytics_tpu.data.fixtures import \
        make_hard_synthetic_dataset

    kw = dict(num_classes=2, videos_per_class=3, num_frames=4, image_size=16)
    root = str(tmp_path / "hard")
    s1 = make_hard_synthetic_dataset(root, **kw)
    probe = os.path.join(root, "class01", "vid002", "packed_16.npy")
    mtime = os.path.getmtime(probe)
    s2 = make_hard_synthetic_dataset(root, **kw)
    assert s1 == s2
    assert os.path.getmtime(probe) == mtime  # untouched => skipped
    # a changed geometry is NOT served from the stale cache
    s3 = make_hard_synthetic_dataset(root, num_classes=2, videos_per_class=4,
                                     num_frames=4, image_size=16)
    assert sum(1 for _ in open(s3["train"])) + sum(1 for _ in open(s3["val"])) == 8


def test_class_shard_splits(tmp_path, synth_data):
    paths, stats = make_class_shard_splits(
        synth_data["train"], num_clients=2, shards_per_client=2, seed=42,
        min_samples_per_client=1, out_dir=str(tmp_path))
    assert len(paths) == 2
    total = sum(s["num_samples"] for s in stats)
    assert total == len(read_split(synth_data["train"]))
    # non-IID: each client sees a subset of classes
    for s in stats:
        assert s["num_classes"] <= 4


def test_token_masks():
    key = jax.random.key(0)
    B, T, P = 4, 6, 16
    m = make_token_mask(key, B, T, P, 0.75, "random")
    assert m.shape == (B, T * P)
    assert (m.sum(axis=1) == round(T * P * 0.75)).all()

    mt = make_token_mask(key, B, T, P, 0.5, "tube")
    assert mt.shape == (B, T * P)
    # tube: same spatial pattern every frame
    mt3 = np.asarray(mt).reshape(B, T, P)
    for t in range(1, T):
        np.testing.assert_array_equal(mt3[:, t], mt3[:, 0])

    tube = get_tube_mask(key, B, T, P, 0.9)
    assert tube.shape == (B, T, P)
    assert (np.asarray(tube).sum(axis=2) == int(0.9 * P)).all()

    fm = frame_mask(key, B, T, 0.75)
    assert fm.shape == (B, T)


def test_mask_ratio_schedule():
    sched = [{"start": 1, "end": 21, "value": 0.7},
             {"start": 21, "end": 81, "value": 0.8},
             {"start": 81, "end": 100000, "value": 0.9}]
    assert get_mask_ratio(1, sched, 0.5) == 0.7
    assert get_mask_ratio(20, sched, 0.5) == 0.7
    assert get_mask_ratio(21, sched, 0.5) == 0.8
    assert get_mask_ratio(99, sched, 0.5) == 0.9
    assert get_mask_ratio(5, None, 0.5) == 0.5
