"""Ops + utils: patchify roundtrip, normalize, blur, config, losses, metrics,
checkpoint helpers."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.ops.patchify import (
    patchify, unpatchify, normalize_pix_target, masked_mse)
from ssl_vit_video_analytics_tpu.ops.preprocess import (
    normalize_clip, denormalize_clip, gaussian_blur_nhwc)
from ssl_vit_video_analytics_tpu.train.losses import (
    mae_loss_l2, mae_loss_l1, mae_loss_cosine, build_mae_loss,
    reconstruction_error_stats, cosine_loss, variance_loss)
from ssl_vit_video_analytics_tpu.utils.config import (
    load_config, deep_update, apply_overrides, config_hash)
from ssl_vit_video_analytics_tpu.utils.metrics import (
    topk_accuracy, prediction_entropy, minmax_norm, update_best)
from ssl_vit_video_analytics_tpu.utils.checkpoint import (
    save_checkpoint, restore_checkpoint, keep_last_n_checkpoints,
    find_latest_checkpoint, best_ckpt_name)


def test_patchify_roundtrip():
    clip = jnp.arange(2 * 3 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 3, 16, 16, 3)
    tokens = patchify(clip, 8)
    assert tokens.shape == (2, 3 * 4, 8 * 8 * 3)
    back = unpatchify(tokens, 8, 3, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(clip))


def test_normalize_roundtrip():
    u8 = np.random.default_rng(0).integers(0, 255, (2, 4, 4, 3), np.uint8)
    x = normalize_clip(jnp.asarray(u8))
    back = denormalize_clip(x)
    np.testing.assert_allclose(np.asarray(back), u8.astype(np.float32), atol=1e-3)


def test_gaussian_blur_preserves_mean():
    img = jnp.asarray(np.random.default_rng(0).normal(10, 2, (1, 16, 16, 3)).astype(np.float32))
    out = gaussian_blur_nhwc(img, 5)
    assert out.shape == img.shape
    # interior mean preserved, variance reduced
    assert abs(float(out[:, 4:12, 4:12].mean()) - float(img[:, 4:12, 4:12].mean())) < 0.3
    assert float(out[:, 4:12, 4:12].std()) < float(img[:, 4:12, 4:12].std())


def test_masked_losses_match_gathered():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 6)) < 0.5)
    # weighted-mean value == mean over gathered masked tokens
    m = np.asarray(mask)
    gathered = float(np.mean(np.mean(
        (np.asarray(pred)[m] - np.asarray(tgt)[m]) ** 2, axis=-1)))
    got = float(mae_loss_l2(pred, tgt, mask, normalize_target=False))
    assert abs(got - gathered) < 1e-6
    for fn in (mae_loss_l1, mae_loss_cosine):
        assert np.isfinite(float(fn(pred, tgt, mask)))
    stats = reconstruction_error_stats(pred, tgt, mask)
    assert set(stats) == {"mae_l1", "mae_l2", "pred_std", "target_std"}


def test_pipelineA_losses():
    z = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))
    assert float(cosine_loss(z, z)) < 1e-5         # identical -> 0
    assert abs(float(cosine_loss(z, -z)) - 4.0) < 1e-5
    big = z * 100
    assert float(variance_loss(big)) < 1e-4         # high variance -> no hinge
    assert float(variance_loss(z * 0)) > 0.9        # collapsed -> ~target_std


def test_config_system(tmp_path):
    base = tmp_path / "base.yaml"
    task = tmp_path / "task.yaml"
    base.write_text("a: 1\nnested: {x: 1, y: 2}\n")
    task.write_text("nested: {y: 3}\nb: 2\n")
    cfg = load_config(str(task), base=str(base), overrides=["nested.z=4", "lr=1e-3"])
    assert cfg["a"] == 1 and cfg["b"] == 2
    assert cfg["nested"] == {"x": 1, "y": 3, "z": 4}
    assert cfg["lr"] == 1e-3  # YAML scalar parsing
    h1 = config_hash(cfg)
    assert len(h1) == 12 and h1 == config_hash(dict(cfg))


def test_metrics():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.9, 0.05, 0.05]])
    labels = jnp.asarray([1, 1])
    acc = topk_accuracy(logits, labels, ks=(1, 2))
    assert float(acc["top1"]) == 0.5 and float(acc["top2"]) == 1.0
    assert float(prediction_entropy(jnp.zeros((2, 4)))) > 1.38  # uniform -> ln 4
    assert minmax_norm([1.0, 3.0, 2.0]) == [0.0, 1.0, 0.5]
    best, imp = update_best(None, {"loss": 2.0}, "loss", "min")
    best, imp = update_best(best, {"loss": 1.0}, "loss", "min")
    assert imp and best["loss"] == 1.0
    best, imp = update_best(best, {"loss": 3.0}, "loss", "min")
    assert not imp and best["loss"] == 1.0


def test_checkpoint_roundtrip_and_gc(tmp_path):
    d = str(tmp_path / "ckpts")
    tree = {"params": {"w": jnp.arange(4.0)}, "step": 7}
    for ep in (1, 2, 3):
        save_checkpoint(d, f"ckpt_epoch_{ep}", tree, meta={"epoch": ep, "tag": "x"})
    assert find_latest_checkpoint(d).endswith("ckpt_epoch_3")
    deleted = keep_last_n_checkpoints(d, keep=2)
    assert len(deleted) == 1 and deleted[0].endswith("ckpt_epoch_1")
    blob = restore_checkpoint(os.path.join(d, "ckpt_epoch_3"))
    np.testing.assert_array_equal(np.asarray(blob["params"]["w"]), np.arange(4.0))
    assert blob["epoch"] == 3 and blob["tag"] == "x"
    assert best_ckpt_name("finetune", 28, "top1", 0.6715) == "finetune_epoch_28_top1_0.6715"


def test_privacy_functions():
    from ssl_vit_video_analytics_tpu.privacy import (
        add_gaussian_noise, apply_feature_mask, boxes_to_mask, StubFaceDetector)
    z = jnp.ones((4, 8))
    k = jax.random.key(0)
    assert np.allclose(np.asarray(add_gaussian_noise(k, z, 0.0)), 1.0)
    noisy = add_gaussian_noise(k, z, 0.5)
    assert not np.allclose(np.asarray(noisy), 1.0)
    masked = apply_feature_mask(k, z, 0.5)
    vals = np.unique(np.asarray(masked))
    assert set(vals).issubset({0.0, 1.0})
    m = boxes_to_mask(np.array([[2, 2, 4, 4]]), 8, 8)
    assert m.sum() == 16
    det = StubFaceDetector()
    boxes = det.detect(np.zeros((30, 30, 3), np.uint8))
    assert boxes.shape == (1, 4)


def test_yunet_real_detector_weights_gated():
    """Exercises the REAL cv2.FaceDetectorYN path with the vendored weights
    (assets/yunet.onnx, same file the reference ships). Skipped only if the
    asset or cv2 DNN support is absent."""
    import os
    import numpy as np
    import pytest
    from ssl_vit_video_analytics_tpu.privacy.visual import (
        make_detector, YuNetFaceDetector, VisualAnonymizer)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    weights = os.path.join(repo, "assets", "yunet.onnx")
    if not os.path.exists(weights):
        pytest.skip("yunet.onnx not vendored")
    det = make_detector(weights)
    if not isinstance(det, YuNetFaceDetector):
        pytest.skip("cv2.FaceDetectorYN unavailable")
    # no faces in noise: the real model must return an empty (0, 4) box array
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    boxes = det.detect(img)
    assert boxes.shape == (0, 4)
    # anonymizer with the real detector: no boxes -> frame unchanged
    anon = VisualAnonymizer(det, blur_kernel=7)
    out, n_faces = anon.apply(img)
    assert n_faces == 0
    assert out.shape == img.shape and out.dtype == img.dtype
    np.testing.assert_array_equal(out, img)


def test_warmup_cosine_schedule_tiny_total_steps():
    """total_steps <= warmup_steps (tiny smoke runs) must not crash optax
    (regression: decay_steps=0 ValueError) and must produce finite LRs."""
    import jax.numpy as jnp

    from ssl_vit_video_analytics_tpu.train.state import warmup_cosine_schedule

    for total in (1, 2, 5):
        sch = warmup_cosine_schedule(1e-3, warmup_steps=40, total_steps=total)
        vals = [float(sch(i)) for i in range(total + 2)]
        assert all(jnp.isfinite(v) for v in vals)
        assert max(vals) <= 1e-3 + 1e-9
