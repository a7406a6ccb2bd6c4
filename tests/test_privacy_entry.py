"""run_privacy and run_dynamic entry smoke tests on the synthetic fixture."""
import os

import numpy as np

from ssl_vit_video_analytics_tpu.entry import run_privacy, run_dynamic
from ssl_vit_video_analytics_tpu.utils.io import read_csv_dicts

try:
    import cv2
except ImportError:
    cv2 = None


def _face_frames(tmp_path):
    d = tmp_path / "faces" / "vid0"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"f_{i:03d}.jpg"), img)
    return str(tmp_path / "faces")


def _cfg(synth_data, tmp_path):
    return {
        "seed": 42,
        "device": {"compute_dtype": "float32"},
        "dataset": {"backend": "packed", "split": synth_data["val"],
                    "num_classes": 4, "clip_len": 4, "stride": 2, "image_size": 32},
        "model": {"embed_dim": 32, "finetune_ckpt": None},
        "runtime": {"batch_size": 4, "num_warmup": 0, "num_measure": 1},
        "paths": {"log_dir": str(tmp_path / "logs"), "split_root": ""},
        "output": {"save_dir": str(tmp_path / "out"), "save_csv": True},
    }


def test_run_privacy_entry(synth_data, tmp_path):
    if cv2 is None:
        import pytest
        pytest.skip("cv2 required")
    cfg = _cfg(synth_data, tmp_path)
    cfg["visual_privacy"] = {
        "enabled": True, "frame_root": _face_frames(tmp_path), "max_images": 4,
        "save_examples": 1, "yunet_model": None, "blur_kernel": 7,
    }
    cfg["feature_privacy"] = {
        "enabled": True, "noise_sigmas": [0.0, 0.1], "mask_ratios": [0.0],
        "attacker_epochs": 3, "attacker_lr": 1e-3,
    }
    out = run_privacy.run(cfg, log=lambda *_: None)
    vrows = read_csv_dicts(out["visual_csv"])
    assert list(vrows[0].keys()) == list(run_privacy.VISUAL_FIELDS)
    frows = read_csv_dicts(out["feature_csv"])
    assert list(frows[0].keys()) == list(run_privacy.FEATURE_FIELDS)
    assert len(frows) == 2  # 2 sigmas x 1 mask ratio
    # clean setting must have PER ~1 vs itself only when attacker==clean; just
    # check values are parseable floats in [0, +inf)
    assert all(float(r["attacker_top1"]) >= 0 for r in frows)


def test_run_dynamic_entry_early_exit(synth_data, tmp_path):
    cfg = _cfg(synth_data, tmp_path)
    cfg["dynamic"] = {
        "mode": "early_exit", "confidence_thresholds": [0.3],
        "min_frames": 2, "max_frames": 4, "frame_step": 1,
        "gating_topk_list": [2], "gating_score": "motion",
    }
    out = run_dynamic.run(cfg, mode="early_exit", log=lambda *_: None)
    rows = read_csv_dicts(out["csv"])
    assert list(rows[0].keys()) == list(run_dynamic.EARLY_EXIT_FIELDS)
    assert 2.0 <= float(rows[0]["avg_frames"]) <= 4.0


import pytest


@pytest.mark.skipif(not __import__("os").path.exists("assets/yunet.onnx"),
                    reason="YuNet weights not vendored")
def test_yunet_real_detector_blur_suppresses_detection(tmp_path):
    """Real YuNet path (weights-gated): the synthetic face is detected
    before anonymization and suppressed after the ROI blur."""
    import numpy as np

    from ssl_vit_video_analytics_tpu.data.fixtures import _synth_face
    from ssl_vit_video_analytics_tpu.privacy.visual import (
        VisualAnonymizer, YuNetFaceDetector, make_detector)

    det = make_detector("assets/yunet.onnx")
    assert isinstance(det, YuNetFaceDetector)

    rng = np.random.default_rng(0)
    hits = 0
    suppressed = 0
    n = 4
    for _ in range(n):
        img = _synth_face(rng, 224)
        before = det.detect(img)
        if len(before) == 0:
            continue
        hits += 1
        anon, n_faces = VisualAnonymizer(det, blur_kernel=41).apply(img)
        assert n_faces == len(before)
        if len(det.detect(anon)) == 0:
            suppressed += 1
    assert hits >= n // 2, f"YuNet detected only {hits}/{n} synthetic faces"
    assert suppressed >= hits // 2, "blur failed to suppress re-detection"


def test_feature_privacy_attacker_repeats(synth_data, tmp_path):
    """attacker_repeats=2: main CSV keeps the reference-literal header with
    per-cell means; a per-repeat side CSV appears with 2 rows per cell."""
    cfg = _cfg(synth_data, tmp_path)
    cfg["visual_privacy"] = {"enabled": False}
    cfg["feature_privacy"] = {
        "enabled": True, "noise_sigmas": [0.0, 0.5], "mask_ratios": [0.0],
        "attacker_epochs": 2, "attacker_lr": 1e-3, "attacker_repeats": 2,
    }
    out = run_privacy.run(cfg, log=lambda *_: None)
    frows = read_csv_dicts(out["feature_csv"])
    assert list(frows[0].keys()) == list(run_privacy.FEATURE_FIELDS)
    assert len(frows) == 2
    rep_csv = os.path.join(os.path.dirname(out["feature_csv"]),
                           "feature_privacy_repeats.csv")
    rrows = read_csv_dicts(rep_csv)
    assert len(rrows) == 4  # 2 cells x 2 repeats
    assert {r["repeat"] for r in rrows} == {"0", "1"}
    # the cell mean in the main CSV is the mean of its repeats
    cell0 = [float(r["attacker_top1"]) for r in rrows if r["sigma"] == "0.0"]
    assert abs(float(frows[0]["attacker_top1"]) - np.mean(cell0)) < 1e-4
