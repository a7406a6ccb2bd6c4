"""Segmented execution (training.max_epochs_per_run) must equal an
uninterrupted run bit-for-bit — it is just exact resume with a clean
in-process exit + checkpoint at the segment boundary.

Why it exists: the axon tunnel client leaks host RSS per transferred byte
unconditionally (scripts/probe_ingest_rss.py), so >HBM runs under the
tunnel are chained as fresh processes (experiments/run_segmented.sh).
"""
import jax
import numpy as np

from ssl_vit_video_analytics_tpu.entry import train_mae
from ssl_vit_video_analytics_tpu.utils.checkpoint import restore_checkpoint

from test_resume import _cfg, _leaves_equal


def test_segmented_equals_uninterrupted(synth_data, tmp_path):
    cfg_a = _cfg(synth_data, tmp_path / "a", tmp_path)
    train_mae.run(cfg_a, log=lambda *_: None, resume=False)

    # Segmented: 1 epoch per "process" (fresh run() call), chained by resume.
    cfg_b = _cfg(synth_data, tmp_path / "b", tmp_path)
    cfg_b["training"]["max_epochs_per_run"] = 1
    # save_every would NOT save at epoch 1 on its own — the segment cap must.
    cfg_b["training"]["save_every"] = 2
    out1 = train_mae.run(cfg_b, log=lambda *_: None, resume=False)
    assert out1["completed"] is False and out1["stopped_at_epoch"] == 1
    out2 = train_mae.run(cfg_b, log=lambda *_: None, resume=True)
    assert out2["completed"] is True

    a = restore_checkpoint(str(tmp_path / "a" / "ckpt_epoch_2"))
    b = restore_checkpoint(str(tmp_path / "b" / "ckpt_epoch_2"))
    assert a["step"] == b["step"]
    assert _leaves_equal(a["params"], b["params"])
    assert _leaves_equal(a["opt_state"], b["opt_state"])
