"""System-level privacy bridge: launch the federated evaluation from the
privacy pipeline (ref: src/privacy/system_federated.py:4-10).

The reference shells out to run_federated.py; here the in-process call is
the default (no subprocess tax), with a subprocess variant for isolation.
"""
from __future__ import annotations

import subprocess
import sys


def run_federated_from_privacy(cfg: dict, log=print) -> dict:
    """In-process: reuse the federated entry's run()."""
    from ..entry.run_federated import run
    return run(cfg, log=log)


def run_federated_subprocess(config_path: str = "configs/federated.yaml",
                             base: str = "configs/base.yaml") -> int:
    return subprocess.call([
        sys.executable, "-m", "ssl_vit_video_analytics_tpu.entry.run_federated",
        "--config", config_path, "--base", base,
    ])
