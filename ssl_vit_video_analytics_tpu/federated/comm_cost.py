"""Communication accounting: identical formulas to the reference so
fed_summary.csv stays comparable (ref: src/federated/comm_cost.py:4-26)."""
from __future__ import annotations

import jax
import numpy as np


def model_size_bytes(params) -> int:
    """Total bytes of all array leaves in a PyTree."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += int(leaf.size) * int(np.dtype(leaf.dtype).itemsize)
    return int(total)


def bytes_to_mb(x: int | float) -> float:
    return float(x) / (1024.0 * 1024.0)


def estimate_comm_mb_per_round(params, num_clients_participating: int) -> tuple[float, float]:
    """FedAvg per-round traffic: broadcast + upload = 2 * N * model_size.

    Returns (total_mb, model_mb).
    """
    size_b = model_size_bytes(params)
    total_b = int(2 * int(num_clients_participating) * size_b)
    return bytes_to_mb(total_b), bytes_to_mb(size_b)


def estimate_raw_upload_mb(num_samples: int, clip_len: int, image_size: int,
                           channels: int = 3, bytes_per_value: int = 1) -> float:
    """Centralized counterfactual: uploading raw uint8 clips
    (ref: src/run_federated.py:183-206)."""
    total = num_samples * channels * clip_len * image_size * image_size * bytes_per_value
    return bytes_to_mb(total)
