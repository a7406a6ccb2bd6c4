from .config import load_config, merge_configs, deep_update, config_hash, save_config
from .io import ensure_dir, write_csv, read_csv_dicts, Logger
from .prng import set_seed, key_seq
from .metrics import topk_accuracy, prediction_entropy, update_best, format_metrics, minmax_norm

__all__ = [
    "load_config", "merge_configs", "deep_update", "config_hash", "save_config",
    "ensure_dir", "write_csv", "read_csv_dicts", "Logger",
    "set_seed", "key_seq",
    "topk_accuracy", "prediction_entropy", "update_best", "format_metrics", "minmax_norm",
]
