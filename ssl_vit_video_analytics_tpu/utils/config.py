"""YAML config system: base + task overlay, dotted CLI overrides, provenance hash.

Mirrors the reference's config behavior (ref: src/utils.py:10-18 load_config;
src/mae/utils.py:41-58 yaml load + json dump + sha256[:12] hash; manual
base+task merging at call sites e.g. src/train_finetune.py:220-221) but as one
coherent module: configs are plain nested dicts, merged recursively, with
overrides applied as ``key.path=value`` strings so ablations never need to
rewrite YAML files on disk (the reference's src/ablations.py:30-36 mutates the
config files in place and restores them in a ``finally``).
"""
from __future__ import annotations

import copy
import hashlib
import json
import os
from typing import Any, Mapping, Sequence

import yaml


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        out = yaml.safe_load(f)
    return out or {}


def deep_update(base: dict, patch: Mapping) -> dict:
    """Recursively merge ``patch`` into ``base`` (in place) and return it."""
    for k, v in patch.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v
    return base


def merge_configs(*cfgs: Mapping) -> dict:
    """Left-to-right recursive merge; later configs win."""
    out: dict = {}
    for c in cfgs:
        deep_update(out, c)
    return out


def _parse_value(text: str) -> Any:
    """Parse an override value: YAML scalar rules, plus bare scientific
    notation ('1e-3'), which YAML 1.1 treats as a string."""
    try:
        out = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(out, str):
        try:
            return float(out)
        except ValueError:
            return out
    return out


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` strings onto a nested dict config."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must be key.path=value, got: {item!r}")
        key_path, _, raw = item.partition("=")
        node = cfg
        keys = key_path.strip().split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot descend into non-dict at {k!r} in {key_path!r}")
        node[keys[-1]] = _parse_value(raw)
    return cfg


def load_config(
    path: str,
    base: str | None = None,
    overrides: Sequence[str] = (),
) -> dict:
    """Load a task YAML, optionally merged on top of a base YAML, plus overrides.

    Matches the reference's pattern of configs/base.yaml (shared sampling/seed/
    paths) + one task YAML, with the task file winning on conflicts.
    """
    cfgs = []
    if base is not None and os.path.exists(base):
        cfgs.append(load_yaml(base))
    cfgs.append(load_yaml(path))
    cfg = merge_configs(*cfgs)
    apply_overrides(cfg, overrides)
    return cfg


def config_hash(cfg: Mapping) -> str:
    """sha256[:12] of the canonical JSON dump (ref: src/mae/utils.py:51-58)."""
    blob = json.dumps(cfg, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:12]


def save_config(cfg: Mapping, path: str) -> str:
    """Dump resolved config (JSON) next to run outputs; returns its hash."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True, default=str)
    return config_hash(cfg)
