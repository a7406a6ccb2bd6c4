"""Randomness policy.

Host-side randomness that must match the reference bit-for-bit (split files,
federated client shards, per-sample frame offsets) uses Python's
``random.Random`` with the reference's seeding scheme (ref:
src/datasets/loader.py:65-76 Random(seed+index); src/federated/fed_loop.py:86
Random(42)). Device-side randomness (masking, noise, dropout, init) uses JAX
PRNG keys threaded explicitly — no global device RNG state.
"""
from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key (ref: src/utils.py:21-26)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def key_seq(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite deterministic stream of subkeys from a root key."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def sample_rng(seed: int, index: int) -> random.Random:
    """Deterministic per-sample RNG: Random(seed + index).

    Exactly the reference's dataset sampling semantics so that val-set clip
    choices are reproducible across frameworks (ref: src/datasets/loader.py:65-76).
    """
    return random.Random(seed + index)
