"""Jit-wrapping helpers for tests.

flax ``init``/``apply`` run op-by-op when not jitted; on this 1-core CPU test
host, eager dispatch is far slower than a jitted call AND it defeats the
persistent compilation cache. All tests therefore go through these wrappers.
"""
from __future__ import annotations

import jax


def jinit(model, key, *args, **kwargs):
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(key)


def japply(model, variables, *args, **kwargs):
    return jax.jit(lambda v: model.apply(v, *args, **kwargs))(variables)
