"""Expert parallelism for the opt-in MoE decoder MLP.

Beyond-reference extension (the reference has no MoE and no parallelism at
all, SURVEY §2): models/layers.py ``MoeMlp`` can replace a decoder block's
dense MLP with ``num_experts`` top-1-routed experts (GShard-style one-hot
dispatch/combine einsums — XLA-friendly static shapes, MXU-shaped matmuls).
This module supplies the EP axis: expert weights AND expert FLOPs shard over
a mesh's ``expert`` axis, so a decoder whose expert bank is too big for one
chip's HBM scales linearly over devices.

Split of labor:
  - MoeMlp (models/layers.py) computes routing + the [N, E, C] dispatch /
    combine tensors and calls :func:`expert_parallel_apply` for the expert
    matmuls. Routing math is tiny (an [N, E] softmax) and stays replicated.
  - expert_parallel_apply runs each expert's MLP where its weights live:
    ``shard_map`` over the expert axis, each device vmapping over its
    ``E / n_devices`` experts on its ``[E/n, C, D]`` slice of the dispatched
    tokens. Without a mesh it degrades to a plain vmap (single-device /
    CPU tests). The dispatch einsum's output is sharded P(axis) on the
    expert dim, so under jit GSPMD feeds each device only its slice — the
    cross-device traffic is the dispatched token slices (the all-to-all of
    classic EP), not the full activations.

Like ops/attention.set_sp_mesh, the active EP mesh is process-global
(set_ep_mesh) so flax modules don't carry mesh objects in their hashable
config.
"""
from __future__ import annotations

import functools

import jax

_EP_MESH = None
_EP_AXIS = "expert"


def set_ep_mesh(mesh, axis: str = "expert") -> None:
    """Install (or clear, with mesh=None) the process-global EP mesh."""
    global _EP_MESH, _EP_AXIS
    _EP_MESH, _EP_AXIS = mesh, axis


def get_ep_mesh():
    return _EP_MESH, _EP_AXIS


def expert_parallel_apply(mlp_fn, stacked_params, expert_in,
                          mesh=None, axis=None):
    """Apply per-expert ``mlp_fn`` to per-expert token slices.

    Args:
      mlp_fn: ``(one_expert_params, [C, D]) -> [C, D_out]``.
      stacked_params: pytree with leading axis E (the expert bank).
      expert_in: ``[E, C, D]`` dispatched tokens.
      mesh/axis: overrides the process-global EP mesh (None = use global).

    Returns ``[E, C, D_out]``. With a mesh, E must divide by the axis size
    and both params and tokens are sharded over it; otherwise a plain vmap.

    The mesh may carry MORE axes than the expert one (dp x ep): the expert
    bank shards over ``axis`` only, while the token dim (C) additionally
    shards over every other mesh axis — ``mlp_fn`` is pointwise per token,
    so each (expert-shard, token-shard) device computes its [E/n_e, C/n_d]
    tile independently; the surrounding dispatch/combine einsums stay under
    GSPMD, which keeps their batch dims on the data axis. Falls back to the
    expert-only layout if C does not divide by the other axes' product.
    """
    if mesh is None:
        mesh, axis = _EP_MESH, _EP_AXIS
    E = expert_in.shape[0]
    if mesh is None or E % mesh.shape[axis] != 0:
        return jax.vmap(mlp_fn)(stacked_params, expert_in)

    from jax.sharding import PartitionSpec as P

    others = tuple(a for a in mesh.axis_names if a != axis)
    n_other = 1
    for a in others:
        n_other *= mesh.shape[a]
    tok_spec = others if (others and expert_in.shape[1] % n_other == 0) else ()
    x_spec = P(axis, *tok_spec) if tok_spec else P(axis)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked_params), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def run(p_local, x_local):  # leaves [E/n_e, C(/n_d), ...]
        return jax.vmap(mlp_fn)(p_local, x_local)

    return run(stacked_params, expert_in)


def shard_state_ep(state, mesh, axis: str = "expert"):
    """Shard a whole TrainState's MoE expert banks over the expert axis.

    The point of EP is that the expert bank (and its Adam moments — 3x the
    bank again) does NOT replicate: every ``MoeMlp`` leaf (w1/b1/w2/b2,
    leading axis E) is placed P(axis) on dim 0; everything else replicates.
    Like tp.shard_state_tp, this works on any pytree whose leaf paths end in
    the param path (optax moment subtrees mirror the params tree). Under jit,
    GSPMD keeps the bank sharded through the shard_map expert apply — without
    this, device_put(state, P()) re-replicates the bank on every device and
    the advertised "bank too big for one chip" scaling never materializes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    moe_names = {"w1", "b1", "w2", "b2"}

    def place(path, leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        is_bank = (keys and keys[-1] in moe_names
                   and any("MoeMlp" in k for k in keys)
                   and leaf.ndim >= 1 and leaf.shape[0] % n == 0)
        spec = P(axis) if is_bank else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def count_bank_sharded(params, mesh, axis: str = "expert") -> tuple[int, int]:
    """(n_bank_leaves_sharded, n_total_leaves) — for entry logging."""
    n = mesh.shape[axis]
    moe_names = {"w1", "b1", "w2", "b2"}
    n_sh = n_tot = 0

    def visit(path, leaf):
        nonlocal n_sh, n_tot
        n_tot += 1
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        n_sh += bool(keys and keys[-1] in moe_names
                     and any("MoeMlp" in k for k in keys)
                     and hasattr(leaf, "shape") and leaf.ndim >= 1
                     and leaf.shape[0] % n == 0)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return n_sh, n_tot
