"""FedAvg as a real parallel program on a TPU mesh.

The reference simulates federated learning: N client models on ONE device,
trained sequentially, state dicts averaged in-process on CPU
(ref: src/run_federated.py:270-325, src/federated/fed_loop.py:65-147). Here
clients are data: per-client parameter trees are STACKED on a leading axis
that is sharded over the mesh's ``client`` axis, local training runs
simultaneously on every client's shard via shard_map, and FedAvg aggregation
is a weighted reduction over the client axis — XLA lowers it to an ICI
all-reduce.

Aggregation dtype rules match the reference exactly
(ref: src/federated/fed_loop.py:46-58): floating leaves get the
client-size-weighted mean; integer leaves (counters like BN's
num_batches_tracked) take the MAX across clients, never an average.

Client sampling keeps the reference's RNG stream — random.Random(42)
.sample(range(N), m) (ref: src/federated/fed_loop.py:86-91) — so selected
client sets are identical run-for-run.
"""
from __future__ import annotations

import random
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .comm_cost import estimate_comm_mb_per_round


def fedavg_aggregate(stacked_tree, weights: jax.Array):
    """Aggregate client trees stacked on axis 0.

    Float leaves -> weighted mean with weights normalized to sum 1;
    integer/bool leaves -> elementwise max across clients.
    """
    w = weights.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)

    def agg(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            wshape = (-1,) + (1,) * (leaf.ndim - 1)
            return jnp.sum(leaf * w.reshape(wshape).astype(leaf.dtype), axis=0)
        return jnp.max(leaf, axis=0)

    return jax.tree.map(agg, stacked_tree)


def broadcast_tree(tree, num_clients: int):
    """Replicate a global tree to a stacked [N, ...] client tree."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_clients,) + x.shape), tree)


def select_clients(rng: random.Random, num_clients: int, fraction: float) -> list[int]:
    """m = max(1, int(N * fraction)) clients per round, reference RNG semantics."""
    m = max(1, int(num_clients * float(fraction)))
    return rng.sample(list(range(num_clients)), m)


def make_parallel_client_update(
    model,
    lr: float,
    weight_decay: float,
    normalize_fn: Callable,
    client_axis: str = "client",
    mesh=None,
    step_chunk: int | None = None,
    chunk_budget_bytes: int = 512 << 20,
):
    """Build the jitted all-clients-at-once local update.

    Each client gets a FRESH AdamW per round (ref: src/federated/client_sim.py:36)
    — the optimizer state is initialized at round start and discarded at round
    end; nothing crosses rounds.

    Inputs (stacked on axis 0 = clients, sharded over the mesh client axis):
      params/batch_stats: [N, ...] trees
      clips:  [N, S, B, T, H, W, 3] uint8
      labels: [N, S, B] int32
      valid:  [N, S, B] bool   (padding mask; clients have ragged step counts)
    Returns (new_params, new_batch_stats, avg_loss [N]).

    The step axis S is processed in CHUNKS of at most ``step_chunk`` steps
    (default: auto-sized so one chunk's clips stay under ``chunk_budget_bytes``
    ≈ 1 GiB of HBM): at production client sizes the full round's uint8 clips
    do not fit on one chip (5 clients × 72 steps × [16,16,112,112,3] ≈ 27.7 GB
    vs 16 GB HBM — observed OOM), and chunking also keeps the compiled shape
    [N, C, B, ...] stable across rounds with ragged S. The per-round optimizer
    state, BN stats, and loss sums carry across chunks, so the result is
    numerically identical to a single scan over all S steps; the tail chunk is
    padded with valid=False steps, which the step fn already treats as no-ops.

    Clip chunks cross the jit boundary with the pixel dims FLATTENED to
    [N, C, B, T·H·W·3]: XLA's chosen input layout tiles the two minor dims
    (8×128 lanes), so a trailing channel dim of 3 inflates the resident u8
    buffer ~8x (observed: a 1.0 GB chunk allocated as 7.9 GB of hbm). The
    flat K = T·H·W·3 is a multiple of 128 at production shapes, making the
    padding ~zero; each scan step unflattens its own [B, K] slice (a ~10 MB
    relayout) before normalize.

    Parallelism is shard_map over ``mesh``'s ``client`` axis with an unrolled
    loop over the device-local clients — NOT vmap: vmapping a conv turns it
    into a grouped conv whose feature_group_count must divide the channel
    count, which breaks for arbitrary client counts (observed at N=6).
    Pass ``mesh`` explicitly (a jax.sharding.Mesh with a ``client`` axis);
    with mesh=None the same loop runs on one device. The stacked client dim
    must be a multiple of the axis size — run_fedavg_round pads with
    zero-weight dummy clients to guarantee this for any selection size.
    """
    tx = optax.adamw(float(lr), weight_decay=float(weight_decay))

    def one_client_chunk(clip_dims, params, batch_stats, opt_state,
                         loss_sum, count, clips, labels, valid):
        def step(carry, batch):
            params, bs, opt_state = carry
            clip_flat, y, v = batch
            clip = normalize_fn(clip_flat.reshape((clip_flat.shape[0],) + clip_dims))
            vf = v.astype(jnp.float32)
            n_valid = jnp.maximum(jnp.sum(vf), 1.0)

            def loss_fn(p):
                logits, mutated = model.apply(
                    {"params": p, "batch_stats": bs}, clip, train=True,
                    mutable=["batch_stats"],
                )
                per = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y)
                return jnp.sum(per * vf) / n_valid, mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # a fully-padded step is a no-op (keeps ragged clients exact)
            any_valid = jnp.sum(vf) > 0
            new_params = jax.tree.map(
                lambda n, o: jnp.where(any_valid, n, o), new_params, params)
            new_opt = jax.tree.map(
                lambda n, o: jnp.where(any_valid, n, o), new_opt, opt_state)
            new_bs = jax.tree.map(
                lambda n, o: jnp.where(any_valid, n, o), new_bs, bs)
            return (new_params, new_bs, new_opt), (loss * jnp.sum(vf), jnp.sum(vf))

        (params, batch_stats, opt_state), (loss_sums, counts) = jax.lax.scan(
            step, (params, batch_stats, opt_state), (clips, labels, valid))
        return (params, batch_stats, opt_state,
                loss_sum + jnp.sum(loss_sums), count + jnp.sum(counts))

    def _stack_trees(trees):
        if len(trees) > 1:
            return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        return jax.tree.map(lambda x: x[None], trees[0])

    def make_local_loop_chunk(clip_dims: tuple):
        def local_loop_chunk(params, batch_stats, opt_state, loss_sum, count,
                             clips, labels, valid):
            """Unrolled loop over the (static) leading client dim of one shard."""
            n_local = clips.shape[0]
            outs = []
            for i in range(n_local):
                sliced = [jax.tree.map(lambda x: x[i], t)
                          for t in (params, batch_stats, opt_state)]
                outs.append(one_client_chunk(
                    clip_dims, *sliced, loss_sum[i], count[i],
                    clips[i], labels[i], valid[i]))
            return (_stack_trees([o[0] for o in outs]),
                    _stack_trees([o[1] for o in outs]),
                    _stack_trees([o[2] for o in outs]),
                    jnp.stack([o[3] for o in outs]),
                    jnp.stack([o[4] for o in outs]))
        return local_loop_chunk

    chunk_fns: dict = {}

    def get_chunk_fn(clip_dims: tuple):
        if clip_dims in chunk_fns:
            return chunk_fns[clip_dims]
        loop = make_local_loop_chunk(clip_dims)
        if mesh is None or client_axis not in mesh.axis_names \
                or mesh.shape[client_axis] == 1:
            fn = jax.jit(loop)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            spec = P(client_axis)
            # check_vma=False: scalar opt-state leaves (Adam's step count)
            # enter the mapped scan carry as device-invariant values, which
            # the varying-axis checker would reject when mixed with varying
            # leaves.
            fn = jax.jit(shard_map(loop, mesh=mesh, in_specs=(spec,) * 8,
                                   out_specs=(spec,) * 5, check_vma=False))
        chunk_fns[clip_dims] = fn
        return fn

    def parallel_update(params, batch_stats, clips, labels, valid):
        clips, labels, valid = (np.asarray(clips), np.asarray(labels),
                                np.asarray(valid))
        n, s = clips.shape[0], clips.shape[1]
        clip_dims = clips.shape[3:]  # (T, H, W, 3)
        chunk_fn = get_chunk_fn(clip_dims)
        # flatten pixel dims: see layout note in the docstring
        clips = clips.reshape(clips.shape[:3] + (-1,))
        per_chunk_step = n * int(np.prod(clips.shape[2:]))  # uint8 bytes
        c = step_chunk or max(1, min(s, int(chunk_budget_bytes) // max(1, per_chunk_step)))
        pad = (-s) % c
        if pad:
            zpad = lambda a: np.concatenate(
                [a, np.zeros((n, pad) + a.shape[2:], a.dtype)], axis=1)
            clips, labels, valid = zpad(clips), zpad(labels), zpad(valid)

        # fresh per-round optimizer state, replicated to the client axis
        opt0 = tx.init(jax.tree.map(lambda x: x[0], params))
        opt_state = broadcast_tree(opt0, n)
        loss_sum = jnp.zeros((n,), jnp.float32)
        count = jnp.zeros((n,), jnp.float32)
        for k in range(0, clips.shape[1], c):
            sl = slice(k, k + c)
            params, batch_stats, opt_state, loss_sum, count = chunk_fn(
                params, batch_stats, opt_state, loss_sum, count,
                clips[:, sl], labels[:, sl], valid[:, sl])
        avg_loss = loss_sum / jnp.maximum(count, 1.0)
        return params, batch_stats, avg_loss

    return parallel_update


def pad_clients_to_axis(client_batches: dict, client_sizes: np.ndarray,
                        axis_size: int) -> tuple[dict, np.ndarray, int]:
    """Pad the stacked client dim to a multiple of the mesh client axis.

    Dummy clients get all-False ``valid`` masks (their local updates are
    no-ops) and zero aggregation weight, so any selection size — e.g.
    client_fraction 0.5 of 8 clients on an 8-device mesh — shards cleanly.
    Returns (padded_batches, padded_sizes, n_real).
    """
    n = int(client_sizes.shape[0])
    n_pad = (-n) % int(axis_size)
    if n_pad == 0:
        return client_batches, client_sizes, n
    padded = {k: np.concatenate(
        [np.asarray(v), np.zeros((n_pad,) + v.shape[1:], dtype=np.asarray(v).dtype)])
        for k, v in client_batches.items()}
    sizes = np.concatenate([np.asarray(client_sizes, np.float32),
                            np.zeros((n_pad,), np.float32)])
    return padded, sizes, n


def run_fedavg_round(
    parallel_update,
    global_params,
    global_batch_stats,
    client_batches: dict,
    client_sizes: np.ndarray,
    mesh=None,
    client_axis: str = "client",
):
    """One round: broadcast -> parallel local updates -> weighted aggregate.

    client_batches: {"clip": [N,S,B,...] uint8, "label": [N,S,B], "valid": [N,S,B]}
    Returns (new_params, new_batch_stats, local_losses [N_real]).
    """
    n_real = client_sizes.shape[0]
    if mesh is not None and client_axis in mesh.axis_names:
        client_batches, client_sizes, n_real = pad_clients_to_axis(
            client_batches, client_sizes, mesh.shape[client_axis])
    n = client_sizes.shape[0]
    stacked_p = broadcast_tree(global_params, n)
    stacked_bs = broadcast_tree(global_batch_stats, n)
    new_p, new_bs, losses = parallel_update(
        stacked_p, stacked_bs,
        client_batches["clip"], client_batches["label"], client_batches["valid"])
    w = jnp.asarray(client_sizes, jnp.float32)
    agg_p = fedavg_aggregate(new_p, w)
    agg_bs = fedavg_aggregate(new_bs, w)
    return agg_p, agg_bs, losses[:n_real]


def run_fedavg(
    parallel_update,
    global_params,
    global_batch_stats,
    sample_round_batches: Callable[[list[int], int], tuple[dict, np.ndarray]],
    evaluate_fn: Callable,
    num_clients: int,
    rounds: int = 10,
    client_fraction: float = 1.0,
    mesh=None,
    log=print,
) -> tuple[list[dict], object, object]:
    """Full FedAvg loop (ref: src/federated/fed_loop.py:65-147).

    sample_round_batches(selected, round) -> (client_batches, client_sizes).
    evaluate_fn(params, batch_stats) -> (top1, top5).
    Returns (records, final_params, final_batch_stats).
    """
    rng = random.Random(42)
    records = []
    for r in range(1, int(rounds) + 1):
        selected = select_clients(rng, num_clients, client_fraction)
        log(f"[INFO] Round {r}/{rounds} selected_clients={selected}")

        batches, sizes = sample_round_batches(selected, r)
        global_params, global_batch_stats, losses = run_fedavg_round(
            parallel_update, global_params, global_batch_stats, batches, sizes,
            mesh=mesh)

        # full transmitted state = params + BN batch_stats, matching the
        # reference's state_dict accounting (ref: src/federated/comm_cost.py:4-10
        # measures the whole state_dict incl. running stats)
        comm_tree = {"params": global_params}
        if global_batch_stats is not None:
            comm_tree["batch_stats"] = global_batch_stats
        comm_total_mb, model_mb = estimate_comm_mb_per_round(
            comm_tree, num_clients_participating=len(selected))
        top1, top5 = evaluate_fn(global_params, global_batch_stats)
        local_losses = [float(x) for x in np.asarray(losses)]
        rec = {
            "round": r,
            "val_top1": float(top1),
            "val_top5": float(top5),
            "avg_local_loss": float(sum(local_losses) / max(1, len(local_losses))),
            "clients": int(len(selected)),
            "model_mb": float(model_mb),
            "comm_mb_round": float(comm_total_mb),
        }
        records.append(rec)
        log(f"[INFO] Round {r} val_top1={rec['val_top1']:.4f} val_top5={rec['val_top5']:.4f} "
            f"avg_local_loss={rec['avg_local_loss']:.4f} comm_mb={rec['comm_mb_round']:.2f}")
    return records, global_params, global_batch_stats
