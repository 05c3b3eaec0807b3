"""Sharded propagation over the 'graph' mesh axis (SURVEY.md §5.7-5.8).

Five strategies, all pure-XLA collectives inside ``shard_map`` (compiled
onto ICI within a slice / DCN across slices — no custom transport,
SURVEY.md §5.8); halo states travel in the compute dtype (bf16 halves the
exchange bytes):

- ``all_gather`` — every shard gathers the full node-state array each step
  and aggregates its local (dst-owned) edges.  Simple; bandwidth O(N·D)
  per step.  Near-optimal when average degree ≳ shard count (uniform
  random graphs — every remote node is halo anyway).
- ``halo`` — targeted all-to-all using the precomputed
  ``halo_send_idx[owner, requester, H]`` plan from
  :func:`~ggnn_tpu.parallel.partition.partition_batch`.  Bandwidth
  O(P·H·D) with H = max deduplicated request size; the win for
  partitioned/clustered graphs.  Local (diagonal) contributions flow
  through the same uniform gather, and XLA's latency-hiding scheduler can
  overlap the all-to-all with the type-transform matmuls because they are
  dataflow-independent.
- ``halo_onehot`` — the halo plan plus per-shard one-hot MXU scatter
  kernels (the production large-graph path; ``n_local % 128 == 0``).
- ``halo_window`` — the halo_overlap local/remote split with the
  intra-shard edges aggregated by the block-CSR windowed kernel
  (ops/window_pallas.py): community-partitioned shards do their local
  work with NO per-edge random access, and the all-to-all overlaps it.

The T-step recurrence stays a single ``lax.scan`` inside one ``shard_map``
— node states never leave their shard; only halo states move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ggnn_tpu.models.config import ModelConfig
from ggnn_tpu.models.ggnn import fuse_gru, gru_update, init_state
from ggnn_tpu.ops.segment import typed_aggregate
from ggnn_tpu.parallel.partition import PartitionedBatch


def sharded_propagate(prop: dict, cfg: ModelConfig, mesh,
                      parts: PartitionedBatch, strategy: str = "halo",
                      axis_name: str = "graph", scatter_tile_e: int = 512,
                      interpret: bool | None = None, halo_layouts=None):
    """Run T sharded propagation steps; returns h sharded as [n_pad, D].

    ``parts`` arrays cross into shard_map with their leading [P] axis
    mapped onto the mesh's graph axis.  Strategies:

    - ``all_gather`` / ``halo``: XLA typed aggregation per shard.
    - ``halo_onehot``: halo all-to-all + per-shard one-hot MXU scatter
      kernels (ops/scatter_pallas.py) — the production large-graph path;
      needs ``n_local % 128 == 0``."""
    if strategy not in ("halo", "all_gather", "halo_onehot", "halo_overlap",
                        "halo_window"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("halo_overlap", "halo_window") \
            and parts.local_edges is None:
        if isinstance(parts.edge_src_global, jax.core.Tracer):
            raise ValueError(
                "halo_overlap under jit needs split_local_remote(parts) "
                "called on the host before the jitted function")
        from ggnn_tpu.parallel.partition import split_local_remote
        parts = split_local_remote(parts)

    n_local = parts.n_local
    H = parts.halo_size

    lay_arrays, lay_meta = halo_layouts if halo_layouts else (None, None)
    if strategy == "halo_onehot":
        from ggnn_tpu.ops.scatter_pallas import (
            onehot_segment_scatter_flat)
        if lay_arrays is None:
            # host-side build — only possible outside jit; under jit,
            # precompute with build_halo_scatter_layouts and pass both the
            # parts pytree and halo_layouts through the jitted function's
            # arguments
            from ggnn_tpu.parallel.partition import build_halo_scatter_layouts
            lay_arrays, lay_meta = build_halo_scatter_layouts(
                parts, tile_e=scatter_tile_e)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
    if strategy == "halo_window":
        if lay_arrays is None:
            from ggnn_tpu.parallel.partition import build_halo_window_layouts
            # the model's message-type count, NOT the max observed type:
            # the table stride is msg_w.shape[0] — inferring from the batch
            # silently mis-addresses every window row when the top type is
            # absent
            lay_arrays, lay_meta = build_halo_window_layouts(
                parts, n_message_types=cfg.n_message_types)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"

    def body(prop, ann, src_g, src_h, dst_l, etype, emask, send_idx,
             gidx, onehot, tstart, btile, loc, rem, warr):
        # shapes inside: ann [1, n_local, A], edges [1, E_l],
        # send_idx [1, P, H] (this shard's owner-row of the send plan)
        ann = ann[0]
        src_g, src_h = src_g[0], src_h[0]
        dst_l, etype, emask = dst_l[0], etype[0], emask[0]
        send_idx = send_idx[0]
        fused = fuse_gru(prop["gru"])
        h0 = init_state(ann, cfg.state_dim)
        cdt = jnp.dtype(cfg.compute_dtype)

        def exchange(h_local):
            # halo states travel in the compute dtype (bf16 halves ICI/DCN
            # bytes); accumulation stays f32 downstream.  Self-edges are NOT
            # exchanged: the pool is [recv ∥ h_local] and their halo coords
            # index past P·H (keeps clustered-graph exchanges proportional
            # to the true cross-shard traffic).
            send = h_local.astype(cdt)[send_idx.reshape(-1)].reshape(
                send_idx.shape[0], H, -1)                     # [P, H, D]
            recv = jax.lax.all_to_all(
                send, axis_name, split_axis=0, concat_axis=0,
                tiled=False)                                  # [P, H, D]
            return jnp.concatenate(
                [recv.reshape(-1, h_local.shape[-1]),
                 h_local.astype(cdt)], axis=0)                # [P·H+n_local, D]

        def step(h_local, _):
            if strategy == "all_gather":
                h_src_pool = jax.lax.all_gather(
                    h_local.astype(cdt), axis_name, tiled=True)  # [N, D]
                src_idx = src_g
            else:
                h_src_pool = exchange(h_local)
                src_idx = src_h
            if strategy == "halo_window":
                # intra-shard edges through the block-CSR windowed kernel
                # (no per-edge random access; reads h_local only, so the
                # all-to-all overlaps it); remote edges via the halo pool
                from ggnn_tpu.ops.window_pallas import (DeviceWindowLayout,
                                                        aggregate_window)
                wlay = DeviceWindowLayout(
                    meta=lay_meta["full_meta"],
                    arrays={k: v[0] for k, v in warr.items()})
                a_loc = aggregate_window(
                    h_local.astype(cdt), wlay, prop["msg_w"].astype(cdt),
                    prop["msg_b"].astype(cdt), interpret=interpret)
                a_rem = typed_aggregate(
                    h_src_pool, rem["src"][0], rem["dst"][0], rem["type"][0],
                    rem["mask"][0], prop["msg_w"], prop["msg_b"],
                    strategy=cfg.agg_strategy)[:n_local]
                a = a_loc + a_rem
            elif strategy == "halo_overlap":
                # SURVEY.md §5.7: local-edge aggregation reads h_local only
                # — no dependency on the all-to-all, so XLA overlaps them
                a_loc = typed_aggregate(
                    h_local.astype(cdt), loc["src"][0], loc["dst"][0],
                    loc["type"][0], loc["mask"][0], prop["msg_w"],
                    prop["msg_b"], strategy=cfg.agg_strategy)[:n_local]
                a_rem = typed_aggregate(
                    h_src_pool, rem["src"][0], rem["dst"][0], rem["type"][0],
                    rem["mask"][0], prop["msg_w"], prop["msg_b"],
                    strategy=cfg.agg_strategy)[:n_local]
                a = a_loc + a_rem
            elif strategy == "halo_onehot":
                table = jnp.einsum(
                    "nd,tdf->tnf", h_src_pool,
                    prop["msg_w"].astype(cdt),
                    preferred_element_type=jnp.float32) \
                    + prop["msg_b"][:, None, :]
                msgs = table.reshape(-1, h_local.shape[-1]).astype(
                    cdt)[gidx[0]]
                a = onehot_segment_scatter_flat(
                    msgs, onehot[0], tstart[0], btile[0],
                    n_blocks=lay_meta["n_blocks"],
                    tile_e=lay_meta["tile_e"],
                    interpret=interpret)[:n_local]
            else:
                a = typed_aggregate(
                    h_src_pool, src_idx, dst_l, etype, emask,
                    prop["msg_w"], prop["msg_b"],
                    strategy=cfg.agg_strategy)[:n_local]
            h_new = gru_update(prop["gru"], h_local, a, fused)
            return h_new, None

        h_final, _ = jax.lax.scan(step, h0, None, length=cfg.n_steps)
        return h_final[None]  # restore leading shard axis

    shard = jax.shard_map(
        functools.partial(body),
        mesh=mesh,
        in_specs=(P(),                     # prop params replicated
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    if strategy == "halo_onehot":
        gidx = lay_arrays["gather_idx"]
        oh = lay_arrays["onehot"]
        ts = lay_arrays["tile_start"]
        bt = lay_arrays["block_of_tile"]
    else:
        z = np.zeros((parts.n_shards, 1), np.int32)
        gidx = oh = ts = bt = z
    zdict = {"src": np.zeros((parts.n_shards, 1), np.int32),
             "dst": np.zeros((parts.n_shards, 1), np.int32),
             "type": np.zeros((parts.n_shards, 1), np.int32),
             "mask": np.zeros((parts.n_shards, 1), np.float32)}
    overlap = strategy in ("halo_overlap", "halo_window")
    loc = parts.local_edges if strategy == "halo_overlap" else zdict
    rem = parts.remote_edges if overlap else zdict
    warr = lay_arrays if strategy == "halo_window" else {}
    h = shard(prop, parts.annotations, parts.edge_src_global,
              parts.edge_src_halo, parts.edge_dst_local, parts.edge_type,
              parts.edge_mask, parts.halo_send_idx, gidx, oh, ts, bt,
              loc, rem, warr)
    return h.reshape(-1, cfg.state_dim)


def make_sharded_train_step(cfg: ModelConfig, mesh, optimizer,
                            strategy: str = "halo_overlap",
                            axis_name: str = "graph", loss_fn=None):
    """Jitted SHARDED train step: value_and_grad straight through the
    ``shard_map`` (XLA transposes the collectives — the all-to-all's
    backward is the reverse all-to-all over the same static plan, so the
    exchange schedule of SURVEY.md §5.7 holds for gradients too), then a
    replicated optax update.

    Differentiable strategies: ``all_gather`` / ``halo`` /
    ``halo_overlap`` (pure-XLA per-shard aggregation; ``halo_overlap``
    keeps the local/remote dataflow split, so the backward's reverse
    all-to-all also overlaps the local VJP).  The kernel strategies
    (``halo_onehot`` / ``halo_window``) are forward/serving paths — their
    sharded backward needs per-shard grad layouts (future work).

    ``loss_fn(h) -> scalar`` defaults to ``sum(h*h)`` (machinery/bench
    proxy); pass a real head loss for task training.  Grad parity vs the
    single-device path is pinned by tests/test_distributed.py."""
    import optax

    if strategy not in ("all_gather", "halo", "halo_overlap"):
        raise ValueError(
            f"strategy {strategy!r} is not differentiable end-to-end; use "
            "all_gather | halo | halo_overlap")
    if loss_fn is None:
        def loss_fn(h):
            return jnp.sum(h * h)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_step(prop, opt_state, parts):
        def objective(p):
            h = sharded_propagate(p, cfg, mesh, parts, strategy=strategy,
                                  axis_name=axis_name)
            return loss_fn(h)

        loss, grads = jax.value_and_grad(objective)(prop)
        updates, opt_state_new = optimizer.update(grads, opt_state, prop)
        return optax.apply_updates(prop, updates), opt_state_new, loss

    return train_step
