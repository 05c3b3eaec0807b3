"""Sharded propagation over the 'graph' mesh axis (SURVEY.md §5.7-5.8).

Two exchange strategies, both pure-XLA collectives inside ``shard_map``
(compiled onto ICI within a slice / DCN across slices — no custom
transport, SURVEY.md §5.8):

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

The T-step recurrence stays a single ``lax.scan`` inside one ``shard_map``
— node states never leave their shard; only halo states move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ggnn_tpu.models.config import ModelConfig
from ggnn_tpu.models.ggnn import fuse_gru, gru_update, init_state
from ggnn_tpu.ops.segment import typed_aggregate
from ggnn_tpu.parallel.partition import PartitionedBatch


def sharded_propagate(prop: dict, cfg: ModelConfig, mesh,
                      parts: PartitionedBatch, strategy: str = "halo",
                      axis_name: str = "graph"):
    """Run T sharded propagation steps; returns h sharded as [n_pad, D].

    ``parts`` arrays cross into shard_map with their leading [P] axis
    mapped onto the mesh's graph axis."""
    if strategy not in ("halo", "all_gather"):
        raise ValueError(f"unknown strategy {strategy!r}")

    n_local = parts.n_local
    H = parts.halo_size

    def body(prop, ann, src_g, src_h, dst_l, etype, emask, send_idx):
        # shapes inside: ann [1, n_local, A], edges [1, E_l],
        # send_idx [1, P, H] (this shard's owner-row of the send plan)
        ann = ann[0]
        src_g, src_h = src_g[0], src_h[0]
        dst_l, etype, emask = dst_l[0], etype[0], emask[0]
        send_idx = send_idx[0]
        fused = fuse_gru(prop["gru"])
        h0 = init_state(ann, cfg.state_dim)

        def step(h_local, _):
            if strategy == "all_gather":
                h_src_pool = jax.lax.all_gather(
                    h_local, axis_name, tiled=True)          # [N, D]
                src_idx = src_g
            else:
                send = h_local[send_idx.reshape(-1)].reshape(
                    send_idx.shape[0], H, -1)                 # [P, H, D]
                recv = jax.lax.all_to_all(
                    send, axis_name, split_axis=0, concat_axis=0,
                    tiled=False)                              # [P, H, D]
                h_src_pool = recv.reshape(-1, h_local.shape[-1])  # [P·H, D]
                src_idx = src_h
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
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    h = shard(prop, parts.annotations, parts.edge_src_global,
              parts.edge_src_halo, parts.edge_dst_local, parts.edge_type,
              parts.edge_mask, parts.halo_send_idx)
    return h.reshape(-1, cfg.state_dim)
