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
  kernels (the production large-graph path; ``n_local % 128 == 0``),
  via :func:`ggnn_tpu.ops.scatter_pallas.aggregate_onehot` — trainable
  when the stacked layouts were built ``with_grad=True``.
- ``halo_window`` — the halo_overlap local/remote split with the
  intra-shard edges aggregated by the block-CSR windowed kernel
  (ops/window_pallas.py): community-partitioned shards do their local
  work with NO per-edge random access, and the all-to-all overlaps it.
  Trainable when the stacked layouts were built ``with_grad=True``.

The T-step recurrence stays a single ``lax.scan`` inside one ``shard_map``
— node states never leave their shard; only halo states move.  Training
runs ``value_and_grad`` straight through the shard_map: XLA transposes
the collectives (the all-to-all's backward is the reverse all-to-all over
the same static plan), and the kernel strategies' custom VJPs run
per-shard on their stacked grad layouts.
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

STRATEGIES = ("halo", "all_gather", "halo_onehot", "halo_overlap",
              "halo_window")


def _resolve_layouts(strategy, parts, cfg, halo_layouts, scatter_tile_e):
    """Returns (lay_arrays, lay_meta); builds host-side when missing."""
    lay_arrays, lay_meta = halo_layouts if halo_layouts else (None, None)
    if lay_arrays is not None or strategy not in ("halo_onehot",
                                                  "halo_window"):
        return lay_arrays, lay_meta
    # host-side build — only possible outside jit; under jit, precompute
    # with build_halo_scatter_layouts / build_halo_window_layouts and pass
    # both the parts pytree and halo_layouts through the jitted function's
    # arguments
    if isinstance(parts.edge_src_global, jax.core.Tracer):
        raise ValueError(
            f"{strategy} under jit needs precomputed halo_layouts passed "
            "through the jitted function's arguments")
    if strategy == "halo_onehot":
        from ggnn_tpu.parallel.partition import build_halo_scatter_layouts
        return build_halo_scatter_layouts(parts, tile_e=scatter_tile_e)
    from ggnn_tpu.parallel.partition import build_halo_window_layouts
    # the model's message-type count, NOT the max observed type: the
    # table stride is msg_w.shape[0] — inferring from the batch silently
    # mis-addresses every window row when the top type is absent
    return build_halo_window_layouts(
        parts, n_message_types=cfg.n_message_types)


def sharded_propagate(prop: dict, cfg: ModelConfig, mesh,
                      parts: PartitionedBatch, strategy: str = "halo",
                      axis_name: str = "graph", scatter_tile_e: int = 512,
                      interpret: bool | None = None, halo_layouts=None,
                      node_fn=None, node_fn_args=()):
    """Run T sharded propagation steps; returns h sharded as [n_pad, D].

    ``parts`` arrays cross into shard_map with their leading [P] axis
    mapped onto the mesh's graph axis.  Strategies:

    - ``all_gather`` / ``halo``: XLA typed aggregation per shard.
    - ``halo_onehot``: halo all-to-all + per-shard one-hot MXU scatter
      kernels (ops/scatter_pallas.py) — the production large-graph path;
      needs ``n_local % 128 == 0``.
    - ``halo_window``: block-CSR windowed local aggregation + typed halo
      remote aggregation.

    ``node_fn(h_local, ann_local, node_graph_local, node_mask_local,
    node_fn_args, axis_name) -> pytree`` optionally post-processes the
    final per-shard states INSIDE the shard_map (e.g. a readout head with
    cross-shard collectives — see :func:`sharded_node_select_loss`); its
    output replaces h (every leaf gains a leading per-shard axis).
    ``node_fn_args`` is an arbitrary replicated pytree (head params,
    targets)."""
    if strategy not in STRATEGIES:
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

    lay_arrays, lay_meta = _resolve_layouts(strategy, parts, cfg,
                                            halo_layouts, scatter_tile_e)
    if interpret is None and strategy in ("halo_onehot", "halo_window"):
        interpret = jax.default_backend() != "tpu"

    def body(prop, ann, ngraph, nmask, src_g, src_h, dst_l, etype, emask,
             send_idx, loc, rem, karr, nfa):
        # shapes inside: ann [1, n_local, A], edges [1, E_l],
        # send_idx [1, P, H] (this shard's owner-row of the send plan)
        ann = ann[0]
        ngraph, nmask = ngraph[0], nmask[0]
        src_g, src_h = src_g[0], src_h[0]
        dst_l, etype, emask = dst_l[0], etype[0], emask[0]
        send_idx = send_idx[0]
        fused = fuse_gru(prop["gru"])
        h0 = init_state(ann, cfg.state_dim)
        cdt = jnp.dtype(cfg.compute_dtype)
        karr_l = {k: v[0] for k, v in karr.items()}

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
                                                        aggregate_window,
                                                        gru_window_step)
                wlay = DeviceWindowLayout(
                    meta=lay_meta["full_meta"], arrays=karr_l)
                a_rem = typed_aggregate(
                    h_src_pool, rem["src"][0], rem["dst"][0], rem["type"][0],
                    rem["mask"][0], prop["msg_w"], prop["msg_b"],
                    strategy=cfg.agg_strategy)[:n_local]
                if cfg.fuse_gru:
                    # fused window+GRU step per shard (trainable custom
                    # VJP); the remote-edge partial rides the kernel's
                    # init stream so the epilogue sees the complete a
                    h_new = gru_window_step(
                        h_local, wlay, prop["msg_w"].astype(cdt),
                        prop["msg_b"].astype(cdt), prop["gru"],
                        interpret=interpret, extra_init=a_rem)
                    return h_new, None
                a_loc = aggregate_window(
                    h_local.astype(cdt), wlay, prop["msg_w"].astype(cdt),
                    prop["msg_b"].astype(cdt), interpret=interpret)
                a = a_loc[:n_local] + a_rem
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
                # all edges (local via self-coordinates past P·H) through
                # the one-hot MXU scatter; differentiable via the
                # aggregate_onehot custom VJP when the layout carries grads
                from ggnn_tpu.ops.scatter_pallas import (DeviceScatterLayout,
                                                         aggregate_onehot)
                slay = DeviceScatterLayout(
                    meta=lay_meta["scatter_meta"], arrays=karr_l)
                a = aggregate_onehot(
                    h_src_pool, slay, prop["msg_w"].astype(cdt),
                    prop["msg_b"].astype(cdt),
                    interpret=interpret)[:n_local]
            else:
                a = typed_aggregate(
                    h_src_pool, src_idx, dst_l, etype, emask,
                    prop["msg_w"], prop["msg_b"],
                    strategy=cfg.agg_strategy)[:n_local]
            h_new = gru_update(prop["gru"], h_local, a, fused)
            return h_new, None

        h_final, _ = jax.lax.scan(step, h0, None, length=cfg.n_steps)
        if node_fn is not None:
            out = node_fn(h_final, ann, ngraph, nmask, nfa, axis_name)
            return jax.tree.map(lambda x: x[None], out)
        return h_final[None]  # restore leading shard axis

    shard = jax.shard_map(
        functools.partial(body),
        mesh=mesh,
        in_specs=(P(),                     # prop params replicated
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P()),                    # node_fn_args replicated
        out_specs=P(axis_name),
        check_vma=False,
    )
    zdict = {"src": np.zeros((parts.n_shards, 1), np.int32),
             "dst": np.zeros((parts.n_shards, 1), np.int32),
             "type": np.zeros((parts.n_shards, 1), np.int32),
             "mask": np.zeros((parts.n_shards, 1), np.float32)}
    overlap = strategy in ("halo_overlap", "halo_window")
    loc = parts.local_edges if strategy == "halo_overlap" else zdict
    rem = parts.remote_edges if overlap else zdict
    karr = lay_arrays if strategy in ("halo_onehot", "halo_window") else {}
    out = shard(prop, parts.annotations, parts.node_graph, parts.node_mask,
                parts.edge_src_global, parts.edge_src_halo,
                parts.edge_dst_local, parts.edge_type, parts.edge_mask,
                parts.halo_send_idx, loc, rem, karr, node_fn_args)
    if node_fn is not None:
        return out
    return out.reshape(-1, out.shape[-1])


def make_sharded_train_step(cfg: ModelConfig, mesh, optimizer,
                            strategy: str = "halo_overlap",
                            axis_name: str = "graph", loss_fn=None,
                            halo_meta=None):
    """Jitted SHARDED train step: value_and_grad straight through the
    ``shard_map`` (XLA transposes the collectives — the all-to-all's
    backward is the reverse all-to-all over the same static plan, so the
    exchange schedule of SURVEY.md §5.7 holds for gradients too), then a
    replicated optax update.

    All five strategies are differentiable.  The kernel strategies
    (``halo_onehot`` / ``halo_window``) additionally need their stacked
    per-shard layouts built ``with_grad=True``
    (:func:`~ggnn_tpu.parallel.partition.build_halo_scatter_layouts` /
    :func:`~ggnn_tpu.parallel.partition.build_halo_window_layouts`):
    pass the static ``meta`` here and the array dict to each step call
    (arrays must flow through jit ARGUMENTS — closure constants overflow
    remote-compile payloads).

    ``loss_fn(h) -> scalar`` defaults to ``sum(h*h)`` (machinery/bench
    proxy); pass a real head loss for task training (see
    :func:`make_sharded_task_train_step` for the full-model variant).
    Grad parity vs the single-device path is pinned by
    tests/test_distributed.py."""
    import optax

    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("halo_onehot", "halo_window") and halo_meta is None:
        raise ValueError(
            f"strategy {strategy!r} needs halo_meta= from "
            "build_halo_scatter_layouts/build_halo_window_layouts("
            "with_grad=True); pass the arrays dict to each step call")
    if loss_fn is None:
        def loss_fn(h):
            return jnp.sum(h * h)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_step(prop, opt_state, parts, halo_arrays=None):
        layouts = ((halo_arrays, halo_meta)
                   if halo_arrays is not None else None)

        def objective(p):
            h = sharded_propagate(p, cfg, mesh, parts, strategy=strategy,
                                  axis_name=axis_name, halo_layouts=layouts)
            return loss_fn(h)

        loss, grads = jax.value_and_grad(objective)(prop)
        updates, opt_state_new = optimizer.update(grads, opt_state, prop)
        return optax.apply_updates(prop, updates), opt_state_new, loss

    return train_step


def sharded_node_select_loss(head: dict, h, ann, node_graph, node_mask,
                             n_nodes, target_local, n_graphs: int,
                             axis_name: str):
    """Node-selection softmax-CE over PARTITIONED graphs, inside shard_map.

    The softmax normalizes over each graph's nodes, which may span shards:
    per-shard segment max/sum reduce across the mesh with ``pmax``/``psum``
    (n_graphs+1 scalars each — negligible traffic).  The target's score is
    read by its owning shard and psum'd.  Per-graph argmax (accuracy) uses
    the same two-level reduction.  Returns (loss, correct_sum, count) —
    identical replicated scalars on every shard.  Mirrors
    :func:`ggnn_tpu.models.heads.node_select_loss` exactly (pinned by
    tests/test_distributed.py)."""
    from ggnn_tpu.models import heads as H

    n_local = h.shape[0]
    base = jax.lax.axis_index(axis_name) * n_local
    scores = H.node_select_scores(head, h, ann)              # [n_local]
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(node_mask > 0, scores, neg)
    seg = functools.partial(jax.ops.segment_sum, num_segments=n_graphs + 1)
    # stop_gradient BEFORE the collective: the max-shift cancels out of
    # the log-softmax exactly (standard stable formulation), and pmax has
    # no JAX differentiation rule — it must never see a tangent
    gmax = jax.lax.pmax(
        jax.ops.segment_max(jax.lax.stop_gradient(masked), node_graph,
                            num_segments=n_graphs + 1),
        axis_name)                                           # [G+1]
    # the exp argument must be finite even on padding rows (the padding
    # segment's gmax is finfo.min, and exp(+3e38)=inf in the untaken
    # where-branch poisons the backward with inf·0 = nan)
    shift = jnp.where(node_mask > 0, scores - gmax[node_graph], 0.0)
    ex = jnp.where(node_mask > 0, jnp.exp(shift), 0.0)
    sumexp = jax.lax.psum(seg(ex, node_graph), axis_name)    # [G+1]

    # target score: its owning shard contributes, others add zero
    offs = H.node_offsets(n_nodes)
    tgt_global = offs + target_local                         # [G]
    in_shard = (tgt_global >= base) & (tgt_global < base + n_local)
    tloc = jnp.clip(tgt_global - base, 0, n_local - 1)
    t_score = jax.lax.psum(
        jnp.where(in_shard, scores[tloc], 0.0), axis_name)   # [G]

    graph_mask = (n_nodes > 0).astype(scores.dtype)
    # padding graphs have sumexp 0 and gmax finfo.min — mask before the
    # log, not after (-inf·0 = nan)
    logp_t = jnp.where(graph_mask > 0,
                       t_score - gmax[:n_graphs]
                       - jnp.log(jnp.maximum(sumexp[:n_graphs], 1e-30)),
                       0.0)
    loss = jnp.sum(-logp_t * graph_mask) / jnp.maximum(
        jnp.sum(graph_mask), 1.0)

    # argmax accuracy: first global index achieving the per-graph max
    idx = base + jnp.arange(n_local, dtype=jnp.int32)
    big = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
    is_max = (masked == gmax[node_graph]) & (node_mask > 0)
    pred = jax.lax.pmin(
        jax.ops.segment_min(jnp.where(is_max, idx, big), node_graph,
                            num_segments=n_graphs + 1)[:n_graphs],
        axis_name)
    correct = (pred == tgt_global) & (n_nodes > 0)
    return (loss, jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(graph_mask))


def sharded_graph_gated_loss(head: dict, h, ann, node_graph, node_mask,
                             n_nodes, target_cls, n_graphs: int,
                             axis_name: str):
    """Graph-level gated-readout classification over PARTITIONED graphs:
    the σ·tanh gated pool is a per-shard segment-sum psum'd across the
    mesh ([G, readout_dim] scalars); the classifier MLP and CE then run
    replicated.  Mirrors heads.graph_gated_logits + graph_class_loss."""
    from ggnn_tpu.models import heads as H

    hx = jnp.concatenate([h, ann], axis=1)
    gate = jax.nn.sigmoid(
        jnp.dot(hx, head["gi_w"], preferred_element_type=jnp.float32)
        + head["gi_b"])
    val = jnp.tanh(
        jnp.dot(hx, head["gj_w"], preferred_element_type=jnp.float32)
        + head["gj_b"])
    pooled = jax.lax.psum(
        jax.ops.segment_sum(gate * val * node_mask[:, None], node_graph,
                            num_segments=n_graphs + 1)[:n_graphs],
        axis_name)
    logits = H._mlp2(head, pooled, "c1", "c1b", "c2", "c2b")
    loss, correct, graph_mask = H.graph_class_loss(logits, target_cls,
                                                   n_nodes)
    return (loss, jnp.sum(correct.astype(jnp.float32)),
            jnp.sum(graph_mask))


def make_sharded_task_train_step(cfg: ModelConfig, mesh, optimizer,
                                 n_graphs: int,
                                 strategy: str = "halo_overlap",
                                 axis_name: str = "graph",
                                 halo_meta=None):
    """End-to-end SHARDED task training (SURVEY.md §7.1 L4): the full
    param tree (propagation + head) trains against a real task loss
    computed INSIDE the shard_map with cross-shard collectives
    (:func:`sharded_node_select_loss` / :func:`sharded_graph_gated_loss`),
    so graphs may span shards.  ``targets`` carries the batch's replicated
    per-graph arrays: ``{"n_nodes": [G]}`` plus ``"node"`` (node_select
    local target ids) or ``"cls"`` (graph_gated class ids).

    Returns ``train_step(params, opt_state, parts, targets,
    halo_arrays=None) -> (params, opt_state, metrics)``; metrics are the
    same (loss_sum, correct, count) sums the single-device
    :func:`ggnn_tpu.train.loop.make_train_step` reports — curves match
    (pinned by tests/test_distributed.py)."""
    import optax

    if cfg.head not in ("node_select", "graph_gated"):
        raise ValueError(
            "sharded task training implements the node_select and "
            f"graph_gated heads (got {cfg.head!r})")

    def node_fn(h, ann, ngraph, nmask, nfa, ax):
        if cfg.head == "graph_gated":
            loss, correct, count = sharded_graph_gated_loss(
                nfa["head"], h, ann, ngraph, nmask, nfa["n_nodes"],
                nfa["cls"], n_graphs, ax)
        else:
            loss, correct, count = sharded_node_select_loss(
                nfa["head"], h, ann, ngraph, nmask, nfa["n_nodes"],
                nfa["node"], n_graphs, ax)
        return jnp.stack([loss, correct, count])

    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_step(params, opt_state, parts, targets, halo_arrays=None):
        layouts = ((halo_arrays, halo_meta)
                   if halo_arrays is not None else None)

        def objective(ps):
            nfa = {"head": ps["head"], "n_nodes": targets["n_nodes"],
                   **{k: v for k, v in targets.items()
                      if k in ("node", "cls")}}
            out = sharded_propagate(
                ps["prop"], cfg, mesh, parts, strategy=strategy,
                axis_name=axis_name, halo_layouts=layouts,
                node_fn=node_fn, node_fn_args=nfa)
            # every shard returned identical replicated scalars
            return out[0, 0], (out[0, 1], out[0, 2])

        (loss, (correct, count)), grads = jax.value_and_grad(
            objective, has_aux=True)(params)
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        metrics = {"loss_sum": loss * count, "correct": correct,
                   "count": count}
        return optax.apply_updates(params, updates), opt_state_new, metrics

    return train_step
