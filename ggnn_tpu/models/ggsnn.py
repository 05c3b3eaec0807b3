"""GGS-NN: sequential outputs via repeated (propagate → output → annotate)
rounds (SURVEY.md §2.1 C7d, §3.4; paper §4; bAbI task 19 per BASELINE.json:10).

The outer loop over output rounds is a ``lax.scan`` carrying the node
annotations X^{(k)}; propagation re-initializes h = pad(X^{(k)}, D) each
round and shares weights across rounds (the paper's shared-weights option).
Loss masks rounds past each example's target length (targets padded with
−1), so variable-length sequences run under a static round count
(SURVEY.md §7.2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggnn_tpu.models.config import ModelConfig
from ggnn_tpu.models.ggnn import propagate
from ggnn_tpu.models.heads import _mlp2, graph_gated_logits


def annotation_update(ann: dict, h, annotations) -> jax.Array:
    """X^{(k+1)} = σ(F_x([h ; X^{(k)}])) per node."""
    hx = jnp.concatenate([h, annotations], axis=1)
    return jax.nn.sigmoid(_mlp2(ann, hx, "a1", "a1b", "a2", "a2b"))


def ggsnn_forward(params: dict, cfg: ModelConfig, annotations, node_graph,
                  node_mask, edge_src, edge_dst, edge_type, edge_mask,
                  n_graphs: int):
    """Returns per-round graph logits [K, B, V] and final annotations."""

    def round_fn(X, round_params):
        out_p, ann_p = round_params
        h = propagate(params["prop"], cfg, X, edge_src, edge_dst, edge_type,
                      edge_mask)
        logits = graph_gated_logits(out_p, h, X, node_graph,
                                    node_mask, n_graphs)
        X_next = annotation_update(ann_p, h, X) * node_mask[:, None]
        return X_next, (logits, X_next)

    if cfg.share_round_nets:
        _, (logits, anns) = jax.lax.scan(
            lambda X, _: round_fn(X, (params["out"], params["ann"])),
            annotations, None, length=cfg.n_rounds)
    else:
        # per-round nets: scan consumes the stacked leading-K params
        _, (logits, anns) = jax.lax.scan(
            round_fn, annotations, (params["out"], params["ann"]))
    return logits, anns  # [K, B, V], [K, N, A]


def ggsnn_loss(logits, targets, n_nodes, anns=None, ann_targets=None,
               node_graph=None, node_mask=None, ann_weight: float = 1.0):
    """Σ_k CE(logits_k, target_k) over valid rounds (+ optional GGS-NN-opt
    annotation BCE); exact-match sequence accuracy (SURVEY.md §3.3)."""
    K, B, V = logits.shape
    tgt = targets.T  # [K, B]
    valid = (tgt >= 0) & (n_nodes[None, :] > 0)
    safe = jnp.maximum(tgt, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    loss = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

    if anns is not None and ann_targets is not None:
        # anns [K, N, A]; ann_targets [N, K, A] (node-aligned batching)
        t = jnp.transpose(ann_targets, (1, 0, 2))            # [K, N, A]
        p = jnp.clip(anns, 1e-6, 1.0 - 1e-6)
        bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
        round_valid = valid.astype(logits.dtype)             # [K, B]
        w = round_valid[:, node_graph.clip(0, B - 1)] * node_mask[None, :]
        bce = bce * w[..., None]
        loss = loss + ann_weight * jnp.sum(bce) / jnp.maximum(jnp.sum(w), 1.0)

    step_correct = (jnp.argmax(logits, axis=-1) == tgt) | ~valid
    seq_correct = jnp.all(step_correct, axis=0) & (n_nodes > 0)
    graph_mask = (n_nodes > 0).astype(logits.dtype)
    return loss, seq_correct, graph_mask
