"""Pallas typed-SpMM kernel tests, run in interpret mode on CPU
(SURVEY.md §4.2): layout packing invariants, parity vs the XLA segment path
and the NumPy oracle across edge-count/type/padding edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.graph import PaddingSpec, batch_graphs
from ggnn_tpu.models import ModelConfig, init_params, propagate
from ggnn_tpu.ops.segment import typed_aggregate
from ggnn_tpu.ops.spmm_pallas import (
    pack_type_tiles, typed_aggregate_pallas, tiles_budget)


def random_batch(rng, n_graphs=3, n_edge_types=3, annotation_dim=2,
                 empty_types=False):
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(3, 10))
        m = int(rng.integers(1, 2 * n))
        types = (np.zeros(m, np.int64) if empty_types
                 else rng.integers(0, n_edge_types, m))
        edges = np.stack([rng.integers(0, n, m), types,
                          rng.integers(0, n, m)], axis=1)
        ann = (rng.random((n, annotation_dim)) < 0.5).astype(np.float32)
        graphs.append(dict(n_nodes=n, edges=edges, annotations=ann, targets={}))
    spec = PaddingSpec(
        n_graphs=n_graphs,
        n_pad=sum(g["n_nodes"] for g in graphs) + 3,
        e_pad=2 * sum(g["edges"].shape[0] for g in graphs) + 5,
        n_edge_types=n_edge_types, annotation_dim=annotation_dim).round_up()
    return spec, batch_graphs(graphs, spec)


@pytest.mark.parametrize("tile_e", [8, 32])
@pytest.mark.parametrize("empty_types", [False, True])
def test_pack_type_tiles_invariants(rng, tile_e, empty_types):
    spec, b = random_batch(rng, empty_types=empty_types)
    layout = pack_type_tiles(
        jnp.asarray(b.edge_src), jnp.asarray(b.edge_dst),
        jnp.asarray(b.edge_type), jnp.asarray(b.edge_mask),
        jnp.asarray(b.type_offsets), spec.n_message_types, tile_e)
    src = np.asarray(layout["src"]).reshape(-1, tile_e)
    mask = np.asarray(layout["mask"]).reshape(-1, tile_e)
    tt = np.asarray(layout["tile_type"])
    assert layout["n_tiles"] == tiles_budget(spec.e_pad, spec.n_message_types, tile_e)
    # every real edge appears exactly once
    assert mask.sum() == b.edge_mask.sum()
    # reconstruct (src, dst, type) multiset of real edges
    got = set()
    dst = np.asarray(layout["dst"]).reshape(-1, tile_e)
    for ti in range(src.shape[0]):
        for j in range(tile_e):
            if mask[ti, j] > 0:
                got.add((src[ti, j], dst[ti, j], tt[ti]))
    want = set()
    for s, d, t, m in zip(b.edge_src, b.edge_dst, b.edge_type, b.edge_mask):
        if m > 0:
            want.add((s, d, t))
    assert got == want


@pytest.mark.parametrize("state_dim", [4, 8])
def test_pallas_aggregate_matches_xla(rng, state_dim):
    spec, b = random_batch(rng)
    cfg = ModelConfig(state_dim=state_dim, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (spec.n_pad, state_dim))
    ref = typed_aggregate(h, b.edge_src, b.edge_dst, b.edge_type, b.edge_mask,
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = typed_aggregate_pallas(
        h, jnp.asarray(b.edge_src), jnp.asarray(b.edge_dst),
        jnp.asarray(b.edge_type), jnp.asarray(b.edge_mask),
        params["prop"]["msg_w"], params["prop"]["msg_b"],
        type_offsets=jnp.asarray(b.type_offsets), tile_e=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_propagate_matches_xla_backend(rng):
    spec, b = random_batch(rng)
    cfg_x = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=4)
    cfg_p = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=4,
                        backend="pallas")
    params = init_params(jax.random.PRNGKey(0), cfg_x)
    args = (jnp.asarray(b.annotations), jnp.asarray(b.edge_src),
            jnp.asarray(b.edge_dst), jnp.asarray(b.edge_type),
            jnp.asarray(b.edge_mask))
    h_x = propagate(params["prop"], cfg_x, *args)
    h_p = propagate(params["prop"], cfg_p, *args,
                    type_offsets=jnp.asarray(b.type_offsets))
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               rtol=1e-5, atol=1e-5)


def test_pallas_no_edges(rng):
    """A batch whose every edge is padding aggregates to zero."""
    cfg = ModelConfig(state_dim=4, annotation_dim=1, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_pad, e_pad = 16, 16
    h = jax.random.normal(jax.random.PRNGKey(1), (n_pad, 4))
    z = jnp.zeros((e_pad,), jnp.int32)
    out = typed_aggregate_pallas(
        h, z, z, z, jnp.zeros((e_pad,)), params["prop"]["msg_w"],
        params["prop"]["msg_b"],
        type_offsets=jnp.zeros((5,), jnp.int32), tile_e=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)
