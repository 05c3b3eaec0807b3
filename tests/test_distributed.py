"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4):
partitioning invariants and halo-exchange propagation parity vs the
single-device path."""

import jax
import numpy as np
import pytest

from ggnn_tpu.graph import PaddingSpec, batch_graphs
from ggnn_tpu.models import ModelConfig, init_params, propagate
from ggnn_tpu.parallel import make_mesh, partition_batch, sharded_propagate


def make_random_batch(rng, n_graphs=4, n_edge_types=3, annotation_dim=2,
                      n_mult=16):
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(4, 12))
        m = int(rng.integers(2, 3 * n))
        edges = np.stack([rng.integers(0, n, m),
                          rng.integers(0, n_edge_types, m),
                          rng.integers(0, n, m)], axis=1)
        ann = (rng.random((n, annotation_dim)) < 0.5).astype(np.float32)
        graphs.append(dict(n_nodes=n, edges=edges, annotations=ann, targets={}))
    total_n = sum(g["n_nodes"] for g in graphs)
    spec = PaddingSpec(
        n_graphs=n_graphs,
        n_pad=((total_n + n_mult - 1) // n_mult) * n_mult,
        e_pad=2 * sum(g["edges"].shape[0] for g in graphs) + 8,
        n_edge_types=n_edge_types, annotation_dim=annotation_dim).round_up()
    return spec, batch_graphs(graphs, spec)


def test_device_count():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"


def test_partition_invariants(rng):
    spec, b = make_random_batch(rng, n_mult=8)
    parts = partition_batch(b, 8)
    assert parts.n_local * 8 == spec.n_pad
    # every real directed edge is present exactly once, on its dst's shard
    total = int(parts.edge_mask.sum())
    assert total == int(b.edge_mask.sum())
    for s in range(8):
        m = parts.edge_mask[s] > 0
        dst_g = parts.edge_dst_local[s, m] + s * parts.n_local
        assert (parts.edge_dst_local[s, m] >= 0).all()
        assert (parts.edge_dst_local[s, m] < parts.n_local).all()
        # halo remap round-trips to the global src id: coords past P·H are
        # self-edges reading h_local (the pool is [recv ∥ h_local])
        halo = parts.edge_src_halo[s, m]
        PH = 8 * parts.halo_size
        is_local = halo >= PH
        owner = np.where(is_local, s, halo // parts.halo_size)
        pos = halo % parts.halo_size
        src_back = np.where(
            is_local, s * parts.n_local + (halo - PH),
            owner * parts.n_local + parts.halo_send_idx[owner, s, pos])
        np.testing.assert_array_equal(src_back, parts.edge_src_global[s, m])
        # and self-edges are exactly the locally-owned sources
        np.testing.assert_array_equal(
            is_local, parts.edge_src_global[s, m] // parts.n_local == s)
        # edges sorted by type within shard
        et = parts.edge_type[s, m]
        assert (np.diff(et) >= 0).all()
        counts = np.bincount(et, minlength=spec.n_message_types)
        np.testing.assert_array_equal(np.diff(parts.type_offsets[s]), counts)
    # annotations reshaped consistently
    np.testing.assert_array_equal(
        parts.annotations.reshape(-1, spec.annotation_dim), b.annotations)


@pytest.mark.parametrize("strategy", ["all_gather", "halo", "halo_overlap"])
def test_sharded_propagate_matches_single_device(rng, strategy):
    spec, b = make_random_batch(rng, n_mult=8)
    cfg = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ref = np.asarray(propagate(
        params["prop"], cfg, b.annotations, b.edge_src, b.edge_dst,
        b.edge_type, b.edge_mask))

    mesh = make_mesh(n_graph=8)
    parts = partition_batch(b, 8)
    got = np.asarray(sharded_propagate(params["prop"], cfg, mesh, parts,
                                       strategy=strategy))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_propagate_other_shard_counts(rng, n_shards):
    spec, b = make_random_batch(rng, n_mult=n_shards * 8)
    cfg = ModelConfig(state_dim=4, annotation_dim=2, n_edge_types=3, n_steps=3)
    params = init_params(jax.random.PRNGKey(1), cfg)
    ref = np.asarray(propagate(
        params["prop"], cfg, b.annotations, b.edge_src, b.edge_dst,
        b.edge_type, b.edge_mask))
    mesh = make_mesh(n_graph=n_shards)
    parts = partition_batch(b, n_shards)
    got = np.asarray(sharded_propagate(params["prop"], cfg, mesh, parts,
                                       strategy="halo"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_sharded_propagate_halo_window(rng):
    """halo_window: per-shard windowed block-CSR local aggregation +
    typed halo-pool remote aggregation matches the single-device path
    (community graph partitioned along community boundaries)."""
    from ggnn_tpu.data.synthetic import synthetic_batch
    from ggnn_tpu.parallel.partition import split_local_remote
    b = synthetic_batch(1024, 6000, 3, annotation_dim=2, seed=3,
                        node_mult=1024, n_communities=8, p_intra=0.9)
    # adversarial: mask out every edge of the HIGHEST message type — the
    # layout must still address the model's full [2E·N]-row table (a
    # max-observed-type inference bug returned silently wrong states here)
    b.edge_mask[b.edge_type == 5] = 0.0
    cfg = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                      n_steps=3)
    params = init_params(jax.random.PRNGKey(2), cfg)
    ref = np.asarray(propagate(
        params["prop"], cfg, b.annotations, b.edge_src, b.edge_dst,
        b.edge_type, b.edge_mask))
    mesh = make_mesh(n_graph=8)
    parts = split_local_remote(partition_batch(b, 8))
    got = np.asarray(sharded_propagate(params["prop"], cfg, mesh, parts,
                                       strategy="halo_window"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_sharded_propagate_halo_window_uneven_spill(rng):
    """halo_window with NON-degenerate spill distributions: shards spill
    different edge counts, so the stacked per-shard spill arrays must be
    padded to common static shapes (16-aligned packs are per-topology
    unless spill_pad_tiles_to pins them — this raised ValueError on
    np.stack before the fix)."""
    from ggnn_tpu.data.synthetic import synthetic_batch
    from ggnn_tpu.parallel.partition import (build_halo_window_layouts,
                                             split_local_remote)
    b = synthetic_batch(1024, 6000, 3, annotation_dim=2, seed=5,
                        node_mult=1024, n_communities=8, p_intra=0.6)
    cfg = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                      n_steps=3)
    params = init_params(jax.random.PRNGKey(2), cfg)
    parts = split_local_remote(partition_batch(b, 8))
    # force heavy, uneven spill: most tiles fall below the threshold
    arrays, meta = build_halo_window_layouts(parts, window=64,
                                             min_edges_per_tile=2000,
                                             spill_tile_e=16)
    assert arrays["s_gather_idx"].ndim == 2  # stacked [P, E_pack_static]
    ref = np.asarray(propagate(
        params["prop"], cfg, b.annotations, b.edge_src, b.edge_dst,
        b.edge_type, b.edge_mask))
    mesh = make_mesh(n_graph=8)
    got = np.asarray(sharded_propagate(
        params["prop"], cfg, mesh, parts, strategy="halo_window",
        halo_layouts=(arrays, meta)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_window_layout_for_batch_static_shapes(rng):
    """Two different topologies under the same PaddingSpec produce
    identically-shaped layouts (the serving compile-once contract),
    including the 16-aligned spill pack."""
    import jax.tree_util as jtu

    from ggnn_tpu.data import TASKS, generate_task_file
    from ggnn_tpu.data.babi import parse_graph_text
    from ggnn_tpu.graph import PaddingSpec, batch_graphs
    from ggnn_tpu.ops.window_pallas import window_layout_for_batch

    spec = PaddingSpec(n_graphs=4, n_pad=128, e_pad=256, n_edge_types=4,
                       annotation_dim=1).round_up()
    text = generate_task_file(4, 12, seed=9)
    exs = parse_graph_text(text, TASKS[4])
    graphs = [dict(n_nodes=e.n_nodes, edges=e.edges,
                   annotations=np.zeros((e.n_nodes, 1), np.float32),
                   targets={}) for e in exs]
    shapes = []
    for batch in (batch_graphs(graphs[:4], spec),
                  batch_graphs(graphs[4:8], spec)):
        lay = window_layout_for_batch(batch, window=256,
                                      min_edges_per_tile=4, spill_tile_e=16)
        shapes.append({k: v.shape for k, v in lay.arrays.items()})
        shapes.append(lay.meta)
    assert shapes[0] == shapes[2], "array shapes differ across batches"
    assert shapes[1] == shapes[3], "meta differs across batches"


def test_sharded_train_step_grad_parity(rng):
    """value_and_grad THROUGH the shard_map (reverse all-to-all) matches
    single-device training gradients; one optimizer step agrees."""
    import optax
    from ggnn_tpu.parallel import make_sharded_train_step
    from ggnn_tpu.parallel.partition import split_local_remote

    spec, b = make_random_batch(rng, n_graphs=6, n_mult=8)
    parts = split_local_remote(partition_batch(b, 8))
    cfg = ModelConfig(state_dim=8, annotation_dim=spec.annotation_dim,
                      n_edge_types=spec.n_edge_types, n_steps=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop = params["prop"]
    optimizer = optax.adam(1e-2)
    opt0 = optimizer.init(prop)
    mesh = make_mesh(8)

    step = make_sharded_train_step(cfg, mesh, optimizer,
                                   strategy="halo_overlap")
    new_prop, _, loss_sh = step(prop, opt0, parts)

    import jax.numpy as jnp

    def loss_single(p):
        h = propagate(p, cfg, jnp.asarray(b.annotations),
                      jnp.asarray(b.edge_src), jnp.asarray(b.edge_dst),
                      jnp.asarray(b.edge_type), jnp.asarray(b.edge_mask))
        return jnp.sum(h * h)

    loss_ref, g_ref = jax.value_and_grad(loss_single)(prop)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-5)
    upd_ref, _ = optimizer.update(g_ref, optimizer.init(prop), prop)
    ref_prop = optax.apply_updates(prop, upd_ref)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=5e-4, atol=5e-5),
        new_prop, ref_prop)
