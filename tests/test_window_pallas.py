"""Windowed block-CSR aggregation (clustered-graph fast path): parity with
the XLA segment path on arbitrary topologies, spill handling, and layout
invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.models import ModelConfig, init_params
from ggnn_tpu.ops.segment import typed_aggregate
from ggnn_tpu.ops.window_pallas import aggregate_window, build_window_layout


def random_edges(rng, n_nodes, n_edges, n_types):
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    typ = rng.integers(0, n_types, n_edges).astype(np.int32)
    mask = np.ones(n_edges, np.float32)
    mask[rng.random(n_edges) < 0.1] = 0.0
    return src, dst, typ, mask


@pytest.mark.parametrize("min_edges", [1, 4, 10_000])
@pytest.mark.parametrize("row_major", ["block", "src", "type"])
def test_window_parity(rng, min_edges, row_major):
    """min_edges=1: everything windowed; 4: mixed window+spill;
    10000: everything spills — all three must match the XLA path."""
    N, E, T2, D = 256, 600, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=64,
                              min_edges_per_tile=min_edges, spill_tile_e=8,
                              n_message_types=T2, row_major=row_major)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_window(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_grad", [False, True])
def test_window_packed_parity(rng, with_grad):
    """int4-packed count streams (pack_counts=True): forward and backward
    match the XLA segment path; both directions report packed."""
    N, E, T2, D = 512, 3000, 4, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=2, spill_tile_e=8,
                              n_message_types=T2, block_rows=256,
                              with_grad=with_grad, pack_counts=True)
    assert lay.packed == (True, True)
    # packed stream is half-width
    assert lay.arrays["c_stream"].shape[1] == 128
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    w, b = params["prop"]["msg_w"], params["prop"]["msg_b"]
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask), w, b)
    got = aggregate_window(h, lay, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    if with_grad:
        tgt = jax.random.normal(jax.random.PRNGKey(2), (N, D))

        def loss(agg):
            def f(h, w, b):
                return jnp.sum((agg(h, w, b) - tgt) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(h, w, b)

        g_ref = loss(lambda h, w, b: typed_aggregate(
            h, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask), w, b))
        g_win = loss(lambda h, w, b: aggregate_window(
            h, lay, w, b, interpret=True))
        for a, c, name in zip(g_win, g_ref, ("dh", "dW", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-4, err_msg=name)


def test_window_packed_saturation_and_guards(rng):
    """Packing tightens the duplicate-pair saturation threshold to 15 (int4)
    and rejects windows too narrow to fill a 128-lane packed tile."""
    N = 512
    # 20 duplicates of one edge: fits int8 (127) but not int4 (15)
    src = np.full(20, 3, np.int32)
    dst = np.full(20, 7, np.int32)
    typ = np.ones(20, np.int32)
    mask = np.ones(20, np.float32)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=1, n_message_types=4,
                              pack_counts=True)
    assert lay.stats["spill_frac"] == 1.0
    lay8 = build_window_layout(src, dst, typ, mask, N, window=256,
                               min_edges_per_tile=1, n_message_types=4)
    assert lay8.stats["spill_frac"] == 0.0
    with pytest.raises(ValueError, match="window >= 256"):
        build_window_layout(src, dst, typ, mask, N, window=128,
                            n_message_types=4, pack_counts=True)
    # block_rows=128 < 256: forward packs, backward stays unpacked
    lay_bw = build_window_layout(src[:1], dst[:1], typ[:1], mask[:1], N,
                                 window=256, min_edges_per_tile=1,
                                 n_message_types=4, with_grad=True,
                                 pack_counts=True)
    assert lay_bw.packed == (True, False)


@pytest.mark.parametrize("pack,min_edges,row_major",
                         [(False, 3, "src"), (True, 3, "block"),
                          (False, 150, "block"), (False, 10_000, "src")])
def test_fused_gru_step_parity(rng, pack, min_edges, row_major):
    """gru_window_step (window accumulate + in-kernel GRU epilogue) matches
    the unfused aggregate_window + gru_update step — all-dense (3), mixed
    window+spill (150), and all-spill/init-only (10000); src- and
    block-major table orders."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step
    N, E, T2, D = 512, 3000, 4, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=min_edges, spill_tile_e=8,
                              n_message_types=T2, block_rows=256,
                              pack_counts=pack, row_major=row_major)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop = params["prop"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    a = aggregate_window(h, lay, prop["msg_w"], prop["msg_b"],
                         interpret=True)
    ref = gru_update(prop["gru"], h, a)
    got = gru_window_step(h, lay, prop["msg_w"], prop["msg_b"], prop["gru"],
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantized_step_extra_init_no_spill(rng):
    """quantized + extra_init on a layout with NO spill population: the
    init stream must come from extra_init alone (a round-6 review found
    the branch keyed on has_init and reached for s_gather_idx that a
    spill-free layout does not have)."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step
    N, E, T2, D, W = 256, 3000, 4, 128, 256
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=W,
                              min_edges_per_tile=1, n_message_types=T2,
                              block_rows=256, row_major="block")
    assert lay.meta[4] is None  # genuinely spill-free
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop = params["prop"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    extra = jax.random.normal(jax.random.PRNGKey(2), (N, D)) * 0.1
    a = aggregate_window(h, lay, prop["msg_w"], prop["msg_b"],
                         interpret=True)
    ref = gru_update(prop["gru"], h, a + extra)
    got = gru_window_step(h, lay, prop["msg_w"], prop["msg_b"],
                          prop["gru"], interpret=True, quantized=True,
                          extra_init=extra)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.08)
    assert float(jnp.mean(jnp.abs(got - ref))) < 1e-2


@pytest.mark.parametrize("min_edges,typed_spill",
                         [(2, False), (120, False), (120, True)])
def test_quantized_fused_step(rng, min_edges, typed_spill):
    """int8-quantized serving step (power-of-2 per-window scales, int8 MXU
    dots; values-only table + scales-vector spill dequant since round 6)
    tracks the f32 step within quantization tolerance; with the XW typed
    spill the spilled contribution is exact (gathers bf16 h, never the
    q8 table)."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import (gru_window_step,
                                            node_table_block_major_q8)
    N, E, T2, D, W = 256, 3000, 4, 128, 256
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=W,
                              min_edges_per_tile=min_edges, spill_tile_e=16,
                              n_message_types=T2, block_rows=256,
                              row_major="block", typed_spill=typed_spill)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop = params["prop"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    # table-level check: dequantized table tracks the f32 table
    tq, scales = node_table_block_major_q8(h, prop["msg_w"], prop["msg_b"],
                                           window=W, interpret=True)
    assert tq.shape == (N * T2, D) and scales.shape == (N * T2 // W, 1)
    from ggnn_tpu.ops.window_pallas import _node_table
    tf = _node_table(h, prop["msg_w"], prop["msg_b"], "block", True)
    deq = np.asarray(tq, np.float32) \
        * np.repeat(np.asarray(scales)[:, 0], W)[:, None]
    err = np.abs(deq - np.asarray(tf))
    lim = np.repeat(np.asarray(scales)[:, 0], W)[:, None]  # 1 LSB per window
    assert (err <= lim * 0.500001).all()
    # step-level parity within quantization noise
    a = aggregate_window(h, lay, prop["msg_w"], prop["msg_b"],
                         interpret=True)
    ref = gru_update(prop["gru"], h, a)
    got = gru_window_step(h, lay, prop["msg_w"], prop["msg_b"], prop["gru"],
                          interpret=True, quantized=True)
    # int8 window-scale noise propagated through the GRU gates: bounded
    # absolute deviation (relative blows up near zero crossings)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.08)
    assert float(jnp.mean(jnp.abs(got - ref))) < 1e-2


def test_propagate_fused_backend(rng):
    """Full T-step propagation with backend='window', fuse_gru=True matches
    the XLA path (scan, layout through jit args)."""
    from ggnn_tpu.models import propagate
    N, E, T2 = 512, 2500, 6
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=3, spill_tile_e=8,
                              n_message_types=T2, block_rows=256)
    mk = dict(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=3)
    cfg_x = ModelConfig(**mk)
    cfg_f = ModelConfig(**mk, backend="window", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(4), cfg_x)
    ann = jnp.asarray((np.random.default_rng(0).random((N, 2)) < 0.5)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))
    ref = propagate(params["prop"], cfg_x, *args)

    @jax.jit
    def run(p, lay, *args):
        return propagate(p, cfg_f, *args, scatter_layout=lay)

    got = run(params["prop"], lay, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("min_edges", [180, 10_000])
def test_window_spill_edge_align(rng, min_edges):
    """16-aligned spill packing (gather reads ~real rows; scatter tiles at
    win_stride offsets, overlapping reads) matches the XLA path — partial
    (180) and full (10000) spill."""
    N, E, T2, D = 512, 3000, 4, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=min_edges, spill_tile_e=16,
                              n_message_types=T2, block_rows=256,
                              force_spill=True)
    assert 0 < lay.stats["spill_frac"] <= 1.0
    assert "s_tile_msg_off" in lay.arrays
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_window(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # fused step through the aligned spill init
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step
    ref_h = gru_update(params["prop"]["gru"], h, got)
    got_h = gru_window_step(h, lay, params["prop"]["msg_w"],
                            params["prop"]["msg_b"], params["prop"]["gru"],
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               rtol=2e-5, atol=2e-5)


def test_window_layout_stats(rng):
    """Community graph: dense tiles capture the intra-community mass and
    the spill fraction tracks the cross-community rate."""
    from ggnn_tpu.data.synthetic import synthetic_batch
    b = synthetic_batch(4096, 40_000, 4, annotation_dim=2, seed=0,
                        node_mult=128, n_communities=16, p_intra=0.95)
    lay = build_window_layout(b.edge_src, b.edge_dst, b.edge_type,
                              b.edge_mask, b.spec.n_pad, window=256,
                              min_edges_per_tile=8)
    assert lay.stats["spill_frac"] < 0.25
    # sparse uniform graph (realistic node/edge ratio): nearly everything
    # spills — the builder correctly routes it to the per-edge path
    u = synthetic_batch(32_768, 40_000, 4, annotation_dim=2, seed=0,
                        node_mult=128)
    lay_u = build_window_layout(u.edge_src, u.edge_dst, u.edge_type,
                                u.edge_mask, u.spec.n_pad, window=256,
                                min_edges_per_tile=8)
    assert lay_u.stats["spill_frac"] > 0.9


def test_window_kernel_variants_agree(rng):
    """Auto-pipelined and manual-DMA-ring kernels produce identical
    results (incl. n_progs>1 and bpp=1 edge cases)."""
    from ggnn_tpu.ops.window_pallas import (window_block_spmm,
                                            window_block_spmm_mono)
    N, E, T2, D, W = 512, 900, 4, 16, 64
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=W,
                              min_edges_per_tile=1)
    a = lay.arrays
    R = T2 * N
    table = jnp.asarray(rng.standard_normal(
        (R + (-R) % W, D)).astype(np.float32))
    ref = np.asarray(window_block_spmm(
        table, a["c_stream"], a["tile_start"], a["block_of_tile"],
        a["win_of_tile"], n_blocks=lay.n_blocks, window=W,
        c_off=a["c_off"], interpret=True))
    for n_progs, nbuf in ((1, 4), (2, 2), (lay.n_blocks, 3)):
        got = window_block_spmm_mono(
            table, a["c_stream"], a["tile_start"], a["block_of_tile"],
            a["win_of_tile"], n_blocks=lay.n_blocks, window=W,
            n_progs=n_progs, nbuf=nbuf, c_off=a["c_off"], interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6,
                                   atol=1e-6, err_msg=f"{n_progs},{nbuf}")


def test_propagate_window_backend(rng):
    """Full T-step propagation with backend='window' matches the XLA path
    (layout through jit args, mixed window+spill)."""
    from ggnn_tpu.models import propagate
    N, E, T2 = 256, 500, 6
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=64,
                              min_edges_per_tile=4, spill_tile_e=8)
    cfg_x = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                        n_steps=3)
    cfg_w = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                        n_steps=3, backend="window")
    params = init_params(jax.random.PRNGKey(4), cfg_x)
    ann = jnp.asarray((np.random.default_rng(0).random((N, 2)) < 0.5)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))
    ref = propagate(params["prop"], cfg_x, *args)

    @jax.jit
    def run(p, lay, *args):
        return propagate(p, cfg_w, *args, scatter_layout=lay)

    got = run(params["prop"], lay, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("row_major,window",
                         [("block", 64), ("block", 128), ("block", 256),
                          ("src", 64), ("type", 64)])
def test_window_grad_parity(rng, row_major, window):
    """jax.grad through aggregate_window matches the XLA segment path.
    row_major='block' with window % 128 == 0 exercises the FUSED backward
    kernel (dh/dW epilogue, in-degree db); the others exercise the
    Y-materializing fallback + one-hot spill backward."""
    N, E, T2, D = 256, 600, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=window,
                              min_edges_per_tile=4, spill_tile_e=8,
                              n_message_types=T2, row_major=row_major,
                              with_grad=True)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    w, b = params["prop"]["msg_w"], params["prop"]["msg_b"]
    tgt = jax.random.normal(jax.random.PRNGKey(2), (N, D))

    def loss_ref(h, w, b):
        out = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(typ), jnp.asarray(mask), w, b)
        return jnp.sum((out - tgt) ** 2)

    def loss_win(h, w, b):
        out = aggregate_window(h, lay, w, b, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    g_win = jax.grad(loss_win, argnums=(0, 1, 2))(h, w, b)
    for a, c, name in zip(g_win, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_window_grad_parity_dummy_first_windows(rng):
    """REGRESSION: fused backward with sparse-ish kept tiles, where many
    backward windows' first tile is the zero-init dummy (no real tile at
    dst block 0) — the fused kernel must zero acc before accumulating
    (caught by the numpy-oracle verify: dh was 36% off without it)."""
    N, E, T2, D = 384, 2000, 4, 64
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=128,
                              min_edges_per_tile=40, spill_tile_e=8,
                              n_message_types=T2, row_major="block",
                              with_grad=True, force_spill=True)
    assert 0 < lay.stats["spill_frac"] < 0.5
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (N, D))

    def loss_ref(h, w, b):
        out = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(typ), jnp.asarray(mask), w, b)
        return jnp.sum((out - tgt) ** 2)

    def loss_win(h, w, b):
        out = aggregate_window(h, lay, w, b, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    g_win = jax.grad(loss_win, argnums=(0, 1, 2))(h, w, b)
    for a, c, name in zip(g_win, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_window_grad_parity_straddle(rng):
    """Windows that straddle src-block boundaries (T2·128 not a multiple
    of W: T2=3, W=256): the block-level fused backward doesn't apply —
    the gate must route to the Y-materializing fallback, bit-correctly."""
    N, E, T2, D = 256, 700, 3, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=4, spill_tile_e=8,
                              n_message_types=T2, row_major="block",
                              with_grad=True)
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (N, D))

    def loss_ref(h, w, b):
        out = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(typ), jnp.asarray(mask), w, b)
        return jnp.sum((out - tgt) ** 2)

    def loss_win(h, w, b):
        out = aggregate_window(h, lay, w, b, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    g_win = jax.grad(loss_win, argnums=(0, 1, 2))(h, w, b)
    for a, c, name in zip(g_win, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_window_backend_train_step(rng):
    """End-to-end: jitted value_and_grad through propagate backend='window'
    (scan over T steps, layout through jit args) matches the XLA backend."""
    N, E, T2 = 256, 500, 6
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=64,
                              min_edges_per_tile=4, spill_tile_e=8,
                              n_message_types=T2, with_grad=True)
    from ggnn_tpu.models import propagate
    mk = dict(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=3)
    params = init_params(jax.random.PRNGKey(4), ModelConfig(**mk))
    ann = jnp.asarray((np.random.default_rng(1).random((N, 2)) < 0.5)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))

    def grads(backend, lay=None):
        cfg = ModelConfig(**mk, backend=backend)

        @jax.jit
        def loss(p, lay, *args):
            h = propagate(p, cfg, *args, scatter_layout=lay)
            return jnp.sum(h * h)

        return jax.grad(loss)(params["prop"], lay, *args)

    g_ref = grads("xla")
    g_win = grads("window", lay)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=3e-4, atol=3e-5), g_win, g_ref)


def test_window_layout_jit_argument(rng):
    """The layout passes through jit arguments as a pytree (remote-compile
    payload rule: no big trace constants)."""
    N, E, T2, D = 256, 400, 4, 16
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=64,
                              min_edges_per_tile=2, spill_tile_e=8)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(2), cfg)
    h = jax.random.normal(jax.random.PRNGKey(3), (N, D))

    @jax.jit
    def run(h, lay, w, b):
        return aggregate_window(h, lay, w, b, interpret=True)

    got = run(h, lay, params["prop"]["msg_w"], params["prop"]["msg_b"])
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_window_layout_degenerate(rng):
    """Empty and single-edge graphs build valid layouts (dummy tiles only)
    and aggregate to the correct (zero) result."""
    N, D = 256, 16
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    # zero real edges
    lay = build_window_layout(np.zeros(4, np.int32), np.zeros(4, np.int32),
                              np.zeros(4, np.int32), np.zeros(4, np.float32),
                              N, window=64, n_message_types=4,
                              force_spill=True)
    out = aggregate_window(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # one real edge, duplicated 200x (int8 saturation -> spill)
    src = np.full(200, 3, np.int32)
    dst = np.full(200, 7, np.int32)
    typ = np.ones(200, np.int32)
    mask = np.ones(200, np.float32)
    lay2 = build_window_layout(src, dst, typ, mask, N, window=64,
                               min_edges_per_tile=1, n_message_types=4)
    assert lay2.stats["spill_frac"] == 1.0  # >127 duplicates spill
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_window(h, lay2, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("min_edges", [1, 4, 10_000])
@pytest.mark.parametrize("row_major", ["block", "src"])
def test_window_typed_spill_parity(rng, min_edges, row_major):
    """typed_spill=True: the spill gathers h directly and applies W_t in
    the scatter kernel (small-footprint gather, VERDICT r1 #4) — forward,
    grads, and the fused-GRU serving step all match the XLA path across
    none/mixed/full spill regimes."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step

    N, E, T2, D = 256, 600, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=64,
                              min_edges_per_tile=min_edges, spill_tile_e=16,
                              n_message_types=T2, row_major=row_major,
                              with_grad=True, force_spill=True,
                              typed_spill=True)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    W, b = params["prop"]["msg_w"], params["prop"]["msg_b"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (N, D))

    def loss_ref(h, W, b):
        a = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(typ), jnp.asarray(mask), W, b)
        return jnp.sum((a - tgt) ** 2)

    def loss_win(h, W, b):
        a = aggregate_window(h, lay, W, b, interpret=True)
        return jnp.sum((a - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h, W, b)
    v_got, g_got = jax.value_and_grad(loss_win, argnums=(0, 1, 2))(h, W, b)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for a, r, name in zip(g_got, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)

    # fused-GRU serving step rides the typed spill init
    gru = params["prop"]["gru"]
    a_ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(typ), jnp.asarray(mask), W, b)
    ref_h = gru_update(gru, h, a_ref)
    got_h = gru_window_step(h, lay, W, b, gru, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("min_edges,window", [(1, 128), (4, 256),
                                              (10_000, 128)])
def test_window_on_demand_parity(rng, min_edges, window):
    """on_demand=True: table windows built in VMEM from streamed h blocks
    (no [T2·N, D] table in HBM — VERDICT r1 #3); forward + grads match the
    XLA path across none/mixed/full spill regimes."""
    N, E, T2, D = 256, 600, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=window,
                              min_edges_per_tile=min_edges, spill_tile_e=16,
                              n_message_types=T2, row_major="block",
                              with_grad=True, force_spill=True,
                              typed_spill=True, on_demand=True)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    W, b = params["prop"]["msg_w"], params["prop"]["msg_b"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (N, D))

    def loss_ref(h, W, b):
        a = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(typ), jnp.asarray(mask), W, b)
        return jnp.sum((a - tgt) ** 2)

    def loss_win(h, W, b):
        a = aggregate_window(h, lay, W, b, interpret=True)
        return jnp.sum((a - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h, W, b)
    v_got, g_got = jax.value_and_grad(loss_win, argnums=(0, 1, 2))(h, W, b)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for a, r, name in zip(g_got, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("window,block_rows", [(128, 128), (512, 256)])
def test_window_on_demand_fused_gru(rng, window, block_rows):
    """gru_window_step on an on_demand layout: the fused kernel builds
    table windows in VMEM AND runs the GRU epilogue — matches the
    XLA aggregation + GRU cell."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step

    N, E, T2, D = 256, 600, 8, 128
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=window,
                              min_edges_per_tile=2, spill_tile_e=16,
                              n_message_types=T2, row_major="block",
                              force_spill=True, typed_spill=True,
                              on_demand=True, block_rows=block_rows)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    W, b = params["prop"]["msg_w"], params["prop"]["msg_b"]
    gru = params["prop"]["gru"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    a_ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                            jnp.asarray(typ), jnp.asarray(mask), W, b)
    ref_h = gru_update(gru, h, a_ref)
    got = gru_window_step(h, lay, W, b, gru, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_h),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("min_edges,on_demand",
                         [(3, False), (150, False), (3, True), (150, True)])
def test_fused_gru_step_grads(rng, min_edges, on_demand):
    """value_and_grad through the TRAINABLE fused step (the emit_res
    custom VJP: the kernel also writes an (a|z|r|h̃) residual stream and
    the backward reuses gru_cell_bwd + the fused window backward) matches
    the unfused aggregate_window + gru_update step for every input —
    h, msg_w, msg_b, and all GRU weights; dense and window+spill mixes,
    with and without on-demand table windows."""
    from ggnn_tpu.models.ggnn import gru_update
    from ggnn_tpu.ops.window_pallas import gru_window_step
    N, E, T2, D = 512, 3000, 4, 128
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_window_layout(src, dst, typ, mask, N, window=256,
                              min_edges_per_tile=min_edges, spill_tile_e=8,
                              n_message_types=T2, block_rows=256,
                              with_grad=True, row_major="block",
                              typed_spill=on_demand, on_demand=on_demand)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    prop = params["prop"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))

    def loss_fused(h, msg_w, msg_b, gru):
        return jnp.sum(gru_window_step(h, lay, msg_w, msg_b, gru,
                                       interpret=True) ** 2)

    def loss_ref(h, msg_w, msg_b, gru):
        a = aggregate_window(h, lay, msg_w, msg_b, interpret=True)
        return jnp.sum(gru_update(gru, h, a) ** 2)

    args = (h, prop["msg_w"], prop["msg_b"], prop["gru"])
    vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for got, ref in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_prefer_xw_spill_regimes():
    """Auto spill heuristic (VERDICT r3 #2): XW only for on-demand
    (required — no table) and for q8 under the measured ~100 MB gather
    cliff; legacy table-gather everywhere else (round-6 matrix)."""
    from ggnn_tpu.ops.window_pallas import prefer_xw_spill
    # on_demand always XW
    assert prefer_xw_spill(1_000_192, 128, on_demand=True)
    # bf16 table mode: legacy at both scales
    assert not prefer_xw_spill(262_144, 128)
    assert not prefer_xw_spill(1_000_192, 128)
    # q8: XW at 262K (h 67 MB, under the cliff), legacy at 1M (256 MB)
    assert prefer_xw_spill(262_144, 128, quantized=True)
    assert not prefer_xw_spill(1_000_192, 128, quantized=True)
