"""One-hot MXU segment-scatter kernel tests (interpret mode on CPU):
layout invariants and parity with the XLA segment path / oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.graph import PaddingSpec, batch_graphs
from ggnn_tpu.models import ModelConfig, init_params, propagate
from ggnn_tpu.ops.scatter_pallas import (
    BLOCK_N, aggregate_onehot, build_dst_block_layout, onehot_segment_scatter)
from ggnn_tpu.ops.segment import typed_aggregate


def random_edges(rng, n_nodes, n_edges, n_types):
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    typ = rng.integers(0, n_types, n_edges).astype(np.int32)
    mask = np.ones(n_edges, np.float32)
    # sprinkle padding edges
    pad = rng.random(n_edges) < 0.1
    mask[pad] = 0.0
    return src, dst, typ, mask


def test_layout_invariants(rng):
    N, E, T2 = 256, 500, 6
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_dst_block_layout(src, dst, typ, mask, N, tile_e=8)
    # every real edge appears once with correct (gather_idx, dst) pairing
    real = mask > 0
    want = sorted(zip((typ[real].astype(np.int64) * N + src[real]).tolist(),
                      dst[real].tolist()))
    got = []
    for pos in range(lay.gather_idx.shape[0]):
        if lay.dst_local[pos] >= 0:
            tile = pos // lay.tile_e
            block = int(np.searchsorted(lay.tile_start, tile, "right")) - 1
            got.append((int(lay.gather_idx[pos]),
                        int(lay.dst_local[pos]) + block * BLOCK_N))
    assert sorted(got) == want
    assert lay.max_tiles >= 1
    assert int(lay.tile_start[-1]) * lay.tile_e == lay.gather_idx.shape[0]


def test_scatter_kernel_matches_segment_sum(rng):
    N, D = 256, 16
    E_pack, tile_e = 64, 8
    msgs = rng.standard_normal((E_pack, D)).astype(np.float32)
    # two blocks of edges: block 0 tiles [0,4), block 1 tiles [4, 8)
    tile_start = np.array([0, 4, 8], np.int32)
    dst_local = rng.integers(0, BLOCK_N, E_pack).astype(np.int32)
    dst_local[rng.random(E_pack) < 0.2] = -1  # padding
    out = onehot_segment_scatter(
        jnp.asarray(msgs), jnp.asarray(dst_local), jnp.asarray(tile_start),
        n_blocks=2, max_tiles=4, tile_e=tile_e, interpret=True)
    # reference
    ref = np.zeros((2 * BLOCK_N, D), np.float32)
    for pos in range(E_pack):
        if dst_local[pos] >= 0:
            block = 0 if pos // tile_e < 4 else 1
            ref[block * BLOCK_N + dst_local[pos]] += msgs[pos]
    np.testing.assert_allclose(np.asarray(out)[:2 * BLOCK_N], ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("row_order", ["type", "block"])
def test_aggregate_onehot_matches_xla(rng, row_order):
    N, E, T2, D = 256, 700, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_dst_block_layout(src, dst, typ, mask, N, tile_e=8,
                                 n_message_types=T2, row_order=row_order)
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_onehot(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tile_e,align", [(16, 16), (32, 16), (16, 8)])
def test_aggregate_onehot_edge_align(rng, tile_e, align):
    """16-aligned packing (gather reads ~real rows; mono scatter at
    win_stride offsets) matches the XLA path and shrinks the pack."""
    N, E, T2, D = 256, 700, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay_pad = build_dst_block_layout(src, dst, typ, mask, N, tile_e=tile_e)
    lay = build_dst_block_layout(src, dst, typ, mask, N, tile_e=tile_e,
                                 edge_align=align)
    # pack shrinks modulo the one-tile overrun safety margin (dominant
    # only at toy scales like this one)
    assert (lay.gather_idx.shape[0]
            <= lay_pad.gather_idx.shape[0] + tile_e)
    assert lay.tile_msg_off is not None
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_onehot(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("tile_e", [16, 32])
def test_aggregate_onehot_dstl_stream(rng, tile_e):
    """dstl_stream layouts (one-hot SYNTHESIZED in-kernel from the
    compact i32 dst-local stream) match the XLA path, and the side
    stream really is the compact form (no int8 matrix)."""
    N, E, T2, D = 256, 700, 6, 32
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_dst_block_layout(src, dst, typ, mask, N, tile_e=tile_e,
                                 edge_align=16, dstl_stream=True)
    assert lay.onehot is None and lay.dstl is not None
    assert lay.dstl.dtype == np.int32
    assert lay.dstl.shape[1] == tile_e
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask),
                          params["prop"]["msg_w"], params["prop"]["msg_b"])
    got = aggregate_onehot(h, lay, params["prop"]["msg_w"],
                           params["prop"]["msg_b"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_variants_agree(rng):
    """All scatter kernel variants (id-based 2-D grid, int8-stream 2-D
    grid, flat 1-D grid, looped-DMA) produce identical results."""
    from ggnn_tpu.ops.scatter_pallas import (
        onehot_segment_scatter_flat, onehot_segment_scatter_loopT,
        onehot_segment_scatter_mono, onehot_segment_scatter_stream)
    import jax.numpy as jnp

    N, E, T2 = 256, 500, 4
    src, dst, typ, mask = random_edges(rng, N, E, T2)
    lay = build_dst_block_layout(src, dst, typ, mask, N, tile_e=8)
    msgs = jnp.asarray(rng.standard_normal(
        (lay.gather_idx.shape[0], 16)).astype(np.float32))
    dl = jnp.asarray(lay.dst_local)
    oh = jnp.asarray(lay.onehot)
    ts = jnp.asarray(lay.tile_start)
    bt = jnp.asarray(lay.block_of_tile)
    ref = np.asarray(onehot_segment_scatter(
        msgs, dl, ts, n_blocks=lay.n_blocks, max_tiles=lay.max_tiles,
        tile_e=8, interpret=True))
    for name, out in (
        ("stream", onehot_segment_scatter_stream(
            msgs, oh, ts, n_blocks=lay.n_blocks, max_tiles=lay.max_tiles,
            tile_e=8, interpret=True)),
        ("flat", onehot_segment_scatter_flat(
            msgs, oh, ts, bt, n_blocks=lay.n_blocks, tile_e=8,
            interpret=True)),
        ("loopT", onehot_segment_scatter_loopT(
            msgs, oh, ts, n_blocks=lay.n_blocks, tile_e=8, interpret=True)),
        ("mono1", onehot_segment_scatter_mono(
            msgs, oh, ts, bt, n_blocks=lay.n_blocks, tile_e=8, n_progs=1,
            nbuf=3, interpret=True)),
        ("mono2", onehot_segment_scatter_mono(
            msgs, oh, ts, bt, n_blocks=lay.n_blocks, tile_e=8,
            n_progs=lay.n_blocks // 1, nbuf=2, interpret=True)),
    ):
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6,
                                   atol=1e-6, err_msg=name)


def test_propagate_onehot_backend(rng):
    graphs = []
    for _ in range(3):
        n = int(rng.integers(5, 12))
        m = int(rng.integers(3, 2 * n))
        edges = np.stack([rng.integers(0, n, m), rng.integers(0, 3, m),
                          rng.integers(0, n, m)], axis=1)
        ann = (rng.random((n, 2)) < 0.5).astype(np.float32)
        graphs.append(dict(n_nodes=n, edges=edges, annotations=ann, targets={}))
    spec = PaddingSpec(n_graphs=3, n_pad=BLOCK_N,
                       e_pad=2 * sum(g["edges"].shape[0] for g in graphs) + 4,
                       n_edge_types=3, annotation_dim=2).round_up()
    b = batch_graphs(graphs, spec)
    cfg_x = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=3)
    cfg_o = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=3,
                        backend="onehot")
    params = init_params(jax.random.PRNGKey(2), cfg_x)
    args = (jnp.asarray(b.annotations), jnp.asarray(b.edge_src),
            jnp.asarray(b.edge_dst), jnp.asarray(b.edge_type),
            jnp.asarray(b.edge_mask))
    ref = propagate(params["prop"], cfg_x, *args)
    got = propagate(params["prop"], cfg_o, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("tile_e", [128, 256])
def test_typed_pack_aggregate_parity(rng, tile_e):
    """Typed-pack path (gather h directly, W_t inside the kernel on
    single-type tiles, in-degree bias) matches the XLA segment path,
    forward and gradients."""
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    N, E, T2, D = 384, 3000, 6, 64
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    typ = rng.integers(0, T2, E).astype(np.int32)
    mask = (rng.random(E) < 0.9).astype(np.float32)
    lay = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                 tile_e=tile_e, with_grad=True)
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask), w, b)
    got = aggregate_onehot(h, lay, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (N, D))

    def loss(agg):
        def f(h, w, b):
            return jnp.sum((agg(h, w, b) - tgt) ** 2)
        return f

    g_ref = jax.grad(loss(lambda h, w, b: typed_aggregate(
        h, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
        jnp.asarray(mask), w, b)), argnums=(0, 1, 2))(h, w, b)
    g_new = jax.grad(loss(lambda h, w, b: aggregate_onehot(
        h, lay, w, b, interpret=True)), argnums=(0, 1, 2))(h, w, b)
    for a, c, name in zip(g_new, g_ref, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_typed_pack_chunked_parity(rng):
    """SMEM-capped CHUNKED typed path (smem_tile_cap forces multiple
    pallas_calls over disjoint dst-block ranges — the 1M-node regime
    where 125K prefetch tiles overflow the 1 MB SMEM): forward, fused
    step, and gradients all match the un-chunked layout bit-for-bit."""
    from ggnn_tpu.models import propagate
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    N, E, T, D = 512, 4000, 3, 128
    T2 = 2 * T
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    typ = rng.integers(0, T2, E).astype(np.int32)
    mask = (rng.random(E) < 0.9).astype(np.float32)
    # block_mode=False: SMEM chunking is a per-TILE-kernel concept (the
    # round-8 block kernel has its own slot cap and no tile_start)
    lay_1 = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, block_mode=False)
    lay_c = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, smem_tile_cap=8,
                                   block_mode=False)
    assert lay_1.meta[8] is None and lay_c.meta[8] is not None
    assert len(lay_c.meta[8]) >= 2          # actually chunked
    assert lay_c.grad_meta[5] is not None   # grad layout chunked too
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))

    ref = aggregate_onehot(h, lay_1, w, b, interpret=True)
    got = aggregate_onehot(h, lay_c, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def loss(lay):
        def f(h, w, b):
            return jnp.sum(aggregate_onehot(h, lay, w, b,
                                            interpret=True) ** 2)
        return f

    g_ref = jax.grad(loss(lay_1), argnums=(0, 1, 2))(h, w, b)
    g_new = jax.grad(loss(lay_c), argnums=(0, 1, 2))(h, w, b)
    for a, c, name in zip(g_new, g_ref, ("dh", "dW", "db")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=name)

    # fused step (typed_step_gru) through the chunked layout
    cfg_f = ModelConfig(state_dim=D, annotation_dim=4, n_edge_types=T,
                        n_steps=2, backend="onehot", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(0), cfg_f)
    ann = jnp.asarray((np.random.default_rng(1).random((N, 4)) < 0.4)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))
    out_1 = propagate(params["prop"], cfg_f, *args, scatter_layout=lay_1)
    out_c = propagate(params["prop"], cfg_f, *args, scatter_layout=lay_c)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_1))


@pytest.mark.parametrize("seed,cap", [(1, 5), (2, 11), (3, 23)])
def test_typed_pack_chunked_fuzz(seed, cap):
    """Fuzz the chunk-boundary machinery: random graphs × odd SMEM caps
    must stay bit-identical to the un-chunked layout (fwd + dh)."""
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    r = np.random.default_rng(seed)
    N = 128 * int(r.integers(2, 6))
    E, T2, D = int(r.integers(500, 4000)), int(r.integers(2, 9)), 128
    src = r.integers(0, N, E).astype(np.int32)
    dst = r.integers(0, N, E).astype(np.int32)
    typ = r.integers(0, T2, E).astype(np.int32)
    mask = (r.random(E) < 0.85).astype(np.float32)
    lay_1 = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, block_mode=False)
    lay_c = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, smem_tile_cap=cap,
                                   block_mode=False)
    w = jax.random.normal(jax.random.PRNGKey(seed), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(seed + 1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (N, D))
    ref = aggregate_onehot(h, lay_1, w, b, interpret=True)
    got = aggregate_onehot(h, lay_c, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    g_r = jax.grad(lambda hh: jnp.sum(aggregate_onehot(
        hh, lay_1, w, b, interpret=True) ** 2))(h)
    g_c = jax.grad(lambda hh: jnp.sum(aggregate_onehot(
        hh, lay_c, w, b, interpret=True) ** 2))(h)
    np.testing.assert_array_equal(np.asarray(g_c), np.asarray(g_r))


def test_typed_fused_step_parity_and_grads(rng):
    """Fused typed step (onehot backend + cfg.fuse_gru: GRU in the
    scatter kernel's epilogue, custom VJP whose fwd rule recomputes the
    unfused composition) — the T-step propagation matches the unfused
    onehot path in value AND in value_and_grad for every parameter."""
    from ggnn_tpu.models import propagate
    from ggnn_tpu.ops.scatter_pallas import build_typed_dst_layout
    N, E, T, D = 512, 3000, 3, 128
    T2 = 2 * T
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    typ = rng.integers(0, T2, E).astype(np.int32)
    mask = (rng.random(E) < 0.9).astype(np.float32)
    lay = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                 with_grad=True)
    mk = dict(state_dim=D, annotation_dim=4, n_edge_types=T, n_steps=3,
              backend="onehot")
    cfg_f = ModelConfig(**mk, fuse_gru=True)
    cfg_u = ModelConfig(**mk)
    params = init_params(jax.random.PRNGKey(0), cfg_u)
    ann = jnp.asarray((np.random.default_rng(1).random((N, 4)) < 0.4)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))

    # serving value: primal fused kernel vs unfused path
    got = propagate(params["prop"], cfg_f, *args, scatter_layout=lay)
    ref = propagate(params["prop"], cfg_u, *args, scatter_layout=lay)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(cfg):
        def f(p):
            h = propagate(p, cfg, *args, scatter_layout=lay)
            return jnp.sum(h * h)
        return f

    vf, gf = jax.value_and_grad(loss(cfg_f))(params["prop"])
    vr, gr = jax.value_and_grad(loss(cfg_u))(params["prop"])
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a_, b_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_typed_span_mode_parity():
    """SPAN mode (opt-in, round 7): per-block h DMA + provable dynamic
    VMEM slices must be bit-identical to the per-tile-DMA default."""
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    r = np.random.default_rng(3)
    N, E, T2, D = 640, 9000, 5, 128
    src = r.integers(0, N, E).astype(np.int32)
    dst = r.integers(0, N, E).astype(np.int32)
    typ = r.integers(0, T2, E).astype(np.int32)
    mask = (r.random(E) < 0.9).astype(np.float32)
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    lay = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                 span_mode=False, block_mode=False)
    lay_s = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   span_mode=True, block_mode=False)
    assert lay.meta[9] is None and lay_s.meta[9] is not None
    # 'auto' span (with block mode held off) enables span for un-chunked
    # layouts, drops it for chunked ones (the certified-bad combination)
    lay_a = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   block_mode=False)
    assert lay_a.meta[9] is not None
    lay_c = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   smem_tile_cap=5, block_mode=False)
    assert lay_c.meta[8] is not None and lay_c.meta[9] is None
    assert "blk_off16" not in lay_c.arrays
    ref = aggregate_onehot(h, lay, w, b, interpret=True)
    got = aggregate_onehot(h, lay_s, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_typed_block_mode_parity():
    """Round-8 per-BLOCK kernel (static (type, chunk) inner loop): the
    default 'auto' layout must engage it on hub-free graphs and be
    BIT-identical to the per-tile kernel (same accumulation order), for
    the plain scatter, the fused GRU step, and gradients."""
    from ggnn_tpu.models import ModelConfig, init_params, propagate
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    r = np.random.default_rng(7)
    N, E, T, D = 640, 9000, 3, 128
    T2 = 2 * T
    src = r.integers(0, N, E).astype(np.int32)
    dst = r.integers(0, N, E).astype(np.int32)
    typ = r.integers(0, T2, E).astype(np.int32)
    mask = (r.random(E) < 0.9).astype(np.float32)
    lay_b = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True)
    lay_t = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, block_mode=False)
    assert lay_b.meta[10] is not None          # auto engaged
    assert lay_t.meta[10] is None
    assert "dstl_blk" in lay_b.arrays and "slot_off16" in lay_b.arrays
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    ref = aggregate_onehot(h, lay_t, w, b, interpret=True)
    got = aggregate_onehot(h, lay_b, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # gradients (the grad layout machinery is shared — must stay exact)
    def loss(lay):
        def f(h, w, b):
            return jnp.sum(aggregate_onehot(h, lay, w, b,
                                            interpret=True) ** 2)
        return f

    g_ref = jax.grad(loss(lay_t), argnums=(0, 1, 2))(h, w, b)
    g_new = jax.grad(loss(lay_b), argnums=(0, 1, 2))(h, w, b)
    for a_, c_, name in zip(g_new, g_ref, ("dh", "dW", "db")):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(c_),
                                      err_msg=name)

    # fused GRU step through the block kernel (typed_block_step_gru)
    cfg_f = ModelConfig(state_dim=D, annotation_dim=4, n_edge_types=T,
                        n_steps=2, backend="onehot", fuse_gru=True)
    params = init_params(jax.random.PRNGKey(0), cfg_f)
    ann = jnp.asarray((np.random.default_rng(1).random((N, 4)) < 0.4)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))
    out_t = propagate(params["prop"], cfg_f, *args, scatter_layout=lay_t)
    out_b = propagate(params["prop"], cfg_f, *args, scatter_layout=lay_b)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_t))


def test_typed_block_mode_hub_fallback():
    """A hub graph (one dst block absorbing most edges) must NOT engage
    block mode under 'auto' (slot-grid waste), falling back to the
    per-tile kernel — and still compute correctly."""
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    from ggnn_tpu.ops.segment import typed_aggregate
    r = np.random.default_rng(11)
    N, E, T2, D = 1024, 6000, 4, 64
    src = r.integers(0, N, E).astype(np.int32)
    dst = np.where(r.random(E) < 0.9, r.integers(0, 64, E),
                   r.integers(0, N, E)).astype(np.int32)
    typ = r.integers(0, T2, E).astype(np.int32)
    mask = np.ones(E, np.float32)
    lay = build_typed_dst_layout(src, dst, typ, mask, N, T2, tile_e=128)
    assert lay.meta[10] is None            # hub: auto declined
    w = jax.random.normal(jax.random.PRNGKey(0), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    ref = typed_aggregate(h, jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(typ), jnp.asarray(mask), w, b)
    got = aggregate_onehot(h, lay, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_typed_lean_residuals_parity(rng):
    """Lean residuals (round 8: save (h, a) only, recompute gates in the
    backward): value identical, gradients within elementwise-rounding
    tolerance of the full-residual path."""
    from ggnn_tpu.models import propagate
    from ggnn_tpu.ops.scatter_pallas import build_typed_dst_layout
    N, E, T, D = 512, 3000, 3, 128
    T2 = 2 * T
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    typ = rng.integers(0, T2, E).astype(np.int32)
    mask = (rng.random(E) < 0.9).astype(np.float32)
    lay = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                 with_grad=True)
    mk = dict(state_dim=D, annotation_dim=4, n_edge_types=T, n_steps=3,
              backend="onehot", fuse_gru=True, compute_dtype="bfloat16")
    cfg_n = ModelConfig(**mk)
    cfg_l = ModelConfig(**mk, lean_residuals=True)
    params = init_params(jax.random.PRNGKey(0), cfg_n)
    ann = jnp.asarray((np.random.default_rng(1).random((N, 4)) < 0.4)
                      .astype(np.float32))
    args = (ann, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(typ),
            jnp.asarray(mask))

    def loss(cfg):
        def f(p):
            h = propagate(p, cfg, *args, scatter_layout=lay)
            return jnp.sum(h * h)
        return f

    vn, gn = jax.value_and_grad(loss(cfg_n))(params["prop"])
    vl, gl = jax.value_and_grad(loss(cfg_l))(params["prop"])
    np.testing.assert_array_equal(float(vn), float(vl))  # primal exact
    for a_, b_ in zip(jax.tree.leaves(gn), jax.tree.leaves(gl)):
        a_, b_ = np.asarray(a_, np.float64), np.asarray(b_, np.float64)
        rel = np.linalg.norm(a_ - b_) / (np.linalg.norm(a_) + 1e-12)
        assert rel < 5e-3, rel


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_typed_block_octet_fuzz(seed):
    """Fuzz the round-8 block + octet machinery: random graph shapes
    (odd block counts, empty groups, B_g not a multiple of 8) must stay
    bit-identical to the per-tile kernels, fwd and dh/dW/db."""
    from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                             build_typed_dst_layout)
    r = np.random.default_rng(seed)
    N = 128 * int(r.integers(2, 8))
    E = int(r.integers(800, 6000))
    T2 = int(r.integers(2, 11))
    D = 128
    src = r.integers(0, N, E).astype(np.int32)
    dst = r.integers(0, N, E).astype(np.int32)
    typ = r.integers(0, T2, E).astype(np.int32)
    mask = (r.random(E) < 0.85).astype(np.float32)
    lay_b = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True)
    lay_t = build_typed_dst_layout(src, dst, typ, mask, N, T2,
                                   with_grad=True, block_mode=False)
    if lay_b.meta[10] is None:
        pytest.skip("auto declined block mode for this topology")
    assert lay_b.meta[5][0] == "octet"
    w = jax.random.normal(jax.random.PRNGKey(seed), (T2, D, D)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(seed + 1), (T2, D)) * 0.1
    h = jax.random.normal(jax.random.PRNGKey(seed + 2), (N, D))
    ref = aggregate_onehot(h, lay_t, w, b, interpret=True)
    got = aggregate_onehot(h, lay_b, w, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def lfun(lay):
        def f(h_, w_, b_):
            return jnp.sum(aggregate_onehot(h_, lay, w_, b_,
                                            interpret=True) ** 2)
        return f

    g_t = jax.grad(lfun(lay_t), argnums=(0, 1, 2))(h, w, b)
    g_b = jax.grad(lfun(lay_b), argnums=(0, 1, 2))(h, w, b)
    for a_, c_, name in zip(g_b, g_t, ("dh", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(c_),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
