"""MXU one-hot segment-scatter: the TPU-native replacement for XLA's
row-serialized scatter-add (SURVEY.md §7.2.1 — "dst-collision handling on
TPU (no cheap atomics) → sort edges by dst and use segmented accumulation
inside the kernel").

XLA lowers ``segment_sum`` on TPU to a scatter that processes colliding
rows serially — it dominated the whole propagation step at 8M edges.
This module instead:

1. Groups directed edges by 128-row destination block (host-side layout,
   topology-static — built once per batch, reused across all T steps and
   training iterations), each group padded to a multiple of ``tile_e``.
2. Materializes the one-hot matrix ``O[v, e] = (dst[e] == v)`` as a
   PRE-TRANSPOSED int8 stream ``[n_tiles·128, tile_e]`` at layout-build
   time (it is topology-only): the production kernel
   (``onehot_segment_scatter_flat``, flat 1-D grid over edge tiles) is then
   a pure two-stream MXU ``dot_general`` accumulating into a VMEM-resident
   output block (TPU grids execute sequentially → output revisiting across
   consecutive tiles of a block is race-free).  Streaming per-edge dst ids
   instead is a trap: an ``[E, 1]`` i32 array is lane-padded 128× in HBM
   and measured as slow as XLA's scatter.

Padding edges carry an all-zero one-hot column (``dst_local = −1`` in the
id-based fallback kernel), so no separate mask pass is needed.  FLOPs:
2·E·128·D — for D=128 the same as the message matmuls themselves, i.e. the
scatter rides the MXU at matmul speed instead of serializing on the scalar
core.  True steady-state cost (roundtrip-corrected, docs/DESIGN.md):
~5.2 ms for 8M edges at D=128 — at HBM bandwidth, vs ~120 ms for XLA's
scatter.

``aggregate_onehot`` composes the full typed aggregation step:
node-side per-type transforms (one big MXU einsum) → linear-order gather →
one-hot scatter, with a custom VJP whose backward typed scatter rides the
same kernel (transposed grad layout).  Best when ``2E·N ≲ |edges|``
(node transforms amortize); the type-tiled kernel in
:mod:`ggnn_tpu.ops.spmm_pallas` covers the opposite regime, and
``aggregate_onehot_chunked`` bounds peak memory for HBM-limited configs.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 128  # destination rows per output block (MXU-sized)


def _rup_block(x: int) -> int:
    return ((x + BLOCK_N - 1) // BLOCK_N) * BLOCK_N


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class DstBlockLayout:
    """Host-built, topology-static scatter layout (numpy arrays).

    - ``gather_idx`` [E_pack]: ``type · N + src`` — row index into the
      flattened [2E·N, D] node-transform table; padding rows point at 0
      (their contribution is dropped by ``dst_local = -1``).
    - ``dst_local`` [E_pack]: ``dst − 128·block`` in [0,128), or −1 padding.
    - ``tile_start`` [n_blocks+1]: first edge-tile of each dst block.
    - ``max_tiles``: static inner grid bound (max tiles of any block).
    """

    n_nodes_pad: int
    tile_e: int
    max_tiles: int
    gather_idx: np.ndarray
    dst_local: np.ndarray
    tile_start: np.ndarray
    block_of_tile: np.ndarray  # [n_total_tiles] dst block per packed tile
    dst_global: np.ndarray  # [E_pack] global dst, −1 padding (backward pass)
    # precomputed one-hot stream [E_pack, BLOCK_N] int8 (topology-static):
    # lets the scatter kernel be a pure two-stream MXU dot_general with no
    # dst-id side stream (a (tile_e,1) i32 block DMAs as 128 padded lanes —
    # 128× traffic inflation — and was the measured bottleneck)
    onehot: "np.ndarray | None" = None
    # optional backward layout: same structure grouped by the (type·N+src)
    # gather row, so the backward typed scatter also rides the one-hot
    # kernel instead of XLA scatter (build_dst_block_layout(with_grad=True))
    grad: "DstBlockLayout | None" = None
    # edge_align packing (see build_dst_block_layout): per-tile message
    # offsets in edge_align units, consumed by the mono kernel's
    # win_stride DMA path
    tile_msg_off: "np.ndarray | None" = None
    edge_align: "int | None" = None
    # table row space the gather indexes ('type' | 'block')
    row_order: str = "type"
    # grad layouts carry the per-(type, dst) edge counts for the bias grad
    indeg: "np.ndarray | None" = None
    # compact i32 dst-local stream [n_tiles_pad8, tile_e] replacing the
    # one-hot matrix when dstl_stream=True (the mono kernel synthesizes
    # one-hots in VMEM — 32× less side-stream DMA)
    dstl: "np.ndarray | None" = None

    @property
    def n_blocks(self) -> int:
        return self.n_nodes_pad // BLOCK_N

    def to_device(self) -> "DeviceScatterLayout":
        """Move the layout onto the device as a jit-traversable pytree.

        REQUIRED for remote-compile / large-graph use: arrays referenced
        from inside a traced function become HLO constants (a 1 GB one-hot
        stream overflows the compile payload); a DeviceScatterLayout passes
        through jit as ordinary arguments instead."""
        import jax.numpy as _jnp
        arrays = {"gather_idx": _jnp.asarray(self.gather_idx),
                  "tile_start": _jnp.asarray(self.tile_start),
                  "block_of_tile": _jnp.asarray(self.block_of_tile),
                  "dst_local": _jnp.asarray(self.dst_local),
                  "dst_global": _jnp.asarray(self.dst_global)}
        if self.onehot is not None:
            arrays["onehot"] = _jnp.asarray(self.onehot)
        if self.dstl is not None:
            arrays["dstl"] = _jnp.asarray(self.dstl)
        if self.tile_msg_off is not None:
            arrays["tile_msg_off"] = _jnp.asarray(self.tile_msg_off)
        grad_meta = None
        if self.grad is not None:
            g = self.grad
            arrays["g_gather_idx"] = _jnp.asarray(g.gather_idx)
            arrays["g_tile_start"] = _jnp.asarray(g.tile_start)
            arrays["g_block_of_tile"] = _jnp.asarray(g.block_of_tile)
            arrays["g_dst_local"] = _jnp.asarray(g.dst_local)
            if g.onehot is not None:
                arrays["g_onehot"] = _jnp.asarray(g.onehot)
            if g.dstl is not None:
                arrays["g_dstl"] = _jnp.asarray(g.dstl)
            if g.tile_msg_off is not None:
                arrays["g_tile_msg_off"] = _jnp.asarray(g.tile_msg_off)
            if g.indeg is not None:
                arrays["g_indeg"] = _jnp.asarray(g.indeg)
            grad_meta = (g.n_blocks, g.max_tiles, g.tile_e,
                         g.onehot is not None, g.edge_align)
        meta = (self.n_nodes_pad, self.tile_e, self.max_tiles,
                self.n_blocks, self.onehot is not None, grad_meta,
                self.edge_align, self.row_order)
        return DeviceScatterLayout(meta=meta, arrays=arrays)


@dataclasses.dataclass
class DeviceScatterLayout:
    """Jit-argument form of :class:`DstBlockLayout` (registered pytree:
    ``arrays`` are leaves, ``meta`` is static aux data)."""

    meta: tuple
    arrays: dict

    @property
    def n_nodes_pad(self):
        return self.meta[0]

    @property
    def tile_e(self):
        return self.meta[1]

    @property
    def max_tiles(self):
        return self.meta[2]

    @property
    def n_blocks(self):
        return self.meta[3]

    @property
    def has_onehot(self):
        return self.meta[4]

    @property
    def grad_meta(self):
        return self.meta[5]

    @property
    def edge_align(self):
        return self.meta[6] if len(self.meta) > 6 else None

    @property
    def row_order(self):
        return self.meta[7] if len(self.meta) > 7 else "type"


jax.tree_util.register_pytree_node(
    DeviceScatterLayout,
    lambda l: ((l.arrays,), l.meta),
    lambda meta, children: DeviceScatterLayout(meta=meta, arrays=children[0]))


def static_tile_budget(e_pad: int, n_rows_pad: int, tile_e: int) -> int:
    """Upper bound on the packed tile count of ANY topology with at most
    ``e_pad`` real edges scattering into ``n_rows_pad`` rows: each dst
    block wastes less than one tile, plus one tile per (possibly empty)
    block.  Passing this as ``pad_tiles_to`` makes the layout's array
    shapes a pure function of (e_pad, n_rows_pad, tile_e) — so a jitted
    train step compiles ONCE across batches instead of per topology."""
    return -(-e_pad // tile_e) + n_rows_pad // BLOCK_N


# SMEM holds ~1 MB and the typed/mono kernels scalar-prefetch up to four
# per-tile i32 streams (+ tile_start), so a single pallas_call tops out
# around 60K tiles (measured: 125K tiles = 1.95 MB SMEM, 2× the budget —
# the 1M-node uniform config).  Layouts beyond the cap are split at
# dst-block boundaries into CHUNKED calls: disjoint output block ranges,
# per-chunk slices of the prefetch arrays, stream offsets staying GLOBAL
# (h_pack / dstl / count streams are passed whole to every chunk).
SMEM_TILE_CAP = 40960

# Span mode (round 7): per-block h DMA windows live in a 2-slot VMEM
# ring — cap the largest block span so two slots stay ~8 MB at D=128
# bf16; hub-heavy layouts past the cap keep per-tile DMAs.
SPAN_ROW_CAP = 16384

# ADVICE r4: the span/block VMEM ring is (2, span_rows, D) in h_pack's
# dtype — cap it by BYTES at call time (D/dtype are unknown at layout
# build).  ~10 MB leaves room for acc/init/hst/o_buf/w_buf under the
# 16 MB scoped-VMEM limit; over-budget calls drop to per-tile DMAs.
SPAN_VMEM_BYTES = 10 * 1024 * 1024

# Block mode (round 8): per-BLOCK kernel with a python-static (type,
# chunk) inner loop — the per-slot offset array is scalar-prefetched
# into SMEM, so bound its length (i32 entries; ~640 KB of the 1 MB SMEM
# budget, leaving room for blk_off16 and the runtime's own use).
BLOCK_SLOT_CAP = 160 * 1024


def _chunk_blocks(tile_start, cap: int = SMEM_TILE_CAP):
    """Split blocks [0, n_blocks) at block boundaries so each chunk holds
    at most ``cap`` tiles.  Returns None when a single call suffices,
    else a tuple of (b0, b1, t0, t1): tiles [t0, t1) cover blocks
    [b0, b1).  A single block never splits (tiles-per-block ≪ cap for
    any real graph — one block is 128 dst rows)."""
    ts = np.asarray(tile_start, np.int64)
    n_blocks = ts.shape[0] - 1
    if int(ts[-1]) <= cap:
        return None
    over = np.flatnonzero(np.diff(ts) > cap)
    if over.size and cap >= SMEM_TILE_CAP:
        # ADVICE r3: fail loudly instead of an opaque SMEM error — but
        # only at real SMEM-scale caps; tests drive this machinery with
        # tiny artificial caps where single blocks exceed them by design
        # (a single-block chunk is functionally fine, SMEM permitting)
        b = int(over[0])
        raise ValueError(
            f"dst block {b} alone holds {int(ts[b + 1] - ts[b])} tiles, "
            f"over the SMEM chunk cap of {cap} (an extreme hub: >~{cap} "
            f"tiles of edges into one 128-row dst block). Rebuild the "
            f"layout with a larger tile_e to shrink the per-block tile "
            f"count")
    bounds = []
    b0 = 0
    while b0 < n_blocks:
        b1 = int(np.searchsorted(ts, ts[b0] + cap, side="right")) - 1
        b1 = min(max(b1, b0 + 1), n_blocks)
        bounds.append((b0, b1, int(ts[b0]), int(ts[b1])))
        b0 = b1
    return tuple(bounds)


def _typed_chunk_slices(arrs, ch):
    """Per-chunk prefetch-array slices for the typed kernels: block/tile
    indices re-based to the chunk, stream offsets (tile_msg_off, c_off)
    kept global."""
    b0, b1, t0, t1 = ch
    return (arrs["tile_start"][b0:b1 + 1] - t0,
            arrs["block_of_tile"][t0:t1] - b0,
            arrs["tile_msg_off"][t0:t1],
            arrs["c_off"][t0:t1],
            arrs["tile_type"][t0:t1])


def build_dst_block_layout(edge_src, edge_dst, edge_type, edge_mask,
                           n_nodes_pad: int, tile_e: int = 128,
                           with_grad: bool = False,
                           n_message_types: int | None = None,
                           onehot_stream: bool = True,
                           n_src_rows: int | None = None,
                           pad_tiles_to: int | None = None,
                           grad_tile_e: int | None = None,
                           grad_pad_tiles_to: int | None = None,
                           edge_align: int | None = None,
                           row_order: str = "type",
                           dstl_stream: bool = False) -> DstBlockLayout:
    """Group real directed edges by destination block; pad each group to a
    ``tile_e`` multiple.  Pure numpy — run once per batch topology.

    ``with_grad=True`` additionally builds the transposed layout (grouped
    by the type·N+src gather row, gathering from dst) so the backward
    pass's typed scatter uses the one-hot kernel too.

    ``n_src_rows`` decouples the source index space from the destination
    space (sharded halo aggregation: sources live in the [P·H]-row halo
    receive buffer while destinations are the shard's n_local rows);
    defaults to ``n_nodes_pad``.

    ``pad_tiles_to`` (and, with ``with_grad``, ``grad_tile_e`` +
    ``grad_pad_tiles_to``) pad the packed streams to a STATIC total tile
    count (see :func:`static_tile_budget`): every batch of a training run
    then produces identically-shaped layouts and the jitted step compiles
    once.  The extra all-padding tiles are appended to the last block
    (zero one-hot columns — they contribute nothing).

    ``row_order`` picks the node-transform-table row space the gather
    indexes: ``'type'`` (row = t·N_src + src — the historical layout) or
    ``'block'`` (row = (src//128)·T2·128 + t·128 + src%128) — the latter
    lets :func:`ggnn_tpu.ops.window_pallas.node_table_block_major`
    materialize the table at the write-bandwidth floor (every XLA einsum
    form pays a hidden relayout + unfused bias, ~5.2 ms vs 1.8 ms at 262K
    nodes / T2=16 / D=128).  'block' needs ``n_message_types`` and
    ``n_src_rows % 128 == 0``.

    ``edge_align`` (e.g. 16): pack each block's edges at ``edge_align``-row
    alignment instead of padding to a full ``tile_e`` multiple.  The
    per-row gather engine (~11.6 ns/row regardless of bytes) then only
    reads ~real rows; scatter tiles read their messages at 16-aligned
    dynamic offsets (``tile_msg_off``, in edge_align units) and may
    OVERLAP into the next block's rows — those columns are zero in the
    one-hot, and overlapped DMA reads cost bandwidth, not engine rate.
    Requires the manual-DMA kernel path (window_block_spmm_mono with
    ``win_stride=edge_align``); 16 satisfies bf16's 16-sublane HBM slice
    rule.  With ``with_grad`` the grad layout packs 16-aligned too (when
    its g_tile is a 16-multiple) — the backward's da gather is row-op-rate
    bound like the forward's.  Used by the window spill path."""
    if n_nodes_pad % BLOCK_N:
        raise ValueError(f"n_nodes_pad must be a multiple of {BLOCK_N}")
    if n_src_rows is None:
        n_src_rows = n_nodes_pad
    if row_order not in ("type", "block"):
        raise ValueError(f"row_order must be 'type' or 'block': {row_order!r}")
    if row_order == "block":
        if n_message_types is None:
            raise ValueError("row_order='block' needs n_message_types")
        if n_src_rows % 128:
            raise ValueError("row_order='block' needs n_src_rows % 128 == 0")
    real = np.asarray(edge_mask) > 0
    src = np.asarray(edge_src)[real].astype(np.int64)
    dst = np.asarray(edge_dst)[real].astype(np.int64)
    typ = np.asarray(edge_type)[real].astype(np.int64)

    def table_row(src, typ):
        if row_order == "block":
            return (src // 128) * (n_message_types * 128) \
                + typ * 128 + src % 128
        return typ * n_src_rows + src

    # primary: destination block (the scatter grouping); secondary: gather
    # row, so the XLA gather sees near-sequential rows within a block —
    # the one-hot scatter is order-invariant inside a block, and sorted
    # tight packs nearly double the gather engine rate (measured 11.6 →
    # 6.5 ns/row when per-tile zero-index padding jumps were removed)
    grow = table_row(src, typ)
    order = np.lexsort((grow, dst // BLOCK_N))
    src, dst, typ = src[order], dst[order], typ[order]

    n_blocks = n_nodes_pad // BLOCK_N
    block = dst // BLOCK_N
    counts = np.bincount(block, minlength=n_blocks)
    tiles = (counts + tile_e - 1) // tile_e
    # every block gets >=1 (possibly all-padding) tile so the flat-grid
    # kernel's first-tile zero-init covers blocks with no incoming edges
    tiles = np.maximum(tiles, 1)
    if pad_tiles_to is not None:
        extra = pad_tiles_to - int(tiles.sum())
        if extra < 0:
            raise ValueError(
                f"pad_tiles_to={pad_tiles_to} < required {int(tiles.sum())}")
        tiles[-1] += extra  # all-padding tiles at the tail of the last block
    tile_start = np.zeros(n_blocks + 1, np.int32)
    # static-budget layouts must also have a topology-INDEPENDENT
    # max_tiles: it sits in the pytree static meta (the jit cache key), so
    # a per-topology tiles.max() would recompile the step whenever edge
    # concentration shifts — exactly what pad_tiles_to exists to prevent.
    # (Only the 2-D grid kernels read it; they skip empty iterations.)
    static_max_tiles = pad_tiles_to if pad_tiles_to is not None else None
    np.cumsum(tiles, out=tile_start[1:])
    max_tiles = (static_max_tiles if static_max_tiles is not None
                 else int(tiles.max()) if n_blocks else 1)

    # packed position of each real edge: block's first slot + rank in block
    block_edge_start = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(counts, out=block_edge_start[1:])
    rank = np.arange(src.shape[0]) - block_edge_start[block]
    tile_msg_off = None
    if edge_align is not None:
        if not onehot_stream:
            raise ValueError("edge_align needs onehot_stream=True (only the "
                             "mono win_stride kernel reads aligned packs)")
        A = edge_align
        if tile_e % A:
            raise ValueError(f"edge_align={A} must divide tile_e={tile_e}")
        base = np.zeros(n_blocks + 1, np.int64)
        np.cumsum(-(-counts // A) * A, out=base[1:])
        e_pack = int(base[-1]) + tile_e  # margin: tiles may overrun
        if pad_tiles_to is not None:
            # static-budget mode: the pack length must be topology-
            # independent too (halo shards np.stack it; serving batches
            # must not retrace) — pad to the budget's worst case.  The
            # padding rows do re-enter the gather; static shapes trade
            # that back deliberately.
            e_pack = pad_tiles_to * tile_e + tile_e
        pos = base[block] + rank
        tile_of = tile_start[block].astype(np.int64) + rank // tile_e
        col = rank % tile_e
        # per-tile message offset in edge_align units (the mono kernel
        # DMAs messages at pl.ds(off·A, tile_e))
        tile_msg_off = np.zeros(int(tile_start[-1]), np.int32)
        for_blocks = np.repeat(np.arange(n_blocks), tiles.astype(np.int64))
        k_in_block = (np.arange(tile_msg_off.shape[0])
                      - tile_start[for_blocks])
        tile_msg_off[:] = ((base[for_blocks] + k_in_block * tile_e) // A
                           ).astype(np.int32)
        # pad_tiles_to appends all-zero tiles past the last block's real
        # range — clamp every offset into bounds (real tiles are already
        # ≤ base[-1]; the clamp only moves padding tiles, whose one-hot
        # columns are zero)
        np.minimum(tile_msg_off, (e_pack - tile_e) // A, out=tile_msg_off)
    else:
        e_pack = max(int(tile_start[-1]) * tile_e, tile_e)
        pos = tile_start[block].astype(np.int64) * tile_e + rank
        tile_of = pos // tile_e
        col = pos % tile_e

    gather_idx = np.zeros(e_pack, np.int32)
    dst_local = np.full(e_pack, -1, np.int32)
    dst_global = np.full(e_pack, -1, np.int32)
    gather_idx[pos] = table_row(src, typ).astype(np.int32)
    dst_local[pos] = (dst - block * BLOCK_N).astype(np.int32)
    dst_global[pos] = dst.astype(np.int32)
    block_of_tile = np.repeat(np.arange(n_blocks, dtype=np.int32),
                              tiles.astype(np.int64))
    onehot = None
    dstl = None
    if onehot_stream and dstl_stream:
        # compact dst-local stream [n_tiles_pad8, tile_e] i32 (−1 = no
        # edge): the mono kernel synthesizes each tile's one-hot as
        # (row iota == dstl) on the VPU — 4·tile_e side-stream bytes/tile
        # instead of 128·tile_e int8 (32× less DMA); requires the
        # manual-DMA path (edge_align / win_stride)
        if edge_align is None:
            raise ValueError("dstl_stream needs edge_align (only the mono "
                             "win_stride kernel synthesizes one-hots)")
        n_total_tiles = int(tile_start[-1])
        dstl = np.full((_rup(max(n_total_tiles, 1), 8), tile_e), -1,
                       np.int32)
        dstl[tile_of, col] = dst_local[pos]
    elif onehot_stream:
        # stored TRANSPOSED per tile — [n_tiles·BLOCK_N, tile_e] — so the
        # kernel contracts lhs dim 1 (MXU-native; contracting dim 0 forces
        # a per-tile transpose relayout)
        n_total_tiles = int(tile_start[-1])
        onehot = np.zeros((n_total_tiles * BLOCK_N, tile_e), np.int8)
        onehot[tile_of * BLOCK_N + dst_local[pos], col] = 1
    grad = None
    if with_grad:
        if n_message_types is None:
            n_message_types = int(typ.max(initial=0)) + 1
        # transposed roles: group by gather row (t·N_src+src), gather
        # from dst (the cotangent array has n_nodes_pad rows).  The grad
        # grouping has T2× more blocks than the forward one, so pick its
        # tile size from its own average block occupancy — inheriting the
        # forward tile would pad the stream by up to T2×.
        n_rows_grad = _rup_block(n_message_types * n_src_rows)
        if grad_tile_e is not None:
            g_tile = grad_tile_e
        else:
            avg = max(1, src.shape[0] * BLOCK_N // max(n_rows_grad, 1))
            g_tile = 128
            while g_tile < min(avg, tile_e):
                g_tile *= 2
        grad = build_dst_block_layout(
            edge_src=dst, edge_dst=table_row(src, typ),
            edge_type=np.zeros_like(typ),
            edge_mask=np.ones(dst.shape[0], np.float32),
            n_nodes_pad=n_rows_grad,
            tile_e=g_tile, with_grad=False, onehot_stream=onehot_stream,
            n_src_rows=n_nodes_pad, pad_tiles_to=grad_pad_tiles_to,
            # aligned grad pack: the backward's da gather is row-op-rate
            # bound like the forward's — unaligned g_tile padding re-read
            # up to +40% zero rows (the round-3 'zero-jump tax')
            edge_align=(16 if onehot_stream and g_tile % 16 == 0 else None),
            dstl_stream=(dstl_stream and onehot_stream
                         and g_tile % 16 == 0))
        # per-(type, dst) edge counts: db[t] = sum_v cnt_t(v) * da[v] as
        # ONE [T2, N]*[N, D] matmul instead of the Y row-sum einsum
        grad.indeg = np.bincount(
            typ * np.int64(n_nodes_pad) + dst,
            minlength=n_message_types * n_nodes_pad).reshape(
                n_message_types, n_nodes_pad).astype(np.float32)
    return DstBlockLayout(
        n_nodes_pad=n_nodes_pad, tile_e=tile_e,
        max_tiles=max(max_tiles, 1), gather_idx=gather_idx,
        dst_local=dst_local, tile_start=tile_start,
        block_of_tile=block_of_tile, dst_global=dst_global,
        onehot=onehot, grad=grad, tile_msg_off=tile_msg_off,
        edge_align=edge_align, row_order=row_order, dstl=dstl)


def _scatter_kernel(tile_start_ref, msg_ref, dstl_ref, out_ref):
    b = pl.program_id(0)
    j = pl.program_id(1)
    count = tile_start_ref[b + 1] - tile_start_ref[b]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j < count)
    def _():
        dst = dstl_ref[...]                               # [tile_e, 1] i32
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, dst.shape[0]), 0)
        onehot = (dst[:, 0][None, :] == rows).astype(msg_ref.dtype)
        out_ref[...] += jnp.dot(onehot, msg_ref[...],
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "max_tiles", "tile_e",
                                    "interpret"))
def onehot_segment_scatter(messages, dst_local, tile_start, n_blocks: int,
                           max_tiles: int, tile_e: int = 128,
                           interpret: bool = False):
    """messages [E_pack, D] (dst-block-grouped) → out [n_blocks·128, D]."""
    D = messages.shape[-1]
    n_total_tiles = messages.shape[0] // tile_e

    def msg_index(b, j, ts):
        return (jnp.minimum(ts[b] + j, n_total_tiles - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, max_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, D), msg_index),
            pl.BlockSpec((tile_e, 1), msg_index),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, D), lambda b, j, ts: (b, 0)),
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * messages.shape[0] * BLOCK_N * D,
            bytes_accessed=messages.shape[0] * D * 4 + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(tile_start, messages, dst_local.reshape(-1, 1))


def _scatter_stream_kernel(tile_start_ref, msg_ref, oh_ref, out_ref):
    """Two-stream tile: out += onehotᵀ·msg — one MXU dot_general, no dst
    ids, no VPU one-hot build (one-hot stored pre-transposed)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    count = tile_start_ref[b + 1] - tile_start_ref[b]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j < count)
    def _():
        oh = oh_ref[...].astype(msg_ref.dtype)               # [128, tile_e]
        out_ref[...] += jax.lax.dot_general(
            oh, msg_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "max_tiles", "tile_e",
                                    "interpret"))
def onehot_segment_scatter_stream(messages, onehot_i8, tile_start,
                                  n_blocks: int, max_tiles: int,
                                  tile_e: int = 512,
                                  interpret: bool = False):
    """messages [E_pack, D] + onehot stream [E_pack, BLOCK_N] int8 →
    out [n_blocks·BLOCK_N, D].  The one-hot stream is topology-static
    (built once per batch) — the kernel is pure streaming MXU work."""
    D = messages.shape[-1]
    n_total_tiles = messages.shape[0] // tile_e

    def tile_index(b, j, ts):
        return (jnp.minimum(ts[b] + j, n_total_tiles - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, max_tiles),
        in_specs=[
            pl.BlockSpec((tile_e, D), tile_index),
            pl.BlockSpec((BLOCK_N, tile_e), tile_index),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, D), lambda b, j, ts: (b, 0)),
    )
    return pl.pallas_call(
        _scatter_stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * messages.shape[0] * BLOCK_N * D,
            bytes_accessed=messages.shape[0] * (D * messages.dtype.itemsize
                                                + BLOCK_N)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(tile_start, messages, onehot_i8)


def _scatter_stream_flat_kernel(block_of_tile_ref, tile_start_ref, msg_ref,
                                oh_ref, out_ref):
    """Flat 1-D grid over edge tiles: no empty programs, no clamped
    duplicate DMAs.  Output block revisiting holds across consecutive
    tiles of the same dst block (TPU grids run sequentially)."""
    i = pl.program_id(0)
    b = block_of_tile_ref[i]

    @pl.when(i == tile_start_ref[b])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    oh = oh_ref[...].astype(msg_ref.dtype)                   # [128, tile_e]
    out_ref[...] += jax.lax.dot_general(
        oh, msg_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "interpret"))
def onehot_segment_scatter_flat(messages, onehot_i8, tile_start,
                                block_of_tile, n_blocks: int,
                                tile_e: int = 2048,
                                interpret: bool = False):
    """Flat-grid variant of :func:`onehot_segment_scatter_stream`.

    ``block_of_tile`` [n_total_tiles] maps each packed edge tile to its
    dst block (host-precomputed, topology-static)."""
    D = messages.shape[-1]
    n_total_tiles = messages.shape[0] // tile_e
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_total_tiles,),
        in_specs=[
            pl.BlockSpec((tile_e, D), lambda i, bt, ts: (i, 0)),
            pl.BlockSpec((BLOCK_N, tile_e), lambda i, bt, ts: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, D), lambda i, bt, ts: (bt[i], 0)),
    )
    return pl.pallas_call(
        _scatter_stream_flat_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * messages.shape[0] * BLOCK_N * D,
            bytes_accessed=messages.shape[0] * (D * messages.dtype.itemsize
                                                + BLOCK_N)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(block_of_tile, tile_start, messages, onehot_i8)


def _scatter_loopT_kernel(tile_start_ref, msg_hbm, oh_hbm, out_ref,
                          msg_buf, oh_buf, msg_sem, oh_sem, *, tile_e):
    """One program per dst block; inner double-buffered DMA loop over the
    block's (message, transposed-one-hot) tile pairs.  Both stream slices
    are 8-sublane aligned (msg: tile_e rows; one-hot: 128 rows), so this
    compiles where the dst-id variant could not, and the fixed ~3-7 µs
    per-grid-program cost is amortized across a whole block."""
    b = pl.program_id(0)
    start = tile_start_ref[b]
    count = tile_start_ref[b + 1] - start
    out_ref[...] = jnp.zeros_like(out_ref)
    NBUF = 2

    def make_dmas(slot, k):
        m = pltpu.make_async_copy(
            msg_hbm.at[pl.ds((start + k) * tile_e, tile_e), :],
            msg_buf.at[slot], msg_sem.at[slot])
        o = pltpu.make_async_copy(
            oh_hbm.at[pl.ds((start + k) * BLOCK_N, BLOCK_N), :],
            oh_buf.at[slot], oh_sem.at[slot])
        return m, o

    @pl.when(count > 0)
    def _():
        m, o = make_dmas(0, 0)
        m.start()
        o.start()

    def body(k, _):
        slot = k % NBUF
        nxt = (k + 1) % NBUF

        @pl.when(k + 1 < count)
        def _():
            m, o = make_dmas(nxt, k + 1)
            m.start()
            o.start()

        m, o = make_dmas(slot, k)
        m.wait()
        o.wait()
        oh = oh_buf[slot].astype(msg_buf.dtype)              # [128, tile_e]
        out_ref[...] += jax.lax.dot_general(
            oh, msg_buf[slot], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "interpret"))
def onehot_segment_scatter_loopT(messages, onehot_t, tile_start,
                                 n_blocks: int, tile_e: int = 2048,
                                 interpret: bool = False):
    """Looped-DMA variant of the transposed-one-hot stream scatter."""
    D = messages.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, D), lambda b, ts: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tile_e, D), messages.dtype),
            pltpu.VMEM((2, BLOCK_N, tile_e), onehot_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_scatter_loopT_kernel, tile_e=tile_e)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * messages.shape[0] * BLOCK_N * D,
            bytes_accessed=messages.shape[0] * (D * messages.dtype.itemsize
                                                + BLOCK_N)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(tile_start, messages, onehot_t)


def onehot_segment_scatter_mono(messages, onehot_t, tile_start, block_of_tile,
                                n_blocks: int, tile_e: int = 2048,
                                n_progs: int = 1, nbuf: int = 4,
                                out_dtype=None, interpret: bool = False):
    """Monolithic-streaming variant of :func:`onehot_segment_scatter_flat`:
    a thin wrapper over the generalized windowed mono kernel
    (:func:`ggnn_tpu.ops.window_pallas.window_block_spmm_mono`) with each
    edge tile reading its own ``tile_e``-row "window" of the message
    stream (``win_of_tile = arange``).  Measured equivalent to the flat
    kernel (both at HBM bandwidth — docs/DESIGN.md round-2 correction);
    kept as the benchmarked alternative without duplicating the
    DMA-ring/semaphore logic."""
    import jax.numpy as jnp
    from ggnn_tpu.ops.window_pallas import window_block_spmm_mono
    n_tiles = onehot_t.shape[0] // BLOCK_N
    win_of_tile = jnp.arange(n_tiles, dtype=jnp.int32)
    return window_block_spmm_mono(
        messages, onehot_t, tile_start, block_of_tile, win_of_tile,
        n_blocks=n_blocks, window=tile_e, n_progs=n_progs, nbuf=nbuf,
        out_dtype=out_dtype, interpret=interpret)


def layout_for_batch(batch, tile_e: int = 128, with_grad: bool = True
                     ) -> DeviceScatterLayout:
    """Static-shape scatter layout for a :class:`~ggnn_tpu.graph.GraphBatch`:
    tile counts padded to the :func:`static_tile_budget` of the batch's
    PaddingSpec, so every batch of a training run yields identically-shaped
    layouts and the jitted train/eval step compiles once (the layout passes
    through jit ARGUMENTS as a registered pytree)."""
    spec = batch.spec
    t2 = 2 * spec.n_edge_types
    # dst rows pad up to the 128-row block grid; the gather/table space
    # stays spec.n_pad (it must match h's row count)
    n_dst = _rup_block(spec.n_pad)
    g_rows = _rup_block(t2 * spec.n_pad)
    return build_dst_block_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        n_dst, tile_e=tile_e, with_grad=with_grad,
        n_message_types=t2, n_src_rows=spec.n_pad,
        pad_tiles_to=static_tile_budget(spec.e_pad, n_dst, tile_e),
        grad_tile_e=128 if with_grad else None,
        grad_pad_tiles_to=(static_tile_budget(spec.e_pad, g_rows, 128)
                           if with_grad else None),
        row_order=("block" if spec.n_pad % 128 == 0 else "type")
    ).to_device()


def build_chunked_dst_layouts(edge_src, edge_dst, edge_type, edge_mask,
                              n_nodes_pad: int, n_chunks: int,
                              tile_e: int = 2048,
                              onehot_stream: bool = True) -> list:
    """Split the scatter layout into ``n_chunks`` contiguous dst-block
    ranges so the per-edge message buffer materializes one chunk at a time
    (peak memory / n_chunks) — how the 1M-node BASELINE config fits a
    single chip.  gather rows stay GLOBAL (t·N+src into the full table);
    only destinations are chunk-local."""
    if n_nodes_pad % (BLOCK_N * n_chunks):
        raise ValueError("n_nodes_pad must divide into n_chunks×128 blocks")
    rows_per_chunk = n_nodes_pad // n_chunks
    real = np.asarray(edge_mask) > 0
    src = np.asarray(edge_src)[real]
    dst = np.asarray(edge_dst)[real]
    typ = np.asarray(edge_type)[real]
    chunk_of = dst // rows_per_chunk
    layouts = []
    for c in range(n_chunks):
        sel = chunk_of == c
        layouts.append(build_dst_block_layout(
            src[sel], dst[sel] - c * rows_per_chunk, typ[sel],
            np.ones(int(sel.sum()), np.float32), rows_per_chunk,
            tile_e=tile_e, onehot_stream=onehot_stream,
            n_src_rows=n_nodes_pad).to_device())
    return layouts


def aggregate_onehot_chunked(h, chunk_layouts: list, msg_w, msg_b,
                             interpret: bool | None = None):
    """Chunked forward aggregation over contiguous dst ranges (see
    :func:`build_chunked_dst_layouts`).  Forward-only (large-scale training
    shards across chips instead)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D = h.shape
    transformed = jnp.einsum("nd,tdf->tnf", h, msg_w,
                             preferred_element_type=jnp.float32) \
        + msg_b[:, None, :]
    table = transformed.reshape(-1, D).astype(h.dtype)
    outs = []
    for lay in chunk_layouts:
        arrs = lay.arrays
        msgs = table[arrs["gather_idx"]]
        if lay.has_onehot:
            out = onehot_segment_scatter_flat(
                msgs, arrs["onehot"], arrs["tile_start"],
                arrs["block_of_tile"], n_blocks=lay.n_blocks,
                tile_e=lay.tile_e, interpret=interpret)
        else:
            out = onehot_segment_scatter(
                msgs, arrs["dst_local"], arrs["tile_start"],
                n_blocks=lay.n_blocks, max_tiles=lay.max_tiles,
                tile_e=lay.tile_e, interpret=interpret)
        outs.append(out)
    return jnp.concatenate(outs, axis=0)[:N]


def aggregate_onehot(h, layout, msg_w, msg_b, interpret: bool | None = None):
    """Full typed aggregation via node-side transforms + one-hot scatter.

    a = scatter(gather(einsum(h, W) + b)) — every stage is MXU work or a
    linear-order memory pass; no XLA scatter anywhere.  Differentiable:
    the custom VJP uses the node-side formulation
    (Y[t,u] = Σ_{(u,t,v)} ā_v; dh = Σ_t Y_t·W_tᵀ; dW_t = hᵀ·Y_t;
    db_t = Σ_u Y_t[u]) — Y's typed scatter rides the one-hot kernel too
    when the layout was built ``with_grad=True``.

    ``layout`` may be a host :class:`DstBlockLayout` (small graphs — its
    arrays become trace constants) or a :class:`DeviceScatterLayout`
    (required under jit for large graphs; pass it through the jitted
    function's arguments)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(layout, DstBlockLayout):
        layout = layout.to_device()
    return _aggregate_onehot(layout.meta, interpret, layout.arrays, h,
                             msg_w, msg_b)


def _aggregate_impl(meta, interpret, arrs, h, msg_w, msg_b):
    n_nodes_pad, tile_e, max_tiles, n_blocks, has_onehot, _ = meta[:6]
    edge_align = meta[6] if len(meta) > 6 else None
    row_order = meta[7] if len(meta) > 7 else "type"
    N, D = h.shape
    if row_order == "typed":
        # typed-pack path: gather h DIRECTLY (the row engine is ~3.5×
        # faster on a [N, D]-sized footprint than on the [2E·N, D] table)
        # and apply W_t inside the scatter kernel on single-type tiles;
        # the bias is Σ_t indeg_t(v)·b_t outside
        h_pack = h[arrs["gather_idx"]]
        chunks = meta[8] if len(meta) > 8 else None
        span_rows = meta[9] if len(meta) > 9 else None
        bmeta = meta[10] if len(meta) > 10 else None
        blk16 = arrs.get("blk_off16") if span_rows is not None else None
        if bmeta is not None:
            # per-block kernel (round 8): static (type, chunk) inner loop
            S8, cmax, b_span = bmeta
            out = typed_block_scatter(
                h_pack, arrs["dstl_blk"], arrs["slot_off16"],
                arrs["blk_off16"], msg_w, n_blocks=n_blocks,
                tile_e=tile_e, S8=S8, cmax=cmax, span_rows=b_span,
                interpret=interpret)
        elif chunks is None:
            out = typed_onehot_scatter(
                h_pack, arrs["dstl"], arrs["tile_start"],
                arrs["block_of_tile"], arrs["tile_msg_off"], arrs["c_off"],
                arrs["tile_type"], msg_w, n_blocks=n_blocks, tile_e=tile_e,
                align=edge_align, blk_off16=blk16, span_rows=span_rows,
                interpret=interpret)
        else:
            # SMEM-capped chunked calls (see _chunk_blocks): disjoint
            # dst-block ranges, global stream offsets
            outs = []
            for ch in chunks:
                ts, bot, tmo, coff, tty = _typed_chunk_slices(arrs, ch)
                outs.append(typed_onehot_scatter(
                    h_pack, arrs["dstl"], ts, bot, tmo, coff, tty, msg_w,
                    n_blocks=ch[1] - ch[0], tile_e=tile_e,
                    align=edge_align,
                    blk_off16=(None if blk16 is None
                               else blk16[ch[0]:ch[1]]),
                    span_rows=span_rows, interpret=interpret))
            out = jnp.concatenate(outs, axis=0)
        bias = jnp.einsum("tn,td->nd", arrs["indeg"],
                          msg_b.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        return (out + bias)[:N]
    # table kept in the compute dtype (bf16 halves the gather+scatter HBM
    # traffic; the one-hot matmul accumulates in f32); block-major rows
    # materialize through the Pallas table kernel at the write-BW floor
    from ggnn_tpu.ops.window_pallas import _node_table
    table = _node_table(h, msg_w, msg_b, row_order, interpret)  # [T2·N, D]
    msgs = table[arrs["gather_idx"]]                      # linear-order gather
    if edge_align is not None:
        # 16-aligned packing: gather reads ~real rows; the mono kernel
        # DMAs message tiles at win_stride offsets (may overlap blocks —
        # overlapping one-hot columns are zero)
        from ggnn_tpu.ops.window_pallas import window_block_spmm_mono
        use_dstl = "dstl" in arrs
        out = window_block_spmm_mono(
            msgs, arrs["dstl"] if use_dstl else arrs["onehot"],
            arrs["tile_start"], arrs["block_of_tile"],
            arrs["tile_msg_off"], n_blocks=n_blocks, window=tile_e,
            win_stride=edge_align, out_rows=BLOCK_N, dstl=use_dstl,
            interpret=interpret)
    elif has_onehot:
        out = onehot_segment_scatter_flat(
            msgs, arrs["onehot"], arrs["tile_start"], arrs["block_of_tile"],
            n_blocks=n_blocks, tile_e=tile_e, interpret=interpret)
    else:
        out = onehot_segment_scatter(
            msgs, arrs["dst_local"], arrs["tile_start"], n_blocks=n_blocks,
            max_tiles=max_tiles, tile_e=tile_e, interpret=interpret)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _aggregate_onehot(meta, interpret, arrs, h, msg_w, msg_b):
    return _aggregate_impl(meta, interpret, arrs, h, msg_w, msg_b)


def _aggregate_fwd(meta, interpret, arrs, h, msg_w, msg_b):
    out = _aggregate_impl(meta, interpret, arrs, h, msg_w, msg_b)
    return out, (arrs, h, msg_w)


def _typed_reverse_scatter(meta, interpret, arrs, da, T2, N, D,
                           out_dtype=None):
    """Y.flat[row(u,t)] = Σ_{(u,t,v)} da[v] — via the grad one-hot layout
    when present, else XLA segment_sum.  Returns [T2·N, D] flat in the
    layout's table-row order."""
    grad_meta = meta[5]
    if grad_meta is not None and grad_meta[0] == "octet":
        # round-8 octet kernel: 8 grad blocks per iteration, static
        # (block, chunk) loop — see _grad_octet_kernel
        _, B_g, g_tile, C_g, R8, span8, n_oct = grad_meta
        if out_dtype is not None:
            da = da.astype(out_dtype)
        G = da[arrs["g_gather_idx"]]
        Y_flat = typed_grad_octet_scatter(
            G, arrs["g_dstl_oct"], arrs["g_slot_off16"],
            arrs["g_oblk16"], n_oct=n_oct, g_tile=g_tile, C=C_g, R8=R8,
            span8=span8, out_dtype=out_dtype, interpret=interpret)
        return Y_flat[:T2 * N]
    if grad_meta is not None:
        g_blocks, g_max_tiles, g_tile_e, g_has_onehot = grad_meta[:4]
        g_align = grad_meta[4] if len(grad_meta) > 4 else None
        # cast BEFORE the gather: an f32 ā gather measured 100 ms vs 32
        # for bf16 at 8.25M rows (the row engine is byte-sensitive at
        # 512 B rows)
        if out_dtype is not None:
            da = da.astype(out_dtype)
        G = da[arrs["g_gather_idx"]]
        if g_align is not None:
            from ggnn_tpu.ops.window_pallas import window_block_spmm_mono
            use_dstl = "g_dstl" in arrs
            g_stream = arrs["g_dstl"] if use_dstl else arrs["g_onehot"]
            g_chunks = grad_meta[5] if len(grad_meta) > 5 else None
            if g_chunks is None:
                Y_flat = window_block_spmm_mono(
                    G, g_stream, arrs["g_tile_start"],
                    arrs["g_block_of_tile"], arrs["g_tile_msg_off"],
                    n_blocks=g_blocks, window=g_tile_e, win_stride=g_align,
                    out_rows=BLOCK_N, out_dtype=out_dtype, dstl=use_dstl,
                    interpret=interpret)
            else:
                # SMEM-capped chunked calls (the grad layout's tile count
                # scales with T2·N/128 blocks — 125K at 1M nodes); the
                # stream is dense over GLOBAL tile indices, so each chunk
                # addresses it via an explicit c_off = arange(t0, t1)
                parts = []
                for b0, b1, t0, t1 in g_chunks:
                    parts.append(window_block_spmm_mono(
                        G, g_stream, arrs["g_tile_start"][b0:b1 + 1] - t0,
                        arrs["g_block_of_tile"][t0:t1] - b0,
                        arrs["g_tile_msg_off"][t0:t1],
                        n_blocks=b1 - b0, window=g_tile_e,
                        win_stride=g_align, out_rows=BLOCK_N,
                        out_dtype=out_dtype, dstl=use_dstl,
                        c_off=jnp.arange(t0, t1, dtype=jnp.int32),
                        interpret=interpret))
                Y_flat = jnp.concatenate(parts, axis=0)
        elif g_has_onehot:
            # mono kernel: f32 VMEM accumulation, flushed in the compute
            # dtype — Y is a [T2·N, D] intermediate whose three einsum
            # consumers accumulate in f32 anyway, so a bf16 flush halves
            # its write + every downstream read
            Y_flat = onehot_segment_scatter_mono(
                G, arrs["g_onehot"], arrs["g_tile_start"],
                arrs["g_block_of_tile"], n_blocks=g_blocks,
                tile_e=g_tile_e, out_dtype=out_dtype, interpret=interpret)
        else:
            Y_flat = onehot_segment_scatter(
                G, arrs["g_dst_local"], arrs["g_tile_start"],
                n_blocks=g_blocks, max_tiles=g_max_tiles, tile_e=g_tile_e,
                interpret=interpret)
        return Y_flat[:T2 * N]
    mask = arrs["dst_global"] >= 0
    G = da[jnp.maximum(arrs["dst_global"], 0)] * mask[:, None]
    return jax.ops.segment_sum(G, arrs["gather_idx"], num_segments=T2 * N)


def _aggregate_bwd(meta, interpret, res, da):
    arrs, h, msg_w = res
    T2, D = msg_w.shape[0], msg_w.shape[-1]
    N = h.shape[0]
    row_order = meta[7] if len(meta) > 7 else "type"
    if row_order == "typed":
        row_order = "block"   # the typed pack's grad rows are block-major
    Y_flat = _typed_reverse_scatter(meta, interpret, arrs, da, T2, N, D,
                                    out_dtype=h.dtype)
    if "g_indeg" in arrs:
        # db as one [T2, N]·[N, D] matmul against the per-(type, dst)
        # edge counts — skips a full Y re-read.  da may have fewer rows
        # than the layout's padded dst space (out[:N] slicing): pad with
        # zeros (padding rows have zero in-degree anyway)
        n_dst = arrs["g_indeg"].shape[1]
        da_db = (jnp.pad(da, ((0, n_dst - da.shape[0]), (0, 0)))
                 if da.shape[0] < n_dst else da[:n_dst])
        db = jnp.einsum("tn,nd->td", arrs["g_indeg"], da_db,
                        preferred_element_type=jnp.float32
                        ).astype(msg_w.dtype)
    else:
        db = None
    if row_order == "block":
        Yb = Y_flat.reshape(N // 128, T2, 128, D)
        dh = jnp.einsum("btsf,tdf->bsd", Yb, msg_w,
                        preferred_element_type=jnp.float32) \
            .reshape(N, D).astype(h.dtype)
        dW = jnp.einsum("bsd,btsf->tdf", h.reshape(N // 128, 128, D), Yb,
                        preferred_element_type=jnp.float32).astype(msg_w.dtype)
        if db is None:
            db = jnp.sum(Yb, axis=(0, 2)).astype(msg_w.dtype)
    else:
        Y = Y_flat.reshape(T2, N, D)
        dh = jnp.einsum("tnf,tdf->nd", Y, msg_w,
                        preferred_element_type=jnp.float32).astype(h.dtype)
        dW = jnp.einsum("nd,tnf->tdf", h, Y,
                        preferred_element_type=jnp.float32).astype(msg_w.dtype)
        if db is None:
            db = jnp.sum(Y, axis=1).astype(msg_w.dtype)
    d_arrs = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), arrs)
    return d_arrs, dh, dW, db


_aggregate_onehot.defvjp(_aggregate_fwd, _aggregate_bwd)


# ---------------------------------------------------------------------------
# Typed-pack aggregation: gather h DIRECTLY (small-footprint gather), apply
# the per-type transform INSIDE the scatter kernel on single-type tiles.
#
# The per-row gather engine is FOOTPRINT-sensitive (measured 1.6 ns/row from
# a 67 MB table vs 5.7 ns/row from ≥268 MB, random indices): gathering the
# [2E·N, D] node-transform table costs 3.5× more per row than gathering
# h [N, D] itself.  Sorting each dst block's edges by TYPE makes every tile
# single-type, and by associativity
#     onehot @ (H·W_t) = (onehot @ H) · W_t
# the kernel needs just ONE extra [128, D]·[D, D] dot per tile after the
# usual one-hot product (scalar-prefetched tile type picks W_t — the
# spmm_pallas precedent).  The bias term never enters the kernel:
# Σ_e 1[dst=v] b_{t_e} = Σ_t indeg_t(v)·b_t, one tiny einsum outside.
# ---------------------------------------------------------------------------


def build_typed_dst_layout(edge_src, edge_dst, edge_type, edge_mask,
                           n_nodes_pad: int, n_message_types: int,
                           tile_e: int | None = None, edge_align: int = 16,
                           with_grad: bool = False,
                           grad_tile_e: int | None = None,
                           smem_tile_cap: int = SMEM_TILE_CAP,
                           span_mode="auto", block_mode="auto"):
    """Host-side layout for the typed-pack path: edges sorted by
    (dst block, type, src), per-(block, type) groups packed at
    ``edge_align``-row alignment, tiles split at group boundaries so each
    tile is single-type.  ``gather_idx`` indexes h ROWS (not table rows).
    Returns a :class:`DeviceScatterLayout` with ``row_order='typed'``.

    ``block_mode`` (round 8, default 'auto'): per-BLOCK kernel layout —
    each dst block gets ``S8 = rup(T2·cmax, 8)`` slots (cmax = max
    tile_e-chunks of any (block, type) group), slot (t, c) carrying a
    pre-divided pack offset in a scalar-prefetched [B·S8] array and its
    dst-local rows at row b·S8 + t·cmax + c of a block-contiguous
    [B·S8, tile_e] i32 stream.  The kernel (:func:`typed_block_scatter`)
    then runs a PYTHON-STATIC (type, chunk) inner loop per block — one h
    span DMA + one dstl DMA per block instead of per tile, one SMEM read
    and one branch per slot, and a STATIC w_buf[t] index — eliminating
    the ~330 ns/tile per-tile scalar machinery that floored the typed
    scatter at 32K tiles (docs/DESIGN.md "tile-count floor"; the dynslice
    prototype ran the same work at 112 ns/chunk vs 420 production).
    'auto' engages when the slot waste is bounded (hub-free graphs);
    hub-heavy/power-law layouts keep the per-tile kernel."""
    T2 = n_message_types
    if n_nodes_pad % BLOCK_N:
        raise ValueError(f"n_nodes_pad must be a multiple of {BLOCK_N}")
    if tile_e is None:
        # size tiles to the average (block, type) group occupancy
        n_real_e = max(int((np.asarray(edge_mask) > 0).sum()), 1)
        avg = max(1, n_real_e * BLOCK_N // n_nodes_pad // T2)
        tile_e = 128
        while tile_e < min(avg, 2048):
            tile_e *= 2
    if tile_e % edge_align:
        raise ValueError("edge_align must divide tile_e")
    real = np.asarray(edge_mask) > 0
    src = np.asarray(edge_src)[real].astype(np.int64)
    dst = np.asarray(edge_dst)[real].astype(np.int64)
    typ = np.asarray(edge_type)[real].astype(np.int64)
    order = np.lexsort((src, typ, dst // BLOCK_N))
    src, dst, typ = src[order], dst[order], typ[order]
    n_blocks = n_nodes_pad // BLOCK_N
    block = dst // BLOCK_N
    gid = block * T2 + typ
    n_groups = n_blocks * T2
    gcnt = np.bincount(gid, minlength=n_groups)
    A = edge_align
    gbase = np.zeros(n_groups + 1, np.int64)
    np.cumsum(-(-gcnt // A) * A, out=gbase[1:])
    e_pack = int(gbase[-1]) + tile_e      # margin: last tile may overrun
    # SPAN mode (round 7): the pack is block-contiguous, so the kernel
    # can DMA each dst block's whole span once (2-slot ring) and slice
    # tiles from VMEM at provably-16-aligned dynamic offsets — replacing
    # ~blocks·T2 per-tile h DMAs (the measured ~330 ns/tile fixed cost
    # × the 32K-tile floor, docs/DESIGN.md "tile-count floor") with
    # ~blocks span DMAs.  Disabled for hub-heavy layouts whose largest
    # block span exceeds the VMEM cap (falls back to per-tile DMAs).
    # Round-7 A/B: span mode measured +6% on the 262K fused forward
    # (278.5/278.9M, both uniform threshold cases green) but −37% on
    # the 1M SMEM-CHUNKED train (108.7 → 68.8M, ledger) — the
    # per-block span over-read and 2-slot ring lose at many-small-
    # block chunked scales.  'auto' (default) therefore enables span
    # exactly where it was certified: un-chunked layouts only.
    blk_start = gbase[np.arange(n_blocks) * T2]
    blk_end = gbase[np.arange(1, n_blocks + 1) * T2]
    span_rows = int((blk_end - blk_start).max(initial=0)) + tile_e
    span_rows = -(-span_rows // 16) * 16
    # tiles: ceil(count/tile_e) per non-empty group
    gtiles = -(-gcnt // tile_e)
    n_real = int(gtiles.sum())
    # block mode (round 8): per-block kernel with a static (type, chunk)
    # inner loop — supersedes span mode when it engages.  'auto' engages
    # only when the T2·cmax slot grid doesn't balloon vs the real tile
    # count (cmax = max chunks of any group: a hub group forces every
    # block to carry that many slots) and the slot array fits SMEM.
    cmax = max(int(gtiles.max(initial=0)), 1)
    S8 = _rup(T2 * cmax, 8)
    n_slots = n_blocks * S8
    block_ok = ((block_mode is not False) and A == 16
                and span_rows <= SPAN_ROW_CAP)
    if block_ok and block_mode == "auto":
        block_ok = (cmax <= 8 and n_slots <= BLOCK_SLOT_CAP
                    and n_slots <= 3 * max(n_real, 1) + 8 * n_blocks)
    if block_mode is True and not block_ok:
        import warnings
        warnings.warn(
            "block_mode=True cannot be honored (needs edge_align=16 and "
            f"max block span {span_rows} <= {SPAN_ROW_CAP}); falling back "
            "to the per-tile kernel", stacklevel=2)
    if span_mode is True and block_ok:
        # ADVICE r4: never let an explicit request silently measure a
        # different path — the block kernel supersedes span mode
        import warnings
        warnings.warn(
            "span_mode=True is superseded by block mode (engaged); pass "
            "block_mode=False to A/B the per-tile span kernel",
            stacklevel=2)
    span_auto = span_mode == "auto"
    span_mode = ((True if span_auto else bool(span_mode))
                 and (A == 16) and span_rows <= SPAN_ROW_CAP
                 and not block_ok)
    if span_mode or block_ok:
        # every block's [start, start + span_rows) DMA window must stay
        # inside the pack
        e_pack = max(e_pack, int(blk_start.max(initial=0)) + span_rows)
    grp_idx = np.nonzero(gtiles)[0]
    reps = gtiles[grp_idx]
    t_gid = np.repeat(grp_idx, reps)
    t_k = np.arange(n_real) - np.repeat(np.cumsum(reps) - reps, reps)
    # packed edge positions (shared by both kernel families)
    first_of_g = np.zeros(n_groups, np.int64)
    first_of_g[1:] = np.cumsum(gcnt)[:-1]
    rank = np.arange(src.shape[0]) - first_of_g[gid]
    pos = gbase[gid] + rank
    gather_idx = np.zeros(e_pack, np.int32)
    gather_idx[pos] = src.astype(np.int32)
    arrays = {"gather_idx": jnp.asarray(gather_idx),
              "indeg": jnp.asarray(
                  np.bincount(typ * np.int64(n_nodes_pad) + dst,
                              minlength=T2 * n_nodes_pad)
                  .reshape(T2, n_nodes_pad).astype(np.float32))}
    chunks = None
    if block_ok:
        # per-slot pack offsets, PRE-DIVIDED by 16 (the kernel rescales
        # off16·16 so Mosaic can prove the dynamic VMEM slice 16-aligned)
        # and RELATIVE to the block's span start; -1 = no chunk.  Slot
        # (b, t, c) lives at b·S8 + t·cmax + c.
        slot_off16 = np.full(n_slots, -1, np.int32)
        slot_idx = ((t_gid // T2) * S8 + (t_gid % T2) * cmax + t_k)
        slot_off16[slot_idx] = ((gbase[t_gid] + t_k * tile_e
                                 - blk_start[t_gid // T2]) // 16)
        # block-contiguous dstl stream: block b's slots at rows
        # [b·S8, (b+1)·S8) — ONE 8-aligned DMA per block, and each
        # slot's row is a STATIC VMEM index inside the kernel
        dstl_blk = np.full((n_slots, tile_e), -1, np.int32)
        e_slot = block * np.int64(S8) + typ * cmax + rank // tile_e
        dstl_blk[e_slot, rank % tile_e] = dst - block * BLOCK_N
        arrays["slot_off16"] = jnp.asarray(slot_off16)
        arrays["dstl_blk"] = jnp.asarray(dstl_blk)
    else:
        # per-tile enumeration (+1 dummy tile per empty block so the
        # flat kernel zero-inits every output block)
        btiles = gtiles.reshape(n_blocks, T2).sum(1)
        need_dummy = btiles == 0
        t_block = (t_gid // T2).astype(np.int32)
        t_type = (t_gid % T2).astype(np.int32)
        t_off = ((gbase[t_gid] + t_k * tile_e) // A).astype(np.int32)
        db = np.nonzero(need_dummy)[0].astype(np.int32)
        all_block = np.concatenate([t_block, db])
        all_type = np.concatenate([t_type, np.zeros(db.size, np.int32)])
        all_off = np.concatenate([t_off, np.full(db.size, -1, np.int32)])
        o2 = np.argsort(all_block, kind="stable")
        block_of_tile = all_block[o2]
        tile_type = all_type[o2]
        tile_msg_off = all_off[o2]            # -1 marks a dummy tile
        c_off = np.where(o2 < n_real, o2, 0).astype(np.int32)
        tile_start = np.zeros(n_blocks + 1, np.int32)
        np.cumsum(np.bincount(block_of_tile, minlength=n_blocks),
                  out=tile_start[1:])
        # real-tile index of each edge: group's first tile + rank//tile_e
        gt_first = np.zeros(n_groups, np.int64)
        gt_first[grp_idx] = np.cumsum(reps) - reps
        tile_of_edge = gt_first[gid] + rank // tile_e
        # compact dst-local stream [n_real_tiles, tile_e] i32 (−1 = no
        # edge): the kernel synthesizes each tile's one-hot as (iota ==
        # dstl row) on the VPU — 4·tile_e bytes/tile instead of the
        # 128·tile_e int8 one-hot matrix (32× less DMA on the side
        # stream).  Rows are DMA'd as 8-row-aligned slices (Mosaic
        # sublane rule for i32).
        dstl = np.full((_rup(max(n_real, 1), 8), tile_e), -1, np.int32)
        dstl[tile_of_edge, rank % tile_e] = dst - block * BLOCK_N
        arrays.update(
            {"dstl": jnp.asarray(dstl),
             "tile_start": jnp.asarray(tile_start),
             "block_of_tile": jnp.asarray(block_of_tile),
             "tile_msg_off": jnp.asarray(tile_msg_off),
             "c_off": jnp.asarray(c_off),
             "tile_type": jnp.asarray(tile_type)})
        chunks = _chunk_blocks(tile_start, smem_tile_cap)
    if span_mode or block_ok:
        # stored PRE-DIVIDED by 16: the kernel rescales (off16 * 16) so
        # Mosaic can statically prove sublane alignment of the dynamic
        # VMEM slice (a raw data-dependent index fails to compile)
        arrays["blk_off16"] = jnp.asarray(
            (blk_start // 16).astype(np.int32))
    grad_meta = None
    if with_grad:
        # transposed grouping by block-major table row for the backward's
        # typed reverse scatter (same machinery as the legacy path)
        grow = (src // 128) * (T2 * 128) + typ * 128 + src % 128
        n_rows_grad = _rup_block(T2 * n_nodes_pad)
        if grad_tile_e is None:
            avg = max(1, src.shape[0] * BLOCK_N // max(n_rows_grad, 1))
            grad_tile_e = 128
            while grad_tile_e < min(avg, 2048):
                grad_tile_e *= 2
        # OCTET grad layout (round 8): the grad grouping has T2x more,
        # tiny blocks (~1-2 tiles each) — per-tile DMA machinery is the
        # dominant cost there.  Process 8 CONTIGUOUS grad blocks per
        # kernel iteration: one pack span DMA, one dstl DMA, one
        # [8·128, D] output DMA per octet, and a python-static
        # (block-in-octet, chunk) inner loop (see _grad_octet_kernel).
        # Engages with block mode (block_mode is not False) when the
        # slot grid stays bounded; hub layouts keep the per-tile path.
        if block_mode is not False:
            gb = (grow // BLOCK_N).astype(np.int64)
            B_g = n_rows_grad // BLOCK_N
            gcnt_g = np.bincount(gb, minlength=B_g)
            gchunks = -(-gcnt_g // grad_tile_e)
            C_g = max(int(gchunks.max(initial=0)), 1)
            n_oct = -(-B_g // 8)
            R8 = _rup(8 * C_g, 8)
            gb_base = np.zeros(B_g + 1, np.int64)
            np.cumsum(-(-gcnt_g // 16) * 16, out=gb_base[1:])
            oct_start = gb_base[np.minimum(np.arange(n_oct) * 8, B_g)]
            oct_end = gb_base[np.minimum(np.arange(1, n_oct + 1) * 8,
                                         B_g)]
            span8 = _rup(int((oct_end - oct_start).max(initial=0))
                         + grad_tile_e, 16)
            n_real_g = int(gchunks.sum())
            octet_ok = (C_g <= 8 and n_oct * 8 * C_g <= BLOCK_SLOT_CAP
                        and span8 <= SPAN_ROW_CAP
                        and n_oct * 8 * C_g
                        <= 3 * max(n_real_g, 1) + 8 * B_g)
        else:
            octet_ok = False
        if octet_ok:
            order_g = np.lexsort((dst, gb))
            g_dst = dst[order_g]           # gather rows into da
            ggb = gb[order_g]
            g_local = (grow % BLOCK_N)[order_g]
            first_g = np.zeros(B_g + 1, np.int64)
            first_g[1:] = np.cumsum(gcnt_g)
            rank_g = np.arange(g_dst.shape[0]) - first_g[ggb]
            pos_g = gb_base[ggb] + rank_g
            e_pack_g = int(gb_base[-1]) + grad_tile_e
            e_pack_g = max(e_pack_g,
                           int(oct_start.max(initial=0)) + span8)
            g_gather = np.zeros(e_pack_g, np.int32)
            g_gather[pos_g] = g_dst.astype(np.int32)
            # slot (grad block, chunk) -> pack offset relative to the
            # octet span start, pre-divided by 16; -1 = no chunk
            slot_off = np.full(n_oct * 8 * C_g, -1, np.int32)
            nz = np.nonzero(gchunks)[0]
            reps_g = gchunks[nz]
            t_gb = np.repeat(nz, reps_g)
            t_c = (np.arange(int(reps_g.sum()))
                   - np.repeat(np.cumsum(reps_g) - reps_g, reps_g))
            slot_off[t_gb * C_g + t_c] = (
                (gb_base[t_gb] + t_c * grad_tile_e
                 - oct_start[t_gb // 8]) // 16)
            c_of = rank_g // grad_tile_e
            g_dstl = np.full((n_oct * R8, grad_tile_e), -1, np.int32)
            g_dstl[(ggb // 8) * R8 + (ggb % 8) * C_g + c_of,
                   rank_g % grad_tile_e] = g_local
            arrays["g_gather_idx"] = jnp.asarray(g_gather)
            arrays["g_slot_off16"] = jnp.asarray(slot_off)
            arrays["g_dstl_oct"] = jnp.asarray(g_dstl)
            arrays["g_oblk16"] = jnp.asarray(
                (oct_start // 16).astype(np.int32))
            arrays["g_indeg"] = arrays["indeg"]
            grad_meta = ("octet", B_g, grad_tile_e, C_g, R8, span8,
                         n_oct)
        else:
            g = build_dst_block_layout(
                edge_src=dst, edge_dst=grow, edge_type=np.zeros_like(typ),
                edge_mask=np.ones(dst.shape[0], np.float32),
                n_nodes_pad=n_rows_grad, tile_e=grad_tile_e,
                onehot_stream=True, n_src_rows=n_nodes_pad,
                edge_align=(16 if grad_tile_e % 16 == 0 else None),
                # compact dstl grad stream (one-hots synthesized in-
                # kernel): the int8 g stream was ~128·E bytes ≈ 1 GB/
                # prop-step at 8M edges; the dstl stream is 4·E
                dstl_stream=grad_tile_e % 16 == 0)
            arrays["g_gather_idx"] = jnp.asarray(g.gather_idx)
            arrays["g_tile_start"] = jnp.asarray(g.tile_start)
            arrays["g_block_of_tile"] = jnp.asarray(g.block_of_tile)
            if g.dstl is not None:
                arrays["g_dstl"] = jnp.asarray(g.dstl)
            else:
                arrays["g_onehot"] = jnp.asarray(g.onehot)
            if g.tile_msg_off is not None:
                arrays["g_tile_msg_off"] = jnp.asarray(g.tile_msg_off)
            arrays["g_indeg"] = arrays["indeg"]
            grad_meta = (g.n_blocks, g.max_tiles, g.tile_e,
                         g.onehot is not None, g.edge_align,
                         _chunk_blocks(g.tile_start, smem_tile_cap))
    if span_mode and span_auto and chunks is not None:
        # auto: certified-bad combination (chunked + span, −37% at 1M)
        span_mode = False
        arrays.pop("blk_off16", None)
    meta = (n_nodes_pad, tile_e, 0, n_blocks, True, grad_meta,
            edge_align, "typed", chunks,
            span_rows if span_mode else None,
            (S8, cmax, span_rows) if block_ok else None)
    return DeviceScatterLayout(meta=meta, arrays=arrays)


def _typed_onehot_kernel(block_of_tile_ref, off_ref, tile_start_ref,
                         c_off_ref, type_ref, *rest, tile_e, align, nbuf,
                         n_blocks, span_rows=None):
    """Mono DMA-ring one-hot scatter with an in-tile TYPE transform:
    acc += (onehot @ H_tile) · W[type(tile)].  Single program.  The
    one-hot is SYNTHESIZED on the VPU from the tile's dst-local row
    (iota == dstl) — 4·tile_e side-stream bytes/tile instead of the
    128·tile_e int8 matrix; the row is DMA'd as the 8-row-aligned slice
    containing it (Mosaic i32 sublane rule).

    Two h-delivery modes:
    - per-tile (``span_rows=None``): H rows DMA'd per tile at align-unit
      offsets (tiles may overlap groups — overlapped positions carry
      dstl −1 and match no output row);
    - SPAN (round 7): one DMA per dst BLOCK brings its whole contiguous
      pack span into a 2-slot ring; tiles slice it in VMEM at dynamic
      offsets rescaled from pre-divided values (``(off−blk_off16)·16``)
      so Mosaic can prove sublane alignment.  Removes the per-tile DMA
      machinery that dominated the 32K-tile floor (~330 ns/tile
      measured — docs/DESIGN.md "tile-count floor")."""
    span = span_rows is not None
    if span:
        blk_ref = rest[0]
        rest = rest[1:]
    (h_hbm, dstl_hbm, w_hbm, out_hbm, acc, h_buf, o_buf, w_buf, h_sem,
     o_sem, w_sem, out_sem) = rest
    t0 = tile_start_ref[0]
    t1 = tile_start_ref[n_blocks]
    wcp = pltpu.make_async_copy(w_hbm, w_buf, w_sem)
    wcp.start()
    wcp.wait()

    def span_dma(par, b):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(blk_ref[b] * 16, span_rows), :],
            h_buf.at[par], h_sem.at[par])

    def o_dma(slot, t):
        return pltpu.make_async_copy(
            dstl_hbm.at[pl.ds(8 * (c_off_ref[t] // 8), 8), :],
            o_buf.at[slot], o_sem.at[slot])

    def h_dma(slot, t):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(off_ref[t] * align, tile_e), :],
            h_buf.at[slot], h_sem.at[slot])

    def start_in(slot, t):
        @pl.when(off_ref[t] >= 0)
        def _():
            if not span:
                h_dma(slot, t).start()
            o_dma(slot, t).start()

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)
    if span:
        span_dma(0, 0).start()
        if n_blocks > 1:
            span_dma(1, 1).start()

    def out_dma(par, blk):
        return pltpu.make_async_copy(
            acc.at[par], out_hbm.at[pl.ds(blk * BLOCK_N, BLOCK_N), :],
            out_sem.at[par])

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        par = jax.lax.rem(blk, 2)
        first = t == tile_start_ref[blk]
        last = t == tile_start_ref[blk + 1] - 1
        real = off_ref[t] >= 0

        @pl.when(jnp.logical_and(first, blk >= 2))
        def _():
            out_dma(par, blk - 2).wait()

        if span:
            @pl.when(first)
            def _():
                span_dma(par, blk).wait()

        @pl.when(jnp.logical_and(first, jnp.logical_not(real)))
        def _():
            acc[par] = jnp.zeros_like(acc[par])

        @pl.when(real)
        def _():
            if not span:
                h_dma(slot, t).wait()
            o_dma(slot, t).wait()
            # select the tile's dstl row from the 8-row slice, then
            # synthesize the one-hot as (row iota == dstl); −1 (padding /
            # group overlap) matches nothing
            r = c_off_ref[t] % 8
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, tile_e), 0) == r
            row = jnp.sum(jnp.where(sel, o_buf[slot], 0), axis=0,
                          keepdims=True)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, tile_e), 0)
                  == row).astype(h_buf.dtype)
            if span:
                seg = h_buf[par, pl.ds((off_ref[t] - blk_ref[blk]) * 16,
                                       tile_e), :]
            else:
                seg = h_buf[slot]
            p0 = jnp.dot(oh, seg, preferred_element_type=jnp.float32)
            prod = jnp.dot(p0.astype(w_buf.dtype), w_buf[type_ref[t]],
                           preferred_element_type=jnp.float32)

            @pl.when(first)
            def _():
                acc[par] = prod

            @pl.when(jnp.logical_not(first))
            def _():
                acc[par] = acc[par] + prod

        @pl.when(t + nbuf < t1)
        def _():
            start_in(slot, t + nbuf)

        @pl.when(last)
        def _():
            out_dma(par, blk).start()
            if span:
                # h_buf[par] is free only now (this block's reads done) —
                # start the NEXT same-parity block's span here, one full
                # block of compute ahead of its first use
                @pl.when(blk + 2 < n_blocks)
                def _():
                    span_dma(par, blk + 2).start()

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    if n_blocks >= 2:
        out_dma((n_blocks - 2) % 2, n_blocks - 2).wait()
    out_dma((n_blocks - 1) % 2, n_blocks - 1).wait()


def _typed_step_kernel(block_of_tile_ref, off_ref, tile_start_ref,
                       c_off_ref, type_ref, *rest, tile_e, align, nbuf,
                       n_blocks, span_rows=None):
    """:func:`_typed_onehot_kernel` + a GRU epilogue (the window step
    kernel's structure on the typed pack): per dst block the accumulator
    initializes from ``init_hbm`` (the Σ_t indeg_t·b_t bias — complete
    before the kernel), and at the block's last tile the GRU update runs
    in-kernel on the VMEM-resident ``a`` — the [N, D] a round-trip and
    the separate GRU pass (~3.6 ms/step at 262K nodes) disappear from
    the serving path.  Forward-only: the training path recomputes the
    unfused composition inside the custom VJP's fwd rule
    (models/ggnn.py)."""
    span = span_rows is not None
    if span:
        blk_ref = rest[0]
        rest = rest[1:]
    (h_hbm, dstl_hbm, w_hbm, init_hbm, hst_hbm, wa_ref, b_ref, uzr_ref,
     uh_ref, out_hbm, acc, h_buf, o_buf, w_buf, init_buf, hst_buf, h_sem,
     o_sem, w_sem, init_sem, hst_sem, out_sem) = rest
    t0 = tile_start_ref[0]
    t1 = tile_start_ref[n_blocks]
    D = out_hbm.shape[-1]
    wcp = pltpu.make_async_copy(w_hbm, w_buf, w_sem)
    wcp.start()
    wcp.wait()

    def span_dma(par, b):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(blk_ref[b] * 16, span_rows), :],
            h_buf.at[par], h_sem.at[par])

    def o_dma(slot, t):
        return pltpu.make_async_copy(
            dstl_hbm.at[pl.ds(8 * (c_off_ref[t] // 8), 8), :],
            o_buf.at[slot], o_sem.at[slot])

    def h_dma(slot, t):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(off_ref[t] * align, tile_e), :],
            h_buf.at[slot], h_sem.at[slot])

    def start_in(slot, t):
        @pl.when(off_ref[t] >= 0)
        def _():
            if not span:
                h_dma(slot, t).start()
            o_dma(slot, t).start()

    def st_dma(par, blk):
        return [pltpu.make_async_copy(
                    init_hbm.at[pl.ds(blk * BLOCK_N, BLOCK_N), :],
                    init_buf.at[par], init_sem.at[par]),
                pltpu.make_async_copy(
                    hst_hbm.at[pl.ds(blk * BLOCK_N, BLOCK_N), :],
                    hst_buf.at[par], hst_sem.at[par])]

    def out_dma(par, blk):
        return pltpu.make_async_copy(
            acc.at[par], out_hbm.at[pl.ds(blk * BLOCK_N, BLOCK_N), :],
            out_sem.at[par])

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)
    if span:
        span_dma(0, 0).start()
        if n_blocks > 1:
            span_dma(1, 1).start()
    for d in st_dma(0, 0):
        d.start()
    if n_blocks >= 2:
        for d in st_dma(1, 1):
            d.start()

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        par = jax.lax.rem(blk, 2)
        first = t == tile_start_ref[blk]
        last = t == tile_start_ref[blk + 1] - 1
        real = off_ref[t] >= 0

        @pl.when(jnp.logical_and(first, blk >= 2))
        def _():
            out_dma(par, blk - 2).wait()

        @pl.when(first)
        def _():
            for d in st_dma(par, blk):
                d.wait()
            acc[par] = init_buf[par]

        if span:
            @pl.when(first)
            def _():
                span_dma(par, blk).wait()

        @pl.when(real)
        def _():
            if not span:
                h_dma(slot, t).wait()
            o_dma(slot, t).wait()
            r = c_off_ref[t] % 8
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, tile_e), 0) == r
            row = jnp.sum(jnp.where(sel, o_buf[slot], 0), axis=0,
                          keepdims=True)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, tile_e), 0)
                  == row).astype(h_buf.dtype)
            if span:
                seg = h_buf[par, pl.ds((off_ref[t] - blk_ref[blk]) * 16,
                                       tile_e), :]
            else:
                seg = h_buf[slot]
            p0 = jnp.dot(oh, seg, preferred_element_type=jnp.float32)
            acc[par] = acc[par] + jnp.dot(
                p0.astype(w_buf.dtype), w_buf[type_ref[t]],
                preferred_element_type=jnp.float32)

        @pl.when(t + nbuf < t1)
        def _():
            start_in(slot, t + nbuf)

        @pl.when(last)
        def _():
            a = acc[par]
            hblk = hst_buf[par]
            cdt = wa_ref.dtype
            pa = jnp.dot(a.astype(cdt), wa_ref[...],
                         preferred_element_type=jnp.float32) + b_ref[...]
            ph = jnp.dot(hblk.astype(cdt), uzr_ref[...],
                         preferred_element_type=jnp.float32)
            z = jax.nn.sigmoid(pa[:, :D] + ph[:, :D])
            rg = jax.nn.sigmoid(pa[:, D:2 * D] + ph[:, D:])
            htil = jnp.tanh(pa[:, 2 * D:]
                            + jnp.dot((rg * hblk).astype(cdt), uh_ref[...],
                                      preferred_element_type=jnp.float32))
            acc[par] = (1.0 - z) * hblk + z * htil
            out_dma(par, blk).start()
            if span:
                # h_buf[par] frees only now — start the next same-parity
                # block's span with one block of compute as lead time
                @pl.when(blk + 2 < n_blocks)
                def _():
                    span_dma(par, blk + 2).start()

            @pl.when(blk + 2 < n_blocks)
            def _():
                for d in st_dma(par, blk + 2):
                    d.start()

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    if n_blocks >= 2:
        out_dma((n_blocks - 2) % 2, n_blocks - 2).wait()
    out_dma((n_blocks - 1) % 2, n_blocks - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "align", "nbuf",
                                    "span_rows", "interpret"))
def typed_step_gru(h_pack, dstl, tile_start, block_of_tile,
                   tile_msg_off, c_off, tile_type, msg_w, init, hstate,
                   wa, b3, uzr, uh, n_blocks: int, tile_e: int, align: int,
                   nbuf: int = 6, blk_off16=None,
                   span_rows: int | None = None, interpret: bool = False):
    """Fused typed-pack aggregation + GRU step (see
    :func:`_typed_step_kernel`).  ``init`` [n_rows, D] f32 is the bias
    partial (Σ_t indeg_t·b_t); ``hstate`` [n_rows, D] f32 the padded
    node state; GRU weights in the compute dtype.  Returns h_new f32."""
    D = h_pack.shape[-1]
    span = span_rows is not None and blk_off16 is not None
    if span and 2 * span_rows * D * h_pack.dtype.itemsize > SPAN_VMEM_BYTES:
        # ADVICE r4: the layout builder caps the span ring by ROWS only —
        # D/dtype are call-time facts; an over-budget ring (e.g. D=256
        # bf16 near SPAN_ROW_CAP) must drop to per-tile DMAs, not fail
        # to compile against the 16 MB scoped-VMEM limit
        span = False
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if span else 5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, span_rows, D) if span
                       else (nbuf, tile_e, D), h_pack.dtype),
            pltpu.VMEM((nbuf, 8, tile_e), jnp.int32),
            pltpu.VMEM(msg_w.shape, msg_w.dtype),
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,) if span else (nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_typed_step_kernel, tile_e=tile_e,
                               align=align, nbuf=nbuf, n_blocks=n_blocks,
                               span_rows=span_rows if span else None)
    n_tiles = block_of_tile.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * BLOCK_N * tile_e * D
            + 2 * n_tiles * BLOCK_N * D * D
            + n_blocks * BLOCK_N * D * 6 * D * 2,
            bytes_accessed=n_tiles
            * (tile_e * D * h_pack.dtype.itemsize + 8 * tile_e * 4)
            + n_blocks * BLOCK_N * D * 4 * 3,
            transcendentals=3 * n_blocks * BLOCK_N * D,
        ),
    )(block_of_tile, tile_msg_off, tile_start, c_off, tile_type,
      *([blk_off16] if span else []),
      h_pack, dstl, msg_w, init, hstate, wa, b3, uzr, uh)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "align", "nbuf",
                                    "span_rows", "interpret"))
def typed_onehot_scatter(h_pack, dstl, tile_start, block_of_tile,
                         tile_msg_off, c_off, tile_type, msg_w,
                         n_blocks: int, tile_e: int, align: int,
                         nbuf: int = 6, blk_off16=None,
                         span_rows: int | None = None,
                         interpret: bool = False):
    """out[b·128:(b+1)·128] = Σ_tiles(b) (onehot_tile @ H_tile) · W[t_tile].
    ``h_pack`` [E_pack, D] = gathered h rows (packed per (block, type) at
    align-row offsets); ``dstl`` [n_real_tiles_pad8, tile_e] i32 dst-local
    rows (−1 = no edge) from which the kernel synthesizes each one-hot.
    With ``span_rows``/``blk_off16`` the kernel runs in SPAN mode: one h
    DMA per dst block instead of per tile (see _typed_onehot_kernel)."""
    D = h_pack.shape[-1]
    span = span_rows is not None and blk_off16 is not None
    if span and 2 * span_rows * D * h_pack.dtype.itemsize > SPAN_VMEM_BYTES:
        # ADVICE r4: byte-based fallback — see typed_step_gru above
        span = False
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if span else 5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, span_rows, D) if span
                       else (nbuf, tile_e, D), h_pack.dtype),
            pltpu.VMEM((nbuf, 8, tile_e), jnp.int32),
            pltpu.VMEM(msg_w.shape, msg_w.dtype),
            pltpu.SemaphoreType.DMA((2,) if span else (nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_typed_onehot_kernel, tile_e=tile_e,
                               align=align, nbuf=nbuf, n_blocks=n_blocks,
                               span_rows=span_rows if span else None)
    args = [block_of_tile, tile_msg_off, tile_start, c_off, tile_type]
    if span:
        args.append(blk_off16)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * block_of_tile.shape[0] * BLOCK_N * tile_e * D
            + 2 * block_of_tile.shape[0] * BLOCK_N * D * D,
            bytes_accessed=block_of_tile.shape[0]
            * (tile_e * D * h_pack.dtype.itemsize + 8 * tile_e * 4)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(*args, h_pack, dstl, msg_w)


# ---------------------------------------------------------------------------
# Per-BLOCK typed kernels (round 8): the per-tile loop above pays ~330 ns
# of fixed scalar machinery per tile (8 SMEM stream reads, 6 branches,
# DMA semaphores, loop arithmetic) against a 32K-tile structural floor —
# docs/DESIGN.md "tile-count floor".  Here the grid/fori runs over dst
# BLOCKS: per block ONE h span DMA + ONE dstl-range DMA (2-slot rings),
# then a PYTHON-STATIC (type, chunk) inner loop whose per-slot work is a
# single SMEM offset read, a provably-16-aligned dynamic VMEM slice
# (off16·16 — the span-mode alignment pattern), a static dstl row read, a
# one-hot synth and two MXU dots with a STATIC w_buf[t] index.  The
# dynslice prototype (scripts/bench_r4_dynslice_proto.py) ran this inner
# work at 112 ns/chunk vs the production 420 ns/tile.
# ---------------------------------------------------------------------------


def _typed_block_kernel(slot_ref, blk_ref, *rest, tile_e, S8, cmax, T2,
                        n_blocks, span_rows, fused, guard):
    """Per-block typed one-hot scatter (optionally with the GRU epilogue
    of :func:`_typed_step_kernel`).  ``guard=True`` skips empty slots
    behind a scalar branch; ``guard=False`` clamps their offset to 0 and
    relies on the all(-1) dstl row producing a zero one-hot (no branches
    — better when the slot grid is nearly dense)."""
    if fused:
        (h_hbm, dstl_hbm, w_hbm, init_hbm, hst_hbm, wa_ref, b_ref, uzr_ref,
         uh_ref, out_hbm, acc, h_buf, o_buf, w_buf, init_buf, hst_buf,
         h_sem, o_sem, w_sem, init_sem, hst_sem, out_sem) = rest
    else:
        (h_hbm, dstl_hbm, w_hbm, out_hbm, acc, h_buf, o_buf, w_buf,
         h_sem, o_sem, w_sem, out_sem) = rest
    D = out_hbm.shape[-1]
    wcp = pltpu.make_async_copy(w_hbm, w_buf, w_sem)
    wcp.start()
    wcp.wait()

    def span_dma(par, b):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(blk_ref[b] * 16, span_rows), :],
            h_buf.at[par], h_sem.at[par])

    def o_dma(par, b):
        return pltpu.make_async_copy(
            dstl_hbm.at[pl.ds(b * S8, S8), :], o_buf.at[par],
            o_sem.at[par])

    if fused:
        def st_dma(par, b):
            return [pltpu.make_async_copy(
                        init_hbm.at[pl.ds(b * BLOCK_N, BLOCK_N), :],
                        init_buf.at[par], init_sem.at[par]),
                    pltpu.make_async_copy(
                        hst_hbm.at[pl.ds(b * BLOCK_N, BLOCK_N), :],
                        hst_buf.at[par], hst_sem.at[par])]

    def start_blk(par, b):
        span_dma(par, b).start()
        o_dma(par, b).start()
        if fused:
            for d in st_dma(par, b):
                d.start()

    def out_dma(par, b):
        return pltpu.make_async_copy(
            acc.at[par], out_hbm.at[pl.ds(b * BLOCK_N, BLOCK_N), :],
            out_sem.at[par])

    start_blk(0, 0)
    if n_blocks > 1:
        start_blk(1, 1)

    def body(b, _):
        par = jax.lax.rem(b, 2)

        @pl.when(b >= 2)
        def _():
            out_dma(par, b - 2).wait()

        span_dma(par, b).wait()
        o_dma(par, b).wait()
        if fused:
            for d in st_dma(par, b):
                d.wait()
            acc[par] = init_buf[par]
        else:
            acc[par] = jnp.zeros_like(acc[par])
        for t in range(T2):
            for c in range(cmax):
                s = t * cmax + c
                off = slot_ref[b * S8 + s]

                def chunk(off=off, s=s, t=t):
                    seg = h_buf[par, pl.ds(off * 16, tile_e), :]
                    row = o_buf[par, pl.ds(s, 1), :]       # [1, tile_e]
                    oh = (jax.lax.broadcasted_iota(
                        jnp.int32, (BLOCK_N, tile_e), 0) == row
                    ).astype(h_buf.dtype)
                    p0 = jnp.dot(oh, seg,
                                 preferred_element_type=jnp.float32)
                    acc[par] = acc[par] + jnp.dot(
                        p0.astype(w_buf.dtype), w_buf[t],
                        preferred_element_type=jnp.float32)

                if guard:
                    pl.when(off >= 0)(chunk)
                else:
                    chunk(off=jnp.maximum(off, 0))
        if fused:
            a = acc[par]
            hblk = hst_buf[par]
            cdt = wa_ref.dtype
            pa = jnp.dot(a.astype(cdt), wa_ref[...],
                         preferred_element_type=jnp.float32) + b_ref[...]
            ph = jnp.dot(hblk.astype(cdt), uzr_ref[...],
                         preferred_element_type=jnp.float32)
            z = jax.nn.sigmoid(pa[:, :D] + ph[:, :D])
            rg = jax.nn.sigmoid(pa[:, D:2 * D] + ph[:, D:])
            htil = jnp.tanh(pa[:, 2 * D:]
                            + jnp.dot((rg * hblk).astype(cdt), uh_ref[...],
                                      preferred_element_type=jnp.float32))
            acc[par] = (1.0 - z) * hblk + z * htil
        out_dma(par, b).start()

        @pl.when(b + 2 < n_blocks)
        def _():
            # h_buf/o_buf[par] reads are done (the static loop completed)
            # — issue block b+2's DMAs with one block of compute as lead
            start_blk(par, b + 2)

        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)
    if n_blocks >= 2:
        out_dma((n_blocks - 2) % 2, n_blocks - 2).wait()
    out_dma((n_blocks - 1) % 2, n_blocks - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "S8", "cmax",
                                    "span_rows", "guard", "interpret"))
def typed_block_scatter(h_pack, dstl_blk, slot_off16, blk_off16, msg_w,
                        n_blocks: int, tile_e: int, S8: int, cmax: int,
                        span_rows: int, guard: bool = False,
                        interpret: bool = False):
    """Per-block typed-pack scatter: out[b·128:(b+1)·128] =
    Σ_{t,c} (onehot(b,t,c) @ H_chunk) · W_t with a python-static (t, c)
    loop (see :func:`_typed_block_kernel`)."""
    D = h_pack.shape[-1]
    T2 = msg_w.shape[0]
    if 2 * span_rows * D * h_pack.dtype.itemsize > SPAN_VMEM_BYTES:
        raise ValueError(
            f"block-mode span ring 2x{span_rows}x{D} in "
            f"{h_pack.dtype} exceeds the ~{SPAN_VMEM_BYTES >> 20} MB VMEM "
            "budget; rebuild the layout with block_mode=False")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, span_rows, D), h_pack.dtype),
            pltpu.VMEM((2, S8, tile_e), jnp.int32),
            pltpu.VMEM(msg_w.shape, msg_w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_typed_block_kernel, tile_e=tile_e, S8=S8,
                               cmax=cmax, T2=T2, n_blocks=n_blocks,
                               span_rows=span_rows, fused=False,
                               guard=guard)
    n_chunks = slot_off16.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * BLOCK_N * tile_e * D
            + 2 * n_chunks * BLOCK_N * D * D,
            bytes_accessed=n_blocks
            * (span_rows * D * h_pack.dtype.itemsize + S8 * tile_e * 4)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(slot_off16, blk_off16, h_pack, dstl_blk, msg_w)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "tile_e", "S8", "cmax",
                                    "span_rows", "guard", "interpret"))
def typed_block_step_gru(h_pack, dstl_blk, slot_off16, blk_off16, msg_w,
                         init, hstate, wa, b3, uzr, uh, n_blocks: int,
                         tile_e: int, S8: int, cmax: int, span_rows: int,
                         guard: bool = False, interpret: bool = False):
    """Fused per-block typed aggregation + GRU step (the block-mode
    counterpart of :func:`typed_step_gru`): ``init`` [n_rows, D] f32 is
    the Σ_t indeg_t·b_t bias partial, ``hstate`` the padded node state;
    returns h_new f32."""
    D = h_pack.shape[-1]
    T2 = msg_w.shape[0]
    if 2 * span_rows * D * h_pack.dtype.itemsize > SPAN_VMEM_BYTES:
        raise ValueError(
            f"block-mode span ring 2x{span_rows}x{D} in "
            f"{h_pack.dtype} exceeds the ~{SPAN_VMEM_BYTES >> 20} MB VMEM "
            "budget; rebuild the layout with block_mode=False")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, span_rows, D), h_pack.dtype),
            pltpu.VMEM((2, S8, tile_e), jnp.int32),
            pltpu.VMEM(msg_w.shape, msg_w.dtype),
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, BLOCK_N, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_typed_block_kernel, tile_e=tile_e, S8=S8,
                               cmax=cmax, T2=T2, n_blocks=n_blocks,
                               span_rows=span_rows, fused=True,
                               guard=guard)
    n_chunks = slot_off16.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * BLOCK_N * tile_e * D
            + 2 * n_chunks * BLOCK_N * D * D
            + n_blocks * BLOCK_N * D * 6 * D * 2,
            bytes_accessed=n_blocks
            * (span_rows * D * h_pack.dtype.itemsize + S8 * tile_e * 4)
            + n_blocks * BLOCK_N * D * 4 * 3,
            transcendentals=3 * n_blocks * BLOCK_N * D,
        ),
    )(slot_off16, blk_off16, h_pack, dstl_blk, msg_w, init, hstate, wa,
      b3, uzr, uh)


def _grad_octet_kernel(slot_ref, oblk_ref, g_hbm, dstl_hbm, out_hbm, acc,
                       cast_buf, g_buf, o_buf, g_sem, o_sem, out_sem, *,
                       g_tile, C, R8, n_oct, span8, cast_out):
    """OCTET reverse scatter (round 8): the typed backward's grad
    grouping has T2x more, tiny (1-2 tile) blocks — per-tile DMA
    machinery dominated it.  Each fori iteration covers 8 CONTIGUOUS
    grad blocks: one pack span DMA, one dstl DMA, one [8·128, D] output
    DMA, and a python-static (block-in-octet, chunk) loop whose per-slot
    work is one SMEM offset read, a provable dynamic VMEM slice
    (off16·16), a static dstl row and a single one-hot MXU dot into the
    octet accumulator's static row range.  No branches: empty slots
    clamp their offset to 0 and their all(−1) dstl row produces a zero
    one-hot."""
    OCT = 8 * BLOCK_N

    def span_dma(par, o):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(oblk_ref[o] * 16, span8), :],
            g_buf.at[par], g_sem.at[par])

    def o_dma(par, o):
        return pltpu.make_async_copy(
            dstl_hbm.at[pl.ds(o * R8, R8), :], o_buf.at[par],
            o_sem.at[par])

    def out_dma(par, o):
        src = cast_buf.at[par] if cast_out else acc.at[par]
        return pltpu.make_async_copy(
            src, out_hbm.at[pl.ds(o * OCT, OCT), :], out_sem.at[par])

    def start_oct(par, o):
        span_dma(par, o).start()
        o_dma(par, o).start()

    start_oct(0, 0)
    if n_oct > 1:
        start_oct(1, 1)

    def body(o, _):
        par = jax.lax.rem(o, 2)

        @pl.when(o >= 2)
        def _():
            out_dma(par, o - 2).wait()

        span_dma(par, o).wait()
        o_dma(par, o).wait()
        acc[par] = jnp.zeros_like(acc[par])
        for j in range(8):
            for c in range(C):
                off = jnp.maximum(slot_ref[(o * 8 + j) * C + c], 0)
                seg = g_buf[par, pl.ds(off * 16, g_tile), :]
                row = o_buf[par, pl.ds(j * C + c, 1), :]
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_N, g_tile), 0) == row
                ).astype(g_buf.dtype)
                prod = jnp.dot(oh, seg, preferred_element_type=jnp.float32)
                acc[par, pl.ds(j * BLOCK_N, BLOCK_N), :] = \
                    acc[par, pl.ds(j * BLOCK_N, BLOCK_N), :] + prod
        if cast_out:
            cast_buf[par] = acc[par].astype(cast_buf.dtype)
        out_dma(par, o).start()

        @pl.when(o + 2 < n_oct)
        def _():
            start_oct(par, o + 2)

        return 0

    jax.lax.fori_loop(0, n_oct, body, 0)
    if n_oct >= 2:
        out_dma((n_oct - 2) % 2, n_oct - 2).wait()
    out_dma((n_oct - 1) % 2, n_oct - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_oct", "g_tile", "C", "R8", "span8",
                                    "out_dtype", "interpret"))
def typed_grad_octet_scatter(G, dstl_oct, slot_off16, oblk16, n_oct: int,
                             g_tile: int, C: int, R8: int, span8: int,
                             out_dtype=None, interpret: bool = False):
    """Y_flat[row] = Σ_{edges packed to row} G[e] over the octet grad
    layout (see :func:`_grad_octet_kernel`).  ``G`` [E_pack_g, D] is the
    gathered cotangent pack; returns [n_oct·8·128, D] in ``out_dtype``
    (default f32)."""
    D = G.shape[-1]
    out_dtype = jnp.dtype(jnp.float32 if out_dtype is None else out_dtype)
    cast_out = out_dtype != jnp.dtype(jnp.float32)
    if 2 * span8 * D * G.dtype.itemsize > SPAN_VMEM_BYTES:
        raise ValueError(
            f"octet span ring 2x{span8}x{D} in {G.dtype} exceeds the "
            f"~{SPAN_VMEM_BYTES >> 20} MB VMEM budget; rebuild the "
            "layout with block_mode=False")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 8 * BLOCK_N, D), jnp.float32),
            pltpu.VMEM((2, 8 * BLOCK_N, D) if cast_out else (1, 8, 128),
                       out_dtype),
            pltpu.VMEM((2, span8, D), G.dtype),
            pltpu.VMEM((2, R8, g_tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_grad_octet_kernel, g_tile=g_tile, C=C,
                               R8=R8, n_oct=n_oct, span8=span8,
                               cast_out=cast_out)
    n_slots = slot_off16.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_oct * 8 * BLOCK_N, D),
                                       out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * BLOCK_N * g_tile * D,
            bytes_accessed=n_oct
            * (span8 * D * G.dtype.itemsize + R8 * g_tile * 4)
            + n_oct * 8 * BLOCK_N * D * out_dtype.itemsize,
            transcendentals=0,
        ),
    )(slot_off16, oblk16, G, dstl_oct)
