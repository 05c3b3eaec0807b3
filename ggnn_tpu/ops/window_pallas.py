"""Block-CSR windowed typed aggregation: the clustered-graph fast path.

The per-edge random gather is ENGINE-rate-bound on TPU (~11.6 ns/row
measured, independent of dtype, table size, and sort order — see
docs/DESIGN.md), so the only way past it is to stop issuing per-edge
addresses.  On graphs with locality (communities / power-law — the
production regime; uniform random is the adversarial worst case) the
sources feeding one 128-row destination block concentrate in a few
``window``-row ranges of the node-transform table.  This module exploits
that by collapsing BOTH the per-edge gather and the per-edge scatter into
one count matrix per (dst block, source window) pair:

    C[v, w] = #edges (u → v) with table row t·N+u ≡ win·W + w
    out[block] = Σ_win C[block, win] · table[win·W : win·W+W]

i.e. a block-sparse SpMM with dense ``[128, W]`` int8 count blocks — pure
MXU work streamed at HBM bandwidth, NO per-edge random access and no
per-edge streams at all.  Per tile: W·D·2 B of table + 128·W B of counts;
FLOPs 2·128·W·D.  For a community graph (communities ≲ W contiguous
nodes) the whole aggregation runs at ~bandwidth; edges that land in
low-occupancy tiles (cross-community strays — a dense [128, W] block for
<~32 edges wastes bandwidth) SPILL to the per-edge one-hot path
(:mod:`ggnn_tpu.ops.scatter_pallas`), so the structure degrades gracefully
to the uniform-random baseline.

Replaces (TPU-natively) the reference's dense ``bmm`` aggregation
(SURVEY.md §3.2) in the clustered-graph regime; parity-tested against the
XLA segment path on arbitrary topologies.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggnn_tpu.ops.scatter_pallas import (BLOCK_N, build_dst_block_layout,
                                         onehot_segment_scatter_flat)


@dataclasses.dataclass
class DeviceWindowLayout:
    """Jit-argument form of the windowed layout (registered pytree)."""

    meta: tuple   # (n_nodes_pad, window, n_tiles, n_blocks, spill_meta)
    arrays: dict  # c_stream, tile_start, block_of_tile, win_of_tile [+ spill]

    @property
    def n_nodes_pad(self):
        return self.meta[0]

    @property
    def window(self):
        return self.meta[1]

    @property
    def n_tiles(self):
        return self.meta[2]

    @property
    def n_blocks(self):
        return self.meta[3]

    @property
    def spill_meta(self):
        return self.meta[4]

    @property
    def row_major(self):
        return self.meta[5] if len(self.meta) > 5 else "type"

    @property
    def grad_meta(self):
        return self.meta[6] if len(self.meta) > 6 else None

    @property
    def block_rows(self):
        return self.meta[7] if len(self.meta) > 7 else BLOCK_N

    @property
    def packed(self):
        """(fwd, bwd) int4 count-packing flags (see ``pack_counts``)."""
        return self.meta[8] if len(self.meta) > 8 else (False, False)

    @property
    def on_demand(self):
        """Table windows built in VMEM from streamed h blocks (no
        [T2·N, D] table in HBM) — see window_block_spmm_ondemand."""
        return self.meta[9] if len(self.meta) > 9 else False


jax.tree_util.register_pytree_node(
    DeviceWindowLayout,
    lambda l: ((l.arrays,), l.meta),
    lambda meta, children: DeviceWindowLayout(meta=meta, arrays=children[0]))


def _pack_nibbles(c: np.ndarray) -> np.ndarray:
    """[R, W] int8 counts in 0..15 → [R, W/2] bytes: low nibble = col w,
    high nibble = col w + W/2 (so the kernel's mask/shift recovers the two
    contiguous window halves without any lane interleave)."""
    half = c.shape[1] // 2
    out = c[:, half:].astype(np.uint8)   # the one unavoidable copy
    out <<= 4
    np.bitwise_or(out, c[:, :half].view(np.uint8), out=out)
    return out.view(np.int8)


# The per-row gather engine's measured rate cliff (TPU v5e, 2026-08-21,
# scripts/bench_r4_gather_curve_probe.py with LICM-proof chaining):
# ~1.7 ns/row when the gathered buffer is <= ~67 MB, ~5.7 ns/row from
# ~134 MB up — monotonic (a 2.1 GB table gathers at the same 5.7; the
# earlier "fast at >=1 GB" readings were loop-invariant-hoisting
# artifacts).  Rate is per ROW, not per byte — int8 rows gather at the
# bf16 rate unless the narrower dtype moves the BUFFER under the cliff.
GATHER_CLIFF_BYTES = 100e6  # boundary measured in (67 MB, 134 MB)


def prefer_xw_spill(n_nodes_pad: int, state_dim: int, *,
                    quantized: bool = False,
                    on_demand: bool = False) -> bool:
    """Regime heuristic for the spill mode (VERDICT r3 #2).

    Measured A/Bs (262K/8M community vs 1M/20M, BASELINE.md round-6
    matrix + the round-7 probes): with a table, the legacy one-pass
    table-row gather wins or ties the XW typed spill everywhere in bf16
    (262K: 867.4 vs 872.7 — tie; 1M: 432.0 vs 339.0 — legacy +27%,
    because BOTH XW gathers (h 256 MB, msgs pack 284 MB) sit above the
    gather cliff while legacy pays exactly one slow gather).  Under q8
    the legacy spill adds an XLA-level dequant over the spill pack
    (q8+legacy 631.2 at 262K) — XW avoids it and wins (893.0) — but only
    while h sits under the cliff; at 1M q8+legacy (396.9) beats q8+XW
    (375.0).  On-demand layouts have no table and REQUIRE the XW spill."""
    if on_demand:
        return True
    if not quantized:
        return False
    return n_nodes_pad * state_dim * 2 <= GATHER_CLIFF_BYTES


def build_window_layout(edge_src, edge_dst, edge_type, edge_mask,
                        n_nodes_pad: int, window: int = 512,
                        min_edges_per_tile: int = 32,
                        n_src_rows: int | None = None,
                        spill_tile_e: int | None = None,
                        n_message_types: int | None = None,
                        row_major: str = "src",
                        with_grad: bool = False,
                        pad_tiles_to: int | None = None,
                        spill_pad_tiles_to: int | None = None,
                        force_spill: bool = False,
                        block_rows: int = BLOCK_N,
                        pack_counts: bool = False,
                        use_native: bool | None = None,
                        gt_pad_tiles_to: int | None = None,
                        spill_bwd_bucket: int | None = None,
                        spill_bwd_tile_e: int | None = None,
                        spill_bwd_pad_tiles_to: int | None = None,
                        typed_spill: bool = False,
                        spill_dst_order: bool = False,
                        on_demand: bool = False,
                        grad_quant: bool = False) -> DeviceWindowLayout:
    """Host-side (numpy) layout build: group real edges by
    (dst block, table-row window); tiles holding fewer than
    ``min_edges_per_tile`` edges spill to a per-edge one-hot layout.
    Topology-static — built once per batch, reused across steps/rounds.

    ``row_major`` picks the node-transform table layout:
    - ``'block'`` (production): row = (src//128)·T2·128 + t·128 + src%128 —
      same tile count and locality as 'src', but the table materializes
      through a Pallas kernel (:func:`node_table_block_major`) as 16
      full-MXU [128,D]@[D,D] dots per src block, writing the final [R, D]
      layout directly.  The XLA einsum forms all pay a ~3.5 ms hidden
      lane-relayout ([N, T2·D] → [N·T2, D]) + unfused bias at 262K
      nodes/D=128; this kernel runs at the write-bandwidth floor
      (5.3 ms → 1.8 ms measured).  Needs n_src_rows % 128 == 0.
    - ``'src'``: row = src·T2 + t  (einsum ``nd,tdf->ntf``) —
      a community's rows across ALL message types are contiguous, so one
      window of ``csize·T2`` rows covers a dst block's whole in-edge set:
      ~T2× fewer, bigger tiles than type-major (amortizes per-tile cost).
    - ``'type'``: row = t·N + src (the gather-table layout of
      :mod:`scatter_pallas`) — smaller windows when types are sparse.

    ``stats`` (attached to the returned layout as ``.stats``) reports the
    tile count, stream bytes, and spill fraction so callers can decide
    whether the windowed path pays for a given topology.

    ``pack_counts=True`` stores counts as int4 pairs — byte w of a packed
    row holds count[w] in the low nibble and count[w + W/2] in the high
    nibble — halving the count-stream DMA bytes (the dominant stream).
    The kernel unpacks with one mask + one shift on the VPU and contracts
    the two nibbles against the two window halves (same MXU FLOPs).
    Multigraph pairs repeating >15× spill to the per-edge path (vs >127
    unpacked); needs ``window ≥ 256`` (the packed row must still fill the
    128-lane tile), and the transposed backward stream packs only when
    ``block_rows ≥ 256``.

    The ``gt_pad_tiles_to`` / ``spill_bwd_bucket`` / ``spill_bwd_tile_e`` /
    ``spill_bwd_pad_tiles_to`` pins make the BACKWARD (with_grad) array
    shapes and static meta topology-independent, so per-shard grad layouts
    can be np.stack'd to one common shape for shard_map training
    (parallel/partition.build_halo_window_layouts): transposed tiles pad
    to ``gt_pad_tiles_to`` (dummies on the last window), spill-backward
    buckets to a uniform ``spill_bwd_bucket`` per type, and the dh scatter
    layout to a fixed tile size / tile budget."""
    if block_rows % BLOCK_N:
        raise ValueError(f"block_rows must be a multiple of {BLOCK_N}")
    if n_nodes_pad % block_rows:
        raise ValueError("n_nodes_pad must be a multiple of block_rows")
    if row_major not in ("block", "src", "type"):
        raise ValueError(
            f"row_major must be 'block', 'src' or 'type': {row_major!r}")
    pack_fwd = pack_counts and window >= 256
    pack_bwd = pack_counts and block_rows >= 256
    if pack_counts and not pack_fwd:
        raise ValueError("pack_counts needs window >= 256 (a packed row "
                         "of window/2 bytes must fill the 128-lane tile)")
    if on_demand:
        # the forward streams h blocks and builds table windows in VMEM
        # (window_block_spmm_ondemand) — the [T2·N, D] table never exists,
        # so any spill must gather h too (typed_spill)
        if row_major != "block" or window % 128 or pack_counts:
            raise ValueError("on_demand needs row_major='block', "
                             "window % 128 == 0, unpacked counts")
        if not typed_spill:
            raise ValueError("on_demand needs typed_spill=True (no table "
                             "exists for the spill to gather)")
    if n_src_rows is None:
        n_src_rows = n_nodes_pad
    real = np.asarray(edge_mask) > 0
    src = np.asarray(edge_src)[real].astype(np.int64)
    dst = np.asarray(edge_dst)[real].astype(np.int64)
    typ = np.asarray(edge_type)[real].astype(np.int64)
    n_edges = src.shape[0]

    t2 = (n_message_types if n_message_types is not None
          else int(typ.max(initial=0)) + 1)
    if row_major == "block":
        if n_src_rows % 128:
            raise ValueError("row_major='block' needs n_src_rows % 128 == 0")
        rows = (src // 128) * (t2 * 128) + typ * 128 + src % 128
    elif row_major == "src":
        rows = src * t2 + typ
    else:
        rows = typ * n_src_rows + src
    n_wins = -(-t2 * n_src_rows // window)
    win = rows // window
    block = dst // block_rows
    n_blocks = n_nodes_pad // block_rows
    key = block * n_wins + win
    max_count = 15 if pack_fwd else 127

    # native (C++) plan: one radix sort replaces the np.unique passes and
    # the count-stream np.add.at fills (np.unique dominated the host build
    # at 8M+ edges — CLAUDE.md round-3 lead); numpy path kept as the
    # reference fallback, tested identical in tests/test_native.py
    plan = None
    if use_native is None:
        use_native = n_edges >= 200_000
    if use_native:
        from ggnn_tpu import native as _native
        if _native.available():
            plan = _native.WindowPlanNative(
                rows, dst, window, block_rows, n_wins, n_blocks,
                min_edges_per_tile, max_count, want_grad=with_grad)
            if not plan.ok:
                plan = None

    if plan is not None:
        keep = plan.keep
    else:
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        dense = counts >= min_edges_per_tile
        keep = dense[inv]
        # int8/int4 count saturation: multigraph pairs repeating >max_count
        # times (hub-hub edges in scale-free graphs) spill to the per-edge
        # path, which handles duplicates naturally
        pair = rows * np.int64(n_nodes_pad) + dst
        _, pinv, pcounts = np.unique(pair, return_inverse=True,
                                     return_counts=True)
        keep &= pcounts[pinv] <= max_count

    def decode_rows(r):
        """table row → (type, src) for this row_major."""
        if row_major == "block":
            rpb = t2 * 128
            return (r % rpb) // 128, (r // rpb) * 128 + r % 128
        if row_major == "src":
            return r % t2, r // t2
        return r // n_src_rows, r % n_src_rows

    # spill: low-occupancy tiles go to the per-edge one-hot path
    spill = None
    xw_state = None
    spill_frac = 1.0 - (float(keep.sum()) / max(n_edges, 1))
    if typed_spill and ((~keep).any() or force_spill):
        # XW (no-table) spill, VERDICT r1 #4: gather h [N, D] directly —
        # the per-row gather engine is ~3.5× faster on the small footprint
        # than on the [T2·N, D] table — transform in TYPE-MAJOR static
        # buckets (one batched einsum + bias; same structure the spill
        # BACKWARD already uses), then ride the ordinary block-level
        # one-hot scatter with ``s_gather_idx`` pointing into the
        # transformed pack (the gather doubles as the permutation into
        # scatter order).  This replaces the round-4 per-(block, type)
        # typed tiles, which FRAGMENT at spill occupancy: T2× more tiles
        # at ~12 edges each measured +9 ms on the community headline
        # (407.9M vs 755.7M edges/s — docs/DESIGN.md).  Required by
        # on_demand layouts (no table exists); also usable with a table.
        if pack_counts:
            raise ValueError("typed_spill is incompatible with pack_counts")
        n_spill = int((~keep).sum())
        sp_t, sp_u = decode_rows(rows[~keep])
        sp_d = dst[~keep]
        if spill_dst_order:
            # keep the incoming dst-block-tile order WITHIN each type:
            # the scatter-pack permutation gather (s_gather_idx) then
            # reads T2 interleaved ascending runs instead of random
            # positions — probing the ordered-stream gather effect at
            # footprints above the cliff (round-7 lead; the trade is a
            # src-random h gather in the bucket transform)
            order = np.argsort(sp_t, kind="stable")
        else:
            order = np.argsort(sp_t * np.int64(n_src_rows) + sp_u,
                               kind="stable")        # type-major, src-asc
        spt, spu, spd = sp_t[order], sp_u[order], sp_d[order]
        cnt = np.bincount(spt, minlength=t2)
        if spill_bwd_bucket is not None:
            if int(cnt.max(initial=0)) > spill_bwd_bucket:
                raise ValueError(
                    f"spill_bwd_bucket={spill_bwd_bucket} < max "
                    f"per-type spill count {int(cnt.max())}")
            padded = np.full(t2, spill_bwd_bucket, np.int64)
        else:
            padded = np.maximum(-(-cnt // 8) * 8, 8)
            pmax = int(padded.max())
            if t2 * pmax <= max(2 * int(padded.sum()), 4096):
                padded = np.full(t2, pmax, np.int64)  # uniform → batched
        offs = np.zeros(t2 + 1, np.int64)
        np.cumsum(padded, out=offs[1:])
        tot = int(offs[-1])
        first_of_t = np.zeros(t2, np.int64)
        first_of_t[1:] = np.cumsum(cnt)[:-1]
        slot = offs[spt] + (np.arange(n_spill) - first_of_t[spt])
        x_src = np.full(tot, n_src_rows, np.int64)   # pad slots → masked
        x_src[slot] = spu
        xw_state = (tuple(int(o) for o in offs), slot, spd, x_src)
        if spill_tile_e is None:
            # size the spill tile to the spill DENSITY (median block
            # occupancy — same rule as the table spill below)
            cnts = np.bincount((spd // BLOCK_N).astype(np.int64),
                               minlength=n_nodes_pad // BLOCK_N)
            med = int(np.median(cnts)) if n_spill else 0
            spill_tile_e = 128
            while spill_tile_e < min(med, 2048):
                spill_tile_e *= 2
        # block-level scatter pack gathering from the TRANSFORMED pack:
        # edge "source row" = the edge's type-major slot
        spill = build_dst_block_layout(
            slot, spd, np.zeros(n_spill, np.int64),
            np.ones(n_spill, np.float32), n_nodes_pad,
            tile_e=spill_tile_e, n_src_rows=tot,
            pad_tiles_to=spill_pad_tiles_to,
            edge_align=(16 if spill_tile_e % 16 == 0 else None),
            dstl_stream=spill_tile_e % 16 == 0)
    elif (~keep).any() or force_spill:
        n_spill = int((~keep).sum())
        if spill_tile_e is None:
            # size the spill tile to the spill DENSITY: a fixed 2048 pads
            # every dst block to >=2048 slots, and the spill gather then
            # reads millions of padding rows at the full ~11.6 ns/row
            # engine cost (measured: 49 ms of a 88 ms aggregation).
            # Use the median block's occupancy, not the mean — skewed
            # (power-law) in-degree otherwise pads the long tail
            sblk = dst[~keep] // BLOCK_N if n_spill else np.zeros(0)
            cnts = np.bincount(sblk.astype(np.int64),
                               minlength=n_nodes_pad // BLOCK_N)
            med = int(np.median(cnts)) if n_spill else 0
            spill_tile_e = 128
            while spill_tile_e < min(med, 2048):
                spill_tile_e *= 2
        # spilled edges gather from the SAME table the windows read — pass
        # the precomputed row index directly (edge_type=0, n_src_rows=R)
        spill = build_dst_block_layout(
            rows[~keep], dst[~keep], np.zeros(n_spill, np.int64),
            np.ones(n_spill, np.float32), n_nodes_pad,
            tile_e=spill_tile_e, n_src_rows=t2 * n_src_rows,
            pad_tiles_to=spill_pad_tiles_to,
            # 16-aligned packing: the per-row gather engine only reads
            # ~real spilled rows instead of per-block tile_e-padded ones
            edge_align=(16 if spill_tile_e % 16 == 0 else None),
            dstl_stream=spill_tile_e % 16 == 0)

    # dense tiles (+ one dummy tile per block so the kernel's first-tile
    # zero-init covers every output block).  The count STREAM holds REAL
    # tiles only: dummies are marked win_of_tile = -1 (the kernel issues
    # no DMA for them) and ``c_off`` maps each real tile to its compact
    # stream slot — without this the backward stream is ~50 % all-zero
    # dummy blocks (one per empty table window)
    real_keys = (plan.dense_keys if plan is not None
                 else np.unique(key[keep]))
    dummy = np.arange(n_blocks, dtype=np.int64) * n_wins
    uniq_t = np.unique(np.concatenate([real_keys, dummy]))
    n_tiles = uniq_t.shape[0]
    n_real = real_keys.shape[0]
    is_real = np.isin(uniq_t, real_keys, assume_unique=True)
    block_of_tile = (uniq_t // n_wins).astype(np.int32)
    win_of_tile = np.where(is_real, uniq_t % n_wins, -1).astype(np.int32)
    c_off = np.zeros(n_tiles, np.int32)
    c_off[is_real] = np.arange(n_real, dtype=np.int32)
    tile_counts = np.bincount(block_of_tile, minlength=n_blocks)
    tile_start = np.zeros(n_blocks + 1, np.int32)
    np.cumsum(tile_counts, out=tile_start[1:])

    if pad_tiles_to is not None:
        # append no-op dummy tiles to the LAST block (stacking layouts of
        # different topologies — e.g. per-shard — to equal shapes)
        extra = pad_tiles_to - n_tiles
        if extra < 0:
            raise ValueError(f"pad_tiles_to={pad_tiles_to} < {n_tiles}")
        if extra:
            block_of_tile = np.concatenate(
                [block_of_tile,
                 np.full(extra, n_blocks - 1, np.int32)])
            win_of_tile = np.concatenate(
                [win_of_tile, np.full(extra, -1, np.int32)])
            c_off = np.concatenate([c_off, np.zeros(extra, np.int32)])
            tile_start[-1] += extra
            n_tiles = pad_tiles_to

    # static-budget layouts pad the stream too (compiled-once serving
    # needs topology-independent array shapes); padding rows are never
    # DMA'd.  Unpadded (training/bench) layouts keep the compact stream.
    stream_tiles = (pad_tiles_to if pad_tiles_to is not None
                    else max(n_real, 1))
    if plan is not None:
        # (saturation is guaranteed by the plan's max_count pair filter)
        c = plan.fill_counts(real_keys, pack_fwd, total_tiles=stream_tiles)
    else:
        tile_of_edge = np.searchsorted(real_keys, key[keep])
        c = np.zeros((stream_tiles * block_rows, window), np.int8)
        np.add.at(c, (tile_of_edge * block_rows
                      + (dst[keep] - block[keep] * block_rows),
                      rows[keep] % window), 1)
        if int(c.sum(dtype=np.int64)) != int(keep.sum()):
            raise ValueError("count-matrix overflow: >127 duplicate edges "
                             "for one (dst, table-row) pair within a tile")
        if pack_fwd:
            c = _pack_nibbles(c)

    arrays = {"c_stream": jnp.asarray(c),
              "tile_start": jnp.asarray(tile_start),
              "block_of_tile": jnp.asarray(block_of_tile),
              "win_of_tile": jnp.asarray(win_of_tile),
              "c_off": jnp.asarray(c_off)}
    spill_meta = None
    if spill is not None:
        from ggnn_tpu.ops.scatter_pallas import DeviceScatterLayout
        sdev = (spill if isinstance(spill, DeviceScatterLayout)
                else spill.to_device())
        for k, v in sdev.arrays.items():
            arrays["s_" + k] = v
        spill_meta = sdev.meta
        if xw_state is not None:
            # 9th meta element = static type-bucket offsets marks the XW
            # (no-table) spill; ``sx_src`` holds the type-major src node
            # of every bucket slot (pad slots = n_src_rows, masked to 0)
            arrays["sx_src"] = jnp.asarray(xw_state[3].astype(np.int32))
            spill_meta = sdev.meta + (xw_state[0],)
    grad_meta = None
    if with_grad:
        # transposed tiles for the backward pass Y = Cᵀ·da: out blocks are
        # W-row table ranges (every window gets ≥1 tile so its Y rows are
        # initialized), input blocks are the dst blocks of da.  Same
        # compact-stream scheme as the forward: windows with no real tiles
        # keep only a no-DMA dummy (that's ~half of them).
        #
        # When the FUSED backward kernel applies (row_major='block',
        # (T2·128) % W == 0, unpacked) the backward reads the FORWARD
        # count stream: bwd tile (w, B) is exactly fwd tile (B, w)
        # transposed, and the kernel contracts with roles swapped
        # ((0,0) dot_general) — no second stream is built at all (it was
        # the same bytes again: 8.6 GB at 1M nodes / 20M edges).
        real_t = (plan.dense_keys_t if plan is not None
                  else np.unique(win[keep] * n_blocks + block[keep]))
        uniq_gt = np.unique(np.concatenate(
            [real_t, np.arange(n_wins, dtype=np.int64) * n_blocks]))
        n_gt = uniq_gt.shape[0]
        n_gt_real = real_t.shape[0]
        is_real_t = np.isin(uniq_gt, real_t, assume_unique=True)
        gt_block = (uniq_gt // n_blocks).astype(np.int32)   # out: window idx
        gt_win = np.where(is_real_t, uniq_gt % n_blocks,    # in: dst block
                          -1).astype(np.int32)
        gt_counts = np.bincount(gt_block, minlength=n_wins)
        gt_start = np.zeros(n_wins + 1, np.int32)
        np.cumsum(gt_counts, out=gt_start[1:])
        bwd_fwd_stream = (row_major == "block" and not pack_counts
                          and window % 128 == 0 and (t2 * 128) % window == 0)
        gt_c_off = np.zeros(n_gt, np.int32)
        if bwd_fwd_stream:
            # per-bwd-tile offset into the FORWARD stream: fwd real tiles
            # are keyed (dst_block·n_wins + win), sorted — look up the
            # transposed key
            fwd_keys = ((real_t % n_blocks) * np.int64(n_wins)
                        + real_t // n_blocks)
            gt_c_off[is_real_t] = np.searchsorted(
                real_keys, fwd_keys).astype(np.int32)
        else:
            gt_c_off[is_real_t] = np.arange(n_gt_real, dtype=np.int32)
            if plan is not None:
                ct = plan.fill_counts_t(real_t, pack_bwd)
            else:
                key_t = win[keep] * n_blocks + block[keep]
                gt_of_edge = np.searchsorted(real_t, key_t)
                ct = np.zeros((max(n_gt_real, 1) * window, block_rows),
                              np.int8)
                np.add.at(ct, (gt_of_edge * window + rows[keep] % window,
                               dst[keep] - block[keep] * block_rows), 1)
                if pack_bwd:
                    ct = _pack_nibbles(ct)
            if gt_pad_tiles_to is not None:
                # static-shape stream bound (real tiles ≤ total tiles);
                # padding rows are never DMA'd (dummies issue no copy)
                want = gt_pad_tiles_to * window
                if ct.shape[0] < want:
                    ct = np.concatenate(
                        [ct, np.zeros((want - ct.shape[0], ct.shape[1]),
                                      np.int8)])
            arrays["ct_stream"] = jnp.asarray(ct)
        if gt_pad_tiles_to is not None:
            extra = gt_pad_tiles_to - n_gt
            if extra < 0:
                raise ValueError(
                    f"gt_pad_tiles_to={gt_pad_tiles_to} < required {n_gt}")
            if extra:
                # no-op dummy tiles appended to the LAST window: win < 0
                # issues no DMA/matmul; they are never a window's first
                # tile, so the zero-init logic is untouched
                gt_block = np.concatenate(
                    [gt_block, np.full(extra, n_wins - 1, np.int32)])
                gt_win = np.concatenate(
                    [gt_win, np.full(extra, -1, np.int32)])
                gt_c_off = np.concatenate(
                    [gt_c_off, np.zeros(extra, np.int32)])
                gt_start[-1] += extra
                n_gt = gt_pad_tiles_to
        arrays.update(gt_tile_start=jnp.asarray(gt_start),
                      gt_block_of_tile=jnp.asarray(gt_block),
                      gt_win_of_tile=jnp.asarray(gt_win),
                      gt_c_off=jnp.asarray(gt_c_off))
        # per-(type, dst) ALL-real-edge counts for the bias gradient:
        # db[t] = Σ_v cnt_t(v)·ā_v — one [T2, N]·[N, D] matmul replaces
        # both the row-sum over Y and the spill's masked reduction
        # (f32: hub in-degrees exceed bf16's exact-integer range)
        indeg = np.bincount(typ * np.int64(n_nodes_pad) + dst,
                            minlength=t2 * n_nodes_pad)
        arrays["gt_indeg"] = jnp.asarray(
            indeg.reshape(t2, n_nodes_pad).astype(np.float32))
        spill_bwd_offsets = None
        spill_bwd_meta = None
        if spill is not None:
            # spill backward: REAL edges only, NEVER routed through the
            # [T2·N, D] Y buffer, and with NO row-serialized XLA scatter:
            # segment_sum and .at[].add are row-op-rate-bound (~5 ms each
            # for ~400K rows — they were 10 of the 12 ms spill backward).
            # Instead: per-EDGE contributions in type-major static buckets
            # feed batched einsums (dW and the per-edge dh rows), the dh
            # scatter rides the one-hot MXU kernel (same as the forward
            # spill), and db comes entirely from gt_indeg above.
            if xw_state is not None:
                # the XW spill forward already built the type-major
                # buckets — the backward reuses them verbatim
                offs_t, slot, sp_dst, e_src = xw_state
                offs = np.asarray(offs_t, np.int64)
                tot = int(offs[-1])
                n_sp = slot.shape[0]
                sp_u = e_src[slot]
                e_dst = np.zeros(tot, np.int64)
                e_dst[slot] = sp_dst
            else:
                sp_dst = dst[~keep]
                sp_t, sp_u = decode_rows(rows[~keep])
                order = np.argsort(sp_t * np.int64(n_src_rows) + sp_u,
                                   kind="stable")            # type-major
                sp_t, sp_u, sp_dst = sp_t[order], sp_u[order], sp_dst[order]
                n_sp = sp_t.shape[0]
                # per-type padded buckets with STATIC offsets; UNIFORM
                # bucket size when the type distribution allows it (the
                # backward then reshapes [T2, P, D] and runs two batched
                # einsums).  spill_bwd_bucket pins the uniform size
                # (per-shard stacking)
                cnt = np.bincount(sp_t, minlength=t2)
                if spill_bwd_bucket is not None:
                    if int(cnt.max(initial=0)) > spill_bwd_bucket:
                        raise ValueError(
                            f"spill_bwd_bucket={spill_bwd_bucket} < max "
                            f"per-type spill count {int(cnt.max())}")
                    padded = np.full(t2, spill_bwd_bucket, np.int64)
                else:
                    padded = np.maximum(-(-cnt // 8) * 8, 8)
                    pmax = int(padded.max())
                    if t2 * pmax <= max(2 * int(padded.sum()), 4096):
                        padded = np.full(t2, pmax, np.int64)
                offs = np.zeros(t2 + 1, np.int64)
                np.cumsum(padded, out=offs[1:])
                tot = int(offs[-1])
                first_of_t = np.zeros(t2, np.int64)
                first_of_t[1:] = np.cumsum(cnt)[:-1]
                slot = offs[sp_t] + (np.arange(n_sp) - first_of_t[sp_t])
                e_dst = np.zeros(tot, np.int64)  # padding → row 0 (its h
                e_src = np.full(tot, n_src_rows,  # row is masked to 0)
                                np.int64)
                e_dst[slot] = sp_dst
                e_src[slot] = sp_u
            arrays["s_bwd_dst"] = jnp.asarray(e_dst.astype(np.int32))
            arrays["s_bwd_src"] = jnp.asarray(e_src.astype(np.int32))
            spill_bwd_offsets = tuple(int(o) for o in offs)
            if n_src_rows % BLOCK_N == 0:
                # one-hot MXU layout scattering the per-edge dh rows into
                # dh[u]: "edges" are the bucket slots, "dst" the source
                # node; padding slots carry mask 0 and vanish from the pack
                if spill_bwd_tile_e is not None:
                    sb_tile = spill_bwd_tile_e
                else:
                    ublk = np.bincount((sp_u // BLOCK_N).astype(np.int64),
                                       minlength=n_src_rows // BLOCK_N)
                    med = int(np.median(ublk)) if n_sp else 0
                    sb_tile = 128
                    while sb_tile < min(med, 2048):
                        sb_tile *= 2
                mask = np.zeros(tot, np.float32)
                mask[slot] = 1.0
                sb = build_dst_block_layout(
                    np.arange(tot, dtype=np.int64), e_src,
                    np.zeros(tot, np.int64), mask, n_src_rows,
                    tile_e=sb_tile, n_src_rows=tot,
                    pad_tiles_to=spill_bwd_pad_tiles_to,
                    edge_align=(16 if sb_tile % 16 == 0 else None),
                    dstl_stream=sb_tile % 16 == 0)
                sb_dev = sb.to_device()
                for k, v in sb_dev.arrays.items():
                    arrays["sb_" + k] = v
                spill_bwd_meta = sb_dev.meta
        grad_meta = (n_wins, int(n_gt), spill_bwd_offsets, spill_bwd_meta,
                     bwd_fwd_stream)
    if on_demand and (t2 * 128) % window:
        raise ValueError("on_demand needs (T2*128) % window == 0")
    if grad_quant and not (with_grad and grad_meta is not None
                           and grad_meta[4]):
        import warnings
        warnings.warn("grad_quant needs with_grad=True and the fused "
                      "backward stream; running exact bf16 gradients",
                      stacklevel=2)
        grad_quant = False
    lay = DeviceWindowLayout(
        meta=(n_nodes_pad, window, n_tiles, n_blocks, spill_meta, row_major,
              grad_meta, block_rows, (pack_fwd, pack_bwd), on_demand,
              grad_quant),
        arrays=arrays)
    lay.stats = {
        "n_tiles": int(n_tiles), "n_edges": int(n_edges),
        "spill_frac": spill_frac, "window": window,
        # real (DMA'd) tiles only — dummies stream nothing
        "stream_gb": int(c.shape[0]) * c.shape[1] * 1e-9,
        "table_reads_gb": n_real * window * 2 * 1e-9,  # ×D at use time
        "spill_pack": (int(arrays["s_gather_idx"].shape[0])
                       if "s_gather_idx" in arrays else 0),
    }
    return lay


def window_layout_for_batch(batch, window: int = 512,
                            min_edges_per_tile: int = 32,
                            spill_tile_e: int = 128,
                            block_rows: int = BLOCK_N,
                            pack_counts: bool = False) -> DeviceWindowLayout:
    """Static-budget windowed layout for a GraphBatch: tile counts padded
    to topology-independent bounds (dense tiles ≤ e_pad/min_edges + one
    dummy per block; spill ≤ the one-hot static budget), so a jitted
    serving/eval step compiles once across batches.  Forward-only."""
    from ggnn_tpu.ops.scatter_pallas import static_tile_budget
    spec = batch.spec
    t2 = 2 * spec.n_edge_types
    n_dst = -(-spec.n_pad // block_rows) * block_rows
    budget = spec.e_pad // min_edges_per_tile + n_dst // block_rows
    # block-major tables materialize through the Pallas table kernel (no
    # lane relayout); falls back to src-major when nodes aren't 128-padded
    row_major = "block" if spec.n_pad % 128 == 0 else "src"
    return build_window_layout(
        batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
        n_dst, window=window, min_edges_per_tile=min_edges_per_tile,
        spill_tile_e=spill_tile_e, n_message_types=t2, row_major=row_major,
        n_src_rows=spec.n_pad, block_rows=block_rows,
        pad_tiles_to=budget, force_spill=True, pack_counts=pack_counts,
        spill_pad_tiles_to=static_tile_budget(spec.e_pad, n_dst,
                                              spill_tile_e))


def _window_kernel(block_of_tile_ref, win_of_tile_ref, tile_start_ref,
                   c_off_ref, table_ref, c_ref, out_ref):
    i = pl.program_id(0)
    b = block_of_tile_ref[i]

    @pl.when(i == tile_start_ref[b])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(win_of_tile_ref[i] >= 0)
    def _():
        c = c_ref[...].astype(table_ref.dtype)               # [128, W]
        out_ref[...] += jnp.dot(c, table_ref[...],
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "window", "interpret"))
def window_block_spmm(table, c_stream, tile_start, block_of_tile,
                      win_of_tile, n_blocks: int, window: int, c_off=None,
                      interpret: bool = False):
    """out[b·128:(b+1)·128] = Σ_tiles(b) C_tile · table[win·W:(win+1)·W].

    ``table`` rows must be a multiple of ``window`` (pad with zeros).
    Reference auto-pipeline variant of :func:`window_block_spmm_mono`
    (same dummy-tile convention: win_of_tile < 0 contributes nothing,
    ``c_off`` addresses a compact real-tiles-only stream)."""
    R, D = table.shape
    if R % window:
        raise ValueError("table rows must be a multiple of window")
    n_tiles = win_of_tile.shape[0]
    if c_off is None:
        c_off = jnp.arange(n_tiles, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((window, D),
                         lambda i, bt, wt, ts, co: (jnp.maximum(wt[i], 0),
                                                    0)),
            pl.BlockSpec((BLOCK_N, window),
                         lambda i, bt, wt, ts, co: (co[i], 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, D),
                               lambda i, bt, wt, ts, co: (bt[i], 0)),
    )
    return pl.pallas_call(
        _window_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_N, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * BLOCK_N * window * D,
            bytes_accessed=n_tiles * (window * D * table.dtype.itemsize
                                      + BLOCK_N * window)
            + n_blocks * BLOCK_N * D * 4,
            transcendentals=0,
        ),
    )(block_of_tile, win_of_tile, tile_start, c_off, table, c_stream)


def _count_dot(c, tbl, window, packed):
    """One tile's C·table MXU product, shared by the mono and fused-step
    kernels (they must stay in lockstep for the parity tests).

    ``packed``: int4 nibble pairs — low nibble = window cols [0, W/2),
    high = [W/2, W).  The shift runs on an int32 WIDENING of the bytes
    (Mosaic has no int8 vector shift: arith.shrsi on i8 fails to
    legalize); sign-extension then &15 still recovers both nibbles
    exactly.  Two half-window MXU matmuls replace the full-width one
    (same FLOPs, half the count-stream DMA bytes)."""
    if packed:
        cp = c.astype(jnp.int32)
        half = window // 2
        lo = (cp & 15).astype(tbl.dtype)
        hi = ((cp >> 4) & 15).astype(tbl.dtype)
        return (jnp.dot(lo, tbl[:half], preferred_element_type=jnp.float32)
                + jnp.dot(hi, tbl[half:],
                          preferred_element_type=jnp.float32))
    return jnp.dot(c.astype(tbl.dtype), tbl,
                   preferred_element_type=jnp.float32)


def _window_mono_kernel(block_of_tile_ref, win_of_tile_ref, tile_start_ref,
                        c_off_ref, table_hbm, c_hbm, out_hbm, acc, cast_buf,
                        tbl_buf, c_buf, tbl_sem, c_sem, out_sem, *, window,
                        nbuf, blocks_per_prog, block_n, packed=False,
                        win_stride=None, cast_out=False, dstl=False):
    """Manual-DMA variant: the automatic pipeline cannot prefetch through
    the DYNAMIC table-window index map (win_of_tile[i]) — measured ~2.8 us
    of serialized DMA latency per tile, which dominated the whole step.
    Here an ``nbuf``-deep ring issues (table-window, count-block) copies
    ahead of the MXU, with per-dst-block accumulators flushed async (same
    structure as scatter_pallas._scatter_mono_kernel).

    DUMMY tiles (``win_of_tile[t] < 0``) exist only to zero-initialize
    their output block: no DMA is issued and no product computed — the
    count stream holds REAL tiles only, addressed via ``c_off_ref`` (the
    transposed/backward layout is ~50 % dummies: one per empty table
    window — skipping them halves its stream bytes).

    ``dstl=True``: the side stream is a compact [n_tiles_pad8, window]
    i32 DST-LOCAL stream (row t = tile t's per-edge dst row in
    [0, block_n), −1 = no edge) instead of the [n_tiles·block_n, window]
    int8 one-hot matrix — the kernel synthesizes each tile's one-hot on
    the VPU as (row iota == dstl row), cutting that stream's DMA
    block_n/4-fold (32× at block_n=128).  Only valid for 0/1 scatters
    (one dst per edge column), not multigraph count streams; ``c_off``
    then indexes dstl ROWS (the tile's row is DMA'd as the 8-row-aligned
    slice containing it — the Mosaic i32 sublane rule)."""
    p = pl.program_id(0)
    b0 = p * blocks_per_prog
    t0 = tile_start_ref[b0]
    t1 = tile_start_ref[b0 + blocks_per_prog]
    stride = window if win_stride is None else win_stride

    def in_dma(slot, t):
        w = win_of_tile_ref[t]
        m = pltpu.make_async_copy(
            table_hbm.at[pl.ds(w * stride, window), :],
            tbl_buf.at[slot], tbl_sem.at[slot])
        if dstl:
            c = pltpu.make_async_copy(
                c_hbm.at[pl.ds(8 * (c_off_ref[t] // 8), 8), :],
                c_buf.at[slot], c_sem.at[slot])
        else:
            c = pltpu.make_async_copy(
                c_hbm.at[pl.ds(c_off_ref[t] * block_n, block_n), :],
                c_buf.at[slot], c_sem.at[slot])
        return m, c

    def start_in(slot, t):
        @pl.when(win_of_tile_ref[t] >= 0)
        def _():
            m, c = in_dma(slot, t)
            m.start()
            c.start()

    def out_dma(par, blk):
        src = cast_buf.at[par] if cast_out else acc.at[par]
        return pltpu.make_async_copy(
            src, out_hbm.at[pl.ds(blk * block_n, block_n), :],
            out_sem.at[par])

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        par = jax.lax.rem(blk - b0, 2)
        first = t == tile_start_ref[blk]
        last = t == tile_start_ref[blk + 1] - 1
        real = win_of_tile_ref[t] >= 0

        @pl.when(jnp.logical_and(first, blk - b0 >= 2))
        def _():
            out_dma(par, blk - 2).wait()

        # a dummy tile sorts first within its block (or is its only tile):
        # zero-init the accumulator instead of waiting on a DMA that was
        # never issued
        @pl.when(jnp.logical_and(first, jnp.logical_not(real)))
        def _():
            acc[par] = jnp.zeros_like(acc[par])

        @pl.when(real)
        def _():
            m, c = in_dma(slot, t)
            m.wait()
            c.wait()
            if dstl:
                # synthesize the tile's one-hot from its dst-local row:
                # pick the row out of the 8-row slice, then
                # (row iota == dstl) — −1 (no edge) matches nothing
                r = c_off_ref[t] % 8
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, (8, window), 0) == r
                row = jnp.sum(jnp.where(sel, c_buf[slot], 0), axis=0,
                              keepdims=True)
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (block_n, window), 0) == row
                ).astype(tbl_buf.dtype)
                prod = jnp.dot(oh, tbl_buf[slot],
                               preferred_element_type=jnp.float32)
            else:
                prod = _count_dot(c_buf[slot], tbl_buf[slot], window,
                                  packed)

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
            if cast_out:
                cast_buf[par] = acc[par].astype(cast_buf.dtype)
            out_dma(par, blk).start()

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    last_blk = b0 + blocks_per_prog - 1
    if blocks_per_prog >= 2:
        out_dma(jax.lax.rem(last_blk - 1 - b0, 2), last_blk - 1).wait()
    out_dma(jax.lax.rem(last_blk - b0, 2), last_blk).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "window", "n_progs", "nbuf",
                                    "out_rows", "packed", "win_stride",
                                    "out_dtype", "dstl", "interpret"))
def window_block_spmm_mono(table, c_stream, tile_start, block_of_tile,
                           win_of_tile, n_blocks: int, window: int,
                           n_progs: int = 1, nbuf: int = 6,
                           out_rows: int = BLOCK_N, packed: bool = False,
                           win_stride: int | None = None, c_off=None,
                           out_dtype=None, dstl: bool = False,
                           interpret: bool = False):
    """Manual-DMA-ring variant of :func:`window_block_spmm` (production).

    ``out_rows`` generalizes the output-block height so the SAME kernel
    serves the transposed (backward) pass with roles swapped: out blocks =
    ``window``-row table ranges, input blocks = 128 cotangent rows, and
    the count stream transposed (pass window=128, out_rows=W).

    ``packed=True`` consumes an int4-packed count stream
    ([n_tiles·out_rows, window/2] — see :func:`_pack_nibbles`); the count
    DMA bytes halve and the MXU contraction splits into the two window
    halves.

    ``win_stride`` (rows): table-window offsets become win·win_stride
    instead of win·window — the edge_align packing path, where
    ``window``-row message reads start at finer-aligned positions and may
    overlap (see scatter_pallas.build_dst_block_layout edge_align).

    ``c_off`` [n_tiles] i32: count-stream row-block index per tile, for
    layouts whose stream holds REAL tiles only (dummy tiles are marked
    ``win_of_tile = -1`` and skipped — no DMA, no matmul).  ``None``
    means a dense stream (tile t at rows [t·out_rows, (t+1)·out_rows)).

    ``out_dtype`` (default f32): narrower outputs (bf16 for the backward
    Y — its consumers accumulate in f32 anyway) halve the flush DMA and
    every downstream read of a [n_wins·W, D]-sized intermediate.

    ``dstl=True``: ``c_stream`` is the compact [n_tiles_pad8, window] i32
    dst-local stream (see :func:`_window_mono_kernel`); only for 0/1
    scatter streams (each column one dst), incompatible with ``packed``."""
    R, D = table.shape
    if win_stride is None and R % window:
        raise ValueError("table rows must be a multiple of window")
    if n_blocks % n_progs:
        raise ValueError("n_progs must divide n_blocks")
    if dstl and packed:
        raise ValueError("dstl and packed are mutually exclusive")
    n_tiles = win_of_tile.shape[0]
    if c_off is None:
        c_off = jnp.arange(n_tiles, dtype=jnp.int32)
    out_dtype = jnp.dtype(jnp.float32 if out_dtype is None else out_dtype)
    cast_out = out_dtype != jnp.dtype(jnp.float32)
    c_cols = window // 2 if packed else window
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_progs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, out_rows, D), jnp.float32),
            pltpu.VMEM((2, out_rows, D) if cast_out else (1, 8, 128),
                       out_dtype),
            pltpu.VMEM((nbuf, window, D), table.dtype),
            pltpu.VMEM((nbuf, 8, window) if dstl
                       else (nbuf, out_rows, c_cols), c_stream.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_window_mono_kernel, window=window, nbuf=nbuf,
                               blocks_per_prog=n_blocks // n_progs,
                               block_n=out_rows, packed=packed,
                               win_stride=win_stride, cast_out=cast_out,
                               dstl=dstl)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * out_rows, D), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * out_rows * window * D,
            bytes_accessed=n_tiles * (window * D * table.dtype.itemsize
                                      + (8 * window * 4 if dstl
                                         else out_rows * c_cols))
            + n_blocks * out_rows * D * out_dtype.itemsize,
            transcendentals=0,
        ),
    )(block_of_tile, win_of_tile, tile_start, c_off, table, c_stream)


def _window_ondemand_kernel(block_of_tile_ref, win_of_tile_ref,
                            tile_start_ref, c_off_ref, h_hbm, c_hbm, w_hbm,
                            b_hbm, out_hbm, acc, tw, h_buf, c_buf, w_buf,
                            b_buf, h_sem, c_sem, w_sem, b_sem, out_sem, *,
                            window, nbuf, blocks_per_prog, block_n, gtypes):
    """ON-DEMAND table windows (round-2 / VERDICT r1 #3): instead of
    DMAing precomputed [W, D] node-transform table windows, DMA the
    window's 128-row h block (W/128 = ``gtypes``× fewer table bytes) and
    build the window in VMEM — gtypes full-MXU [128, D]@[D, D] dots with
    the bias fused (the same math node_table_block_major runs, now inside
    the ring, so the [T2·N, D] table never exists in HBM: −1.8 ms table
    build and −4.3 GB at 1M nodes).  Requires row_major='block',
    W % 128 == 0, (T2·128) % W == 0, unpacked counts.

    The weight bank sits VMEM-resident; the slab weight index
    ``tbase + j`` is dynamic-base + static-offset (a pure VMEM READ —
    cheap, unlike the round-4 dynamic read-modify-write finding).  Window
    w of the block-major row space covers types [w%wpb·gtypes, ...) of
    src block w//wpb."""
    p = pl.program_id(0)
    b0 = p * blocks_per_prog
    t0 = tile_start_ref[b0]
    t1 = tile_start_ref[b0 + blocks_per_prog]
    t2 = w_buf.shape[0]
    wpb = t2 // gtypes

    wcp = pltpu.make_async_copy(w_hbm, w_buf, w_sem)
    bcp = pltpu.make_async_copy(b_hbm, b_buf, b_sem)
    wcp.start()
    bcp.start()
    wcp.wait()
    bcp.wait()

    def in_dma(slot, t):
        w = win_of_tile_ref[t]
        m = pltpu.make_async_copy(
            h_hbm.at[pl.ds((w // wpb) * 128, 128), :],
            h_buf.at[slot], h_sem.at[slot])
        c = pltpu.make_async_copy(
            c_hbm.at[pl.ds(c_off_ref[t] * block_n, block_n), :],
            c_buf.at[slot], c_sem.at[slot])
        return m, c

    def start_in(slot, t):
        @pl.when(win_of_tile_ref[t] >= 0)
        def _():
            m, c = in_dma(slot, t)
            m.start()
            c.start()

    def out_dma(par, blk):
        return pltpu.make_async_copy(
            acc.at[par], out_hbm.at[pl.ds(blk * block_n, block_n), :],
            out_sem.at[par])

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        par = jax.lax.rem(blk - b0, 2)
        first = t == tile_start_ref[blk]
        last = t == tile_start_ref[blk + 1] - 1
        real = win_of_tile_ref[t] >= 0

        @pl.when(jnp.logical_and(first, blk - b0 >= 2))
        def _():
            out_dma(par, blk - 2).wait()

        @pl.when(jnp.logical_and(first, jnp.logical_not(real)))
        def _():
            acc[par] = jnp.zeros_like(acc[par])

        @pl.when(real)
        def _():
            m, c = in_dma(slot, t)
            m.wait()
            c.wait()
            tbase = jax.lax.rem(win_of_tile_ref[t], wpb) * gtypes
            for j in range(gtypes):
                tw[j * 128:(j + 1) * 128, :] = (
                    jnp.dot(h_buf[slot], w_buf[tbase + j],
                            preferred_element_type=jnp.float32)
                    + b_buf[tbase + j, :][None, :]).astype(tw.dtype)
            prod = jnp.dot(c_buf[slot].astype(tw.dtype), tw[...],
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

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    last_blk = b0 + blocks_per_prog - 1
    if blocks_per_prog >= 2:
        out_dma(jax.lax.rem(last_blk - 1 - b0, 2), last_blk - 1).wait()
    out_dma(jax.lax.rem(last_blk - b0, 2), last_blk).wait()


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "window", "n_progs", "nbuf",
                                    "out_rows", "interpret"))
def window_block_spmm_ondemand(h, msg_w, msg_b, c_stream, tile_start,
                               block_of_tile, win_of_tile, c_off,
                               n_blocks: int, window: int, n_progs: int = 1,
                               nbuf: int = 6, out_rows: int = BLOCK_N,
                               interpret: bool = False):
    """On-demand variant of :func:`window_block_spmm_mono` for block-major
    layouts: streams h blocks + count tiles; builds each table window in
    VMEM (see :func:`_window_ondemand_kernel`)."""
    N, D = h.shape
    T2 = msg_w.shape[0]
    if window % 128 or (T2 * 128) % window:
        raise ValueError("on-demand windows need W % 128 == 0 and "
                         "(T2*128) % W == 0")
    if N % 128:
        raise ValueError("on-demand windows need N % 128 == 0")
    if n_blocks % n_progs:
        raise ValueError("n_progs must divide n_blocks")
    gtypes = window // 128
    n_tiles = win_of_tile.shape[0]
    if c_off is None:
        c_off = jnp.arange(n_tiles, dtype=jnp.int32)
    msg_w = msg_w.astype(h.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_progs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, out_rows, D), jnp.float32),
            pltpu.VMEM((window, D), h.dtype),
            pltpu.VMEM((nbuf, 128, D), h.dtype),
            pltpu.VMEM((nbuf, out_rows, window), c_stream.dtype),
            pltpu.VMEM((T2, D, D), msg_w.dtype),
            pltpu.VMEM((T2, D), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_window_ondemand_kernel, window=window,
                               nbuf=nbuf,
                               blocks_per_prog=n_blocks // n_progs,
                               block_n=out_rows, gtypes=gtypes)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * out_rows, D),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * out_rows * window * D
            + 2 * n_tiles * window * D * D,
            bytes_accessed=n_tiles * (128 * D * h.dtype.itemsize
                                      + out_rows * window)
            + n_blocks * out_rows * D * 4,
            transcendentals=0,
        ),
    )(block_of_tile, win_of_tile, tile_start, c_off, h, c_stream,
      msg_w, msg_b.astype(jnp.float32))


def _window_bwd_fused_kernel(block_of_tile_ref, win_of_tile_ref,
                             tile_start_ref, c_off_ref, *rest, window,
                             nbuf, n_wins, out_rows, t2, n_src_blocks, wpb,
                             quant=False):
    """Transposed window pass with a FUSED dh/dW epilogue, all in the
    TRANSPOSED orientation so every MXU product is a standard (1,0)
    contraction and the backward reads the FORWARD count stream:

        Yᵀ_win = āᵀ_blk · C_tile          (ā enters as āᵀ [D, N]; C is the
                                           forward tile — bwd tile (w, B)
                                           is fwd tile (B, w) transposed,
                                           so no second stream exists; it
                                           was the same bytes again,
                                           8.6 GB at 1M nodes/20M edges)
        dhᵀ[b] = Σ_t W_t · Yᵀ_slab_t      (one flush per src block)
        dWᵀ[t] += Yᵀ_slab_t · h_b         (1 MB VMEM accumulator)

    acc holds the ``wpb`` windows of one SOURCE BLOCK (2·wpb slots,
    double buffered); in block-major row order the slab type is STATIC
    (t = w_loc·S + j), so the dW accumulator and weight bank are indexed
    at compile time (dynamic-index VMEM read-modify-writes measured ~3×
    the dot cost; rhs-transposed dot_generals lower to explicit per-slab
    transposes).  The [T2·N, D] Y intermediate (~1 GB at the headline
    config: kernel flush + two einsum re-reads) never reaches HBM.  The
    bias gradient is NOT computed here — one [T2, N]·[N, D] matmul
    against the precomputed all-edges in-degree (``gt_indeg``) outside.
    Empty windows (no real tiles) skip their zero-init AND their epilogue
    group.  Requires row_major='block', (T2·128) % W == 0, unpacked
    counts.

    ``quant`` (round 8, VERDICT r4 #3 — int8 GRADIENT streams): āᵀ
    arrives int8 with per-ā-block power-of-2 scales (f32, scalar-
    prefetched like the q8 forward's) — the main product becomes the
    measured-faster int8×int8→int32 MXU dot (496 vs 612 ns/tile fwd
    precedent) and the āᵀ slice DMA halves; the scale multiplies the
    f32 accumulate per tile.  The epilogue is unchanged (f32)."""
    if quant:
        scl_ref = rest[0]
        rest = rest[1:]
    (dat_hbm, c_hbm, w_hbm, h_hbm, dht_hbm, dwt_hbm, acc, dht_buf,
     dat_buf, c_buf, w_buf, h_buf, dwt_acc, vbuf, dat_sem,
     c_sem, w_sem, h_sem, dh_sem, dw_sem) = rest
    t0 = tile_start_ref[0]
    t1 = tile_start_ref[n_wins]
    S = out_rows // 128

    # one-time: message weights to VMEM; h blocks 0/1 prefetch
    wcp = pltpu.make_async_copy(w_hbm, w_buf, w_sem)
    wcp.start()
    wcp.wait()

    def h_dma(slot, b):
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(b * 128, 128), :], h_buf.at[slot], h_sem.at[slot])

    h_dma(0, 0).start()
    if n_src_blocks > 1:
        h_dma(1, 1).start()

    dwt_acc[...] = jnp.zeros_like(dwt_acc)

    def in_dma(slot, t):
        m = pltpu.make_async_copy(
            dat_hbm.at[:, pl.ds(win_of_tile_ref[t] * window, window)],
            dat_buf.at[slot], dat_sem.at[slot])
        c = pltpu.make_async_copy(
            c_hbm.at[pl.ds(c_off_ref[t] * window, window), :],
            c_buf.at[slot], c_sem.at[slot])
        return m, c

    def start_in(slot, t):
        @pl.when(win_of_tile_ref[t] >= 0)
        def _():
            m, c = in_dma(slot, t)
            m.start()
            c.start()

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)

    def dh_out(slot, b):
        return pltpu.make_async_copy(
            dht_buf.at[slot], dht_hbm.at[:, pl.ds(b * 128, 128)],
            dh_sem.at[slot])

    def nonempty(w):
        return jnp.logical_or(
            tile_start_ref[w + 1] - tile_start_ref[w] > 1,
            win_of_tile_ref[tile_start_ref[w]] >= 0)

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        sl = jax.lax.rem(blk, 2 * wpb)       # acc slot for this window
        first = t == tile_start_ref[blk]
        only = tile_start_ref[blk + 1] - tile_start_ref[blk] == 1
        last = t == tile_start_ref[blk + 1] - 1
        real = win_of_tile_ref[t] >= 0

        # a dummy tile sorts first within its window: zero-init the slot
        # for the real tiles after it (an EMPTY window skips the init —
        # its epilogue group is skipped too)
        @pl.when(jnp.logical_and(
            first, jnp.logical_and(jnp.logical_not(real),
                                   jnp.logical_not(only))))
        def _():
            acc[sl] = jnp.zeros_like(acc[sl])

        @pl.when(real)
        def _():
            m, c = in_dma(slot, t)
            m.wait()
            c.wait()
            if quant:
                pi = jnp.dot(dat_buf[slot], c_buf[slot],
                             preferred_element_type=jnp.int32)
                prod = (pi.astype(jnp.float32)
                        * scl_ref[win_of_tile_ref[t]])
            else:
                prod = jnp.dot(dat_buf[slot],
                               c_buf[slot].astype(dat_buf.dtype),
                               preferred_element_type=jnp.float32)

            @pl.when(first)
            def _():
                acc[sl] = prod

            @pl.when(jnp.logical_not(first))
            def _():
                acc[sl] = acc[sl] + prod

        @pl.when(t + nbuf < t1)
        def _():
            start_in(slot, t + nbuf)

        # epilogue when the LAST window of a src block completes: all wpb
        # window slots of block b are resident; slab types are STATIC.
        # The naive epilogue issued 2·T2 latency-bound [D,D]·[D,128] dots
        # per src block (~65K small dots per step at the 262K headline —
        # measured ~3.5 ms of the 8.9 ms kernel); instead the slabs are
        # assembled (pure [D,128] VMEM block copies, no transposes) into
        # one [T2·D, 128] stack and the epilogue is TWO full-MXU dots:
        #   dhᵀ_blk = Wcat [D, T2·D] @ vbuf   (contraction over (t, f))
        #   dWᵀ    += vbuf @ h_blk [128, D]   (all T2 slices at once)
        @pl.when(jnp.logical_and(last, jax.lax.rem(blk, wpb) == wpb - 1))
        def _():
            b = blk // wpb
            hslot = jax.lax.rem(b, 2)
            base = hslot * wpb               # first acc slot of this block
            D = dht_buf.shape[1]

            @pl.when(b >= 2)
            def _():
                dh_out(hslot, b - 2).wait()  # dht_buf[hslot] frees
            h_dma(hslot, b).wait()           # prefetched two blocks ago
            for w_loc in range(wpb):
                ne = nonempty(blk - (wpb - 1) + w_loc)

                @pl.when(ne)
                def _(w_loc=w_loc):
                    for j in range(S):
                        tt = w_loc * S + j   # STATIC type index
                        vbuf[tt * D:(tt + 1) * D, :] = acc[
                            base + w_loc, :, j * 128:(j + 1) * 128].astype(
                                vbuf.dtype)

                @pl.when(jnp.logical_not(ne))
                def _(w_loc=w_loc):          # stale slot → zero its slabs
                    vbuf[w_loc * S * D:(w_loc + 1) * S * D, :] = (
                        jnp.zeros((S * D, 128), vbuf.dtype))
            dht_buf[hslot] = jnp.dot(
                w_buf[...], vbuf[...],
                preferred_element_type=jnp.float32)
            dwt_acc[...] += jnp.dot(
                vbuf[...], h_buf[hslot],
                preferred_element_type=jnp.float32)
            dh_out(hslot, b).start()

            @pl.when(b + 2 < n_src_blocks)
            def _():
                h_dma(hslot, b + 2).start()

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    if n_src_blocks >= 2:
        dh_out((n_src_blocks - 2) % 2, n_src_blocks - 2).wait()
    dh_out((n_src_blocks - 1) % 2, n_src_blocks - 1).wait()
    dwcp = pltpu.make_async_copy(dwt_acc, dwt_hbm, dw_sem)
    dwcp.start()
    dwcp.wait()


@functools.partial(jax.jit,
                   static_argnames=("n_wins", "window", "out_rows", "t2",
                                    "nbuf", "interpret"))
def window_bwd_fused(da_t, c_stream, tile_start, block_of_tile,
                     win_of_tile, c_off, msg_w, h, n_wins: int, window: int,
                     out_rows: int, t2: int, nbuf: int = 6,
                     da_scales=None, interpret: bool = False):
    """Fused backward of the windowed aggregation: returns (dhᵀ [D, N] f32,
    dWᵀ [T2, D, D] f32) without materializing Y (see the kernel
    docstring).  ``da_t`` is the TRANSPOSED cotangent [D, n_blocks·BR];
    ``c_stream`` is the FORWARD count stream with ``c_off`` mapping each
    backward tile to its forward tile; ``window`` = ā block rows (the
    layout's block_rows), ``out_rows`` = the table window W.

    ``da_scales`` [n_blocks] f32 selects the int8-gradient path: ``da_t``
    is then int8, quantized per ā block with power-of-2 scales (see
    :func:`quantize_grad_pow2`); the kernel runs int8×int8→int32 MXU
    dots and rescales at the f32 accumulate."""
    N, D = h.shape
    quant = da_scales is not None
    if (t2 * 128) % out_rows or out_rows % 128:
        raise ValueError("fused backward needs (T2*128) % W == 0, "
                         "W % 128 == 0")
    if n_wins != (t2 * N) // out_rows:
        raise ValueError("n_wins inconsistent with T2*N/W")
    wpb = (t2 * 128) // out_rows         # table windows per src block
    msg_w = msg_w.astype(h.dtype)        # one dtype for the w/h buffers
    # Wcat [D, T2*D]: per-type weights side by side so the batched
    # epilogue's dhT dot contracts over all (t, f) at once
    wcat = msg_w.transpose(1, 0, 2).reshape(D, t2 * D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if quant else 4,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2 * wpb, D, out_rows), jnp.float32),  # acc (1 block)
            pltpu.VMEM((2, D, 128), jnp.float32),            # dht_buf
            pltpu.VMEM((nbuf, D, window), da_t.dtype),       # dat_buf (āᵀ)
            pltpu.VMEM((nbuf, window, out_rows), c_stream.dtype),
            pltpu.VMEM((D, t2 * D), msg_w.dtype),            # w_buf (Wcat)
            pltpu.VMEM((2, 128, D), msg_w.dtype),            # h_buf
            pltpu.VMEM((t2 * D, D), jnp.float32),            # dwt_acc
            pltpu.VMEM((t2 * D, 128), msg_w.dtype),          # vbuf (slabs)
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_window_bwd_fused_kernel, window=window,
                               nbuf=nbuf, n_wins=n_wins, out_rows=out_rows,
                               t2=t2, n_src_blocks=N // 128, wpb=wpb,
                               quant=quant)
    dht, dwt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((D, N), jnp.float32),
                   jax.ShapeDtypeStruct((t2 * D, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * win_of_tile.shape[0] * out_rows * window * D
            + 2 * n_wins * out_rows * D * D * 2,
            bytes_accessed=win_of_tile.shape[0]
            * (window * D * da_t.dtype.itemsize + out_rows * window)
            + N * D * (4 + msg_w.dtype.itemsize),
            transcendentals=0,
        ),
    )(block_of_tile, win_of_tile, tile_start, c_off,
      *([da_scales] if quant else []), da_t, c_stream, wcat, h)
    return dht, dwt.reshape(t2, D, D)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def quantize_grad_pow2(da_pad, block_rows: int):
    """Quantize the aggregation cotangent to int8 per ā BLOCK
    (``block_rows`` rows share one power-of-2 scale — the granularity the
    backward kernel's āᵀ slices see).  Returns (q int8 [R, D],
    scales f32 [R/block_rows]).  Power-of-2 scales make the dequantize a
    lossless exponent shift (the q8 v2 precedent)."""
    R, D = da_pad.shape
    nb = R // block_rows
    b = da_pad.astype(jnp.float32).reshape(nb, block_rows * D)
    m = jnp.max(jnp.abs(b), axis=1)
    e = jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30) / 127.0))
    e = jnp.clip(e, -126.0, 126.0)
    q = jnp.clip(jnp.round(b * jnp.exp2(-e)[:, None]), -127, 127
                 ).astype(jnp.int8)
    return q.reshape(R, D), jnp.exp2(e)


def _table_block_kernel(h_ref, w_ref, b_ref, out_ref):
    t2 = w_ref.shape[0]
    for t in range(t2):
        out_ref[t * 128:(t + 1) * 128, :] = (
            jnp.dot(h_ref[...], w_ref[t],
                    preferred_element_type=jnp.float32)
            + b_ref[t, :][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def node_table_block_major(h, msg_w, msg_b, interpret: bool = False):
    """Materialize the node-transform table in BLOCK-MAJOR row order
    (row = (src//128)·T2·128 + t·128 + src%128): per src block, T2
    full-utilization [128, D]@[D, D] MXU dots with the bias fused, written
    straight in the final [R, D] layout.

    Every XLA lowering of the src-major table (einsum ntf, flat matmul,
    bf16-accum, ones-augmented) pays a hidden [N, T2·D] → [N·T2, D]
    lane-relayout plus an unfused bias pass — measured 5.3 ms vs this
    kernel's 1.8 ms (the bf16 write-bandwidth floor) at 262K nodes,
    T2=16, D=128 on v5e."""
    N, D = h.shape
    T2 = msg_w.shape[0]
    if N % 128:
        raise ValueError("node_table_block_major needs N % 128 == 0")
    if msg_w.size * msg_w.dtype.itemsize > 6 * 1024 * 1024:
        # weight bank would not fit VMEM comfortably — XLA fallback
        t = jnp.einsum("nd,tdf->ntf", h, msg_w,
                       preferred_element_type=jnp.float32) \
            + msg_b[None, :, :]
        return (t.reshape(N // 128, 128, T2, D).transpose(0, 2, 1, 3)
                .reshape(-1, D).astype(h.dtype))
    n_blk = N // 128
    return pl.pallas_call(
        _table_block_kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((128, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T2 * 128, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * T2, D), h.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * T2 * D,
            bytes_accessed=N * D * h.dtype.itemsize * (1 + T2),
            transcendentals=0,
        ),
    )(h, msg_w, msg_b)


def _table_block_q8_kernel(h_ref, w_ref, b_ref, out_ref, exp_ref, *,
                           gtypes, rows_pad):
    """Quantizing variant of :func:`_table_block_kernel`: emits VALUES-ONLY
    int8 rows with power-of-2 per-window scales (window = ``gtypes``
    consecutive types of one src block).  Exponents go to a separate
    [rows_pad, 128] f32 block (row g, lane 0 = window g's exponent) —
    round-6 change: the former [D | exponent | padding] in-row layout
    doubled the table-build write bytes for metadata the window kernel
    never DMA'd; spill paths now dequantize via the scales vector
    instead (XW spill never touches the table at all)."""
    t2 = w_ref.shape[0]
    D = w_ref.shape[-1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, 128), 1)
    eacc = jnp.zeros((rows_pad, 128), jnp.float32)
    for g in range(t2 // gtypes):
        vals = []
        for j in range(gtypes):
            t = g * gtypes + j
            vals.append(jnp.dot(h_ref[...], w_ref[t],
                                preferred_element_type=jnp.float32)
                        + b_ref[t, :][None, :])
        m = jnp.max(jnp.abs(jnp.stack(vals)))
        # power-of-2 scale: q = round(v / 2^e) with max|v|/2^e <= 127
        e = jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30)) - 6.9886)  # log2(127)
        e = jnp.clip(e, -100.0, 100.0)
        inv = jnp.exp2(-e)
        eacc = jnp.where((row_i == g) & (col_i == 0), e, eacc)
        for j in range(gtypes):
            t = g * gtypes + j
            q = jnp.clip(jnp.round(vals[j] * inv), -127.0, 127.0)
            row0 = t * 128
            out_ref[row0:row0 + 128, :] = q.astype(jnp.int8)
    exp_ref[...] = eacc


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def node_table_block_major_q8(h, msg_w, msg_b, window: int,
                              interpret: bool = False):
    """Block-major node-transform table, int8-quantized per ``window``-row
    group with power-of-2 scales (the quantized SERVING path: the window
    kernel then runs int8×int8→int32 MXU dots — measured 496 vs 612
    ns/tile — and dequantizes per tile with one scalar multiply).

    Returns (table_q [N·T2, D] int8 — values only, half the write bytes
    of the round-3 [D+128] in-row-metadata layout — and scales [n_wins]
    f32, window-major in the same order ``win_of_tile`` indexes).  The
    exponents come out of the build kernel as padded f32 rows (a bare
    [n_wins, 1] output would violate Mosaic's (8, 128) block-shape
    rule); spill paths dequantize gathered rows via
    ``scales[row // window]`` (the [n_wins] vector is KiB-scale — the
    extra gather runs at the small-footprint engine rate)."""
    N, D = h.shape
    T2 = msg_w.shape[0]
    if N % 128 or D % 128:
        raise ValueError("q8 table needs N % 128 == 0 and D % 128 == 0")
    if window % 128 or (T2 * 128) % window:
        raise ValueError("window must be a 128-multiple dividing T2*128")
    gtypes = window // 128
    n_blk = N // 128
    wins_per_blk = T2 // gtypes
    rows_pad = max(8, -(-wins_per_blk // 8) * 8)
    kernel = functools.partial(_table_block_q8_kernel, gtypes=gtypes,
                               rows_pad=rows_pad)
    tq, exps = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((128, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((T2 * 128, D), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows_pad, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((N * T2, D), jnp.int8),
                   jax.ShapeDtypeStruct((n_blk * rows_pad, 128),
                                        jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * T2 * D,
            bytes_accessed=N * D * h.dtype.itemsize + N * T2 * D,
            transcendentals=4 * N // 128 * T2,
        ),
    )(h, msg_w, msg_b)
    scales = jnp.exp2(
        exps.reshape(n_blk, rows_pad, 128)[:, :wins_per_blk, 0]
    ).reshape(-1, 1)
    return tq, scales


def _node_table(h, msg_w, msg_b, row_major: str, interpret: bool):
    """Node-transform table in the layout the window layout was built for."""
    N, D = h.shape
    if row_major == "block":
        return node_table_block_major(h, msg_w, msg_b, interpret=interpret)
    if row_major == "src":
        transformed = jnp.einsum("nd,tdf->ntf", h, msg_w,
                                 preferred_element_type=jnp.float32) \
            + msg_b[None, :, :]
    else:
        transformed = jnp.einsum("nd,tdf->tnf", h, msg_w,
                                 preferred_element_type=jnp.float32) \
            + msg_b[:, None, :]
    return transformed.reshape(-1, D).astype(h.dtype)


def _window_step_kernel(block_of_tile_ref, win_of_tile_ref, tile_start_ref,
                        c_off_ref, *rest, window, nbuf, blocks_per_prog,
                        block_n, packed, has_init, q8=False,
                        ondemand=False, gtypes=0, t2=0, emit_res=False):
    """Fused propagation step: window accumulation + GRU epilogue.

    Same DMA-ring structure as :func:`_window_mono_kernel`, plus per dst
    block: the accumulator initializes from ``init_hbm`` (the spill path's
    aggregation — computed BEFORE this kernel so the epilogue sees the
    complete ``a``), and at the block's last tile the GRU update
    (SURVEY.md §2.3) runs in-kernel on the VMEM-resident ``a`` —
    eliminating the [N,D] a-write/read round-trip and the separate GRU
    pass (measured 3.6 ms/step at 262K nodes).  Gate matmuls take bf16
    inputs with f32 accumulation (MXU-native); state h stays f32.
    Forward-only: training uses the unfused path (custom VJP needs ``a``).

    ``q8``: the table is int8 with power-of-2 per-window scales (an extra
    scalar-prefetch array) — the tile product becomes an int8×int8→int32
    MXU dot dequantized by one scalar multiply (no int8→bf16 VPU convert
    of the count stream).

    ``emit_res``: ALSO write the step's backward residuals — one
    [n_rows, 4D] stream holding (a | z | r | h̃) per row in the compute
    dtype — staged in VMEM at the block's last tile and flushed async.
    This is what makes the fused step TRAINABLE (the custom VJP reads
    the residuals instead of re-running the aggregation + gate math);
    the serving path compiles with ``emit_res=False`` and pays nothing."""
    if q8:
        scales_ref = rest[0]
        rest = rest[1:]
    if ondemand:
        # table source is h itself: per tile, DMA the window's 128-row h
        # block and build the table window in VMEM (wbank/bbank resident,
        # tw scratch) — the [T2·N, D] table never exists in HBM
        (table_hbm, c_hbm, init_hbm, h_hbm, wa_ref, b_ref, uzr_ref, uh_ref,
         wbank_ref, bbank_ref, *rest) = rest
        wpb = t2 // gtypes
    else:
        (table_hbm, c_hbm, init_hbm, h_hbm, wa_ref, b_ref, uzr_ref, uh_ref,
         *rest) = rest
    out_hbm, *rest = rest
    res_hbm = None
    if emit_res:
        res_hbm, *rest = rest
    acc, tbl_buf, c_buf, init_buf, h_buf, *rest = rest
    if ondemand:
        tw, *rest = rest
    res_buf = None
    if emit_res:
        res_buf, *rest = rest
    tbl_sem, c_sem, init_sem, h_sem, out_sem, *rest = rest
    res_sem = rest[0] if emit_res else None
    p = pl.program_id(0)
    b0 = p * blocks_per_prog
    t0 = tile_start_ref[b0]
    t1 = tile_start_ref[b0 + blocks_per_prog]
    D = out_hbm.shape[-1]

    def in_dma(slot, t):
        w = win_of_tile_ref[t]
        # q8 tables are values-only int8 [R, D] since round 6 — the
        # window DMA is HALF the bf16 bytes (the dominant per-tile cost)
        if ondemand:
            src = table_hbm.at[pl.ds((w // wpb) * 128, 128), :]
        else:
            src = table_hbm.at[pl.ds(w * window, window), :]
        m = pltpu.make_async_copy(src, tbl_buf.at[slot], tbl_sem.at[slot])
        c = pltpu.make_async_copy(
            c_hbm.at[pl.ds(c_off_ref[t] * block_n, block_n), :],
            c_buf.at[slot], c_sem.at[slot])
        return m, c

    def start_in(slot, t):
        @pl.when(win_of_tile_ref[t] >= 0)
        def _():
            m, c = in_dma(slot, t)
            m.start()
            c.start()

    def st_dma(par, blk):
        """Per-block state DMAs: spill-init (consumed at the block's first
        tile) and h (consumed by the GRU at its last tile)."""
        dmas = [pltpu.make_async_copy(
            h_hbm.at[pl.ds(blk * block_n, block_n), :],
            h_buf.at[par], h_sem.at[par])]
        if has_init:
            dmas.append(pltpu.make_async_copy(
                init_hbm.at[pl.ds(blk * block_n, block_n), :],
                init_buf.at[par], init_sem.at[par]))
        return dmas

    def out_dma(par, blk):
        return pltpu.make_async_copy(
            acc.at[par], out_hbm.at[pl.ds(blk * block_n, block_n), :],
            out_sem.at[par])

    def res_dma(par, blk):
        return pltpu.make_async_copy(
            res_buf.at[par], res_hbm.at[pl.ds(blk * block_n, block_n), :],
            res_sem.at[par])

    def wait_out(par, blk):
        out_dma(par, blk).wait()
        if emit_res:
            res_dma(par, blk).wait()

    def prolog(k, _):
        @pl.when(t0 + k < t1)
        def _():
            start_in(k, t0 + k)
        return 0

    jax.lax.fori_loop(0, nbuf, prolog, 0, unroll=True)
    for d in st_dma(0, b0):
        d.start()
    if blocks_per_prog >= 2:
        for d in st_dma(1, b0 + 1):
            d.start()

    def body(t, _):
        slot = jax.lax.rem(t - t0, nbuf)
        blk = block_of_tile_ref[t]
        par = jax.lax.rem(blk - b0, 2)
        first = t == tile_start_ref[blk]
        last = t == tile_start_ref[blk + 1] - 1
        real = win_of_tile_ref[t] >= 0

        @pl.when(jnp.logical_and(first, blk - b0 >= 2))
        def _():
            wait_out(par, blk - 2)

        @pl.when(first)
        def _():
            for d in st_dma(par, blk):
                d.wait()
            if has_init:
                acc[par] = init_buf[par]
            else:
                acc[par] = jnp.zeros_like(acc[par])

        @pl.when(real)
        def _():
            m, c = in_dma(slot, t)
            m.wait()
            c.wait()
            if ondemand:
                tbase = jax.lax.rem(win_of_tile_ref[t], wpb) * gtypes
                for j in range(gtypes):
                    tw[j * 128:(j + 1) * 128, :] = (
                        jnp.dot(tbl_buf[slot], wbank_ref[tbase + j],
                                preferred_element_type=jnp.float32)
                        + bbank_ref[tbase + j, :][None, :]).astype(tw.dtype)
                prod = jnp.dot(c_buf[slot].astype(tw.dtype), tw[...],
                               preferred_element_type=jnp.float32)
            elif q8:
                pi = jnp.dot(c_buf[slot], tbl_buf[slot],
                             preferred_element_type=jnp.int32)
                prod = (pi.astype(jnp.float32)
                        * scales_ref[win_of_tile_ref[t]])
            else:
                prod = _count_dot(c_buf[slot], tbl_buf[slot], window, packed)
            acc[par] = acc[par] + prod

        @pl.when(t + nbuf < t1)
        def _():
            start_in(slot, t + nbuf)

        @pl.when(last)
        def _():
            a = acc[par]
            hblk = h_buf[par]
            cdt = wa_ref.dtype
            pa = jnp.dot(a.astype(cdt), wa_ref[...],
                         preferred_element_type=jnp.float32) + b_ref[...]
            ph = jnp.dot(hblk.astype(cdt), uzr_ref[...],
                         preferred_element_type=jnp.float32)
            z = jax.nn.sigmoid(pa[:, :D] + ph[:, :D])
            r = jax.nn.sigmoid(pa[:, D:2 * D] + ph[:, D:])
            htil = jnp.tanh(pa[:, 2 * D:]
                            + jnp.dot((r * hblk).astype(cdt), uh_ref[...],
                                      preferred_element_type=jnp.float32))
            if emit_res:
                # stage (a | z | r | h̃) narrow and flush async — the
                # custom VJP's whole view of this step
                res_buf[par, :, :D] = a.astype(res_buf.dtype)
                res_buf[par, :, D:2 * D] = z.astype(res_buf.dtype)
                res_buf[par, :, 2 * D:3 * D] = r.astype(res_buf.dtype)
                res_buf[par, :, 3 * D:] = htil.astype(res_buf.dtype)
                res_dma(par, blk).start()
            acc[par] = (1.0 - z) * hblk + z * htil
            out_dma(par, blk).start()

            @pl.when(blk + 2 < b0 + blocks_per_prog)
            def _():
                for d in st_dma(par, blk + 2):
                    d.start()

        return 0

    jax.lax.fori_loop(t0, t1, body, 0)
    last_blk = b0 + blocks_per_prog - 1
    if blocks_per_prog >= 2:
        wait_out(jax.lax.rem(last_blk - 1 - b0, 2), last_blk - 1)
    wait_out(jax.lax.rem(last_blk - b0, 2), last_blk)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "window", "n_progs", "nbuf",
                                    "out_rows", "packed", "has_init",
                                    "emit_res", "interpret"))
def window_step_gru(table, c_stream, tile_start, block_of_tile, win_of_tile,
                    init, h, wa, b3, uzr, uh, n_blocks: int, window: int,
                    n_progs: int = 1, nbuf: int = 6,
                    out_rows: int = BLOCK_N, packed: bool = False,
                    has_init: bool = True, emit_res: bool = False,
                    interpret: bool = False,
                    scales=None, c_off=None, msg_w=None, msg_b=None):
    """Fused window-aggregation + GRU step (see :func:`_window_step_kernel`).

    ``init`` [n_blocks·out_rows, D] f32: spill-path partial aggregation
    (ignored when ``has_init=False``); ``h`` [n_blocks·out_rows, D] f32;
    ``wa`` [D, 3D] / ``uzr`` [D, 2D] / ``uh`` [D, D] fused GRU weights in
    the compute dtype, ``b3`` [1, 3D] f32.  Returns h_new (f32).

    ``scales`` [n_wins] f32 selects the quantized path: ``table`` is then
    the values-only int8 [R, D] output of
    :func:`node_table_block_major_q8`.

    ``msg_w``/``msg_b`` select the ON-DEMAND path: ``table`` is then the
    (compute-dtype) h source array itself — each tile DMAs a 128-row h
    block and builds its table window in VMEM (gtypes MXU dots against
    the resident weight bank); no [T2·N, D] table exists in HBM.

    ``emit_res``: returns (h_new, resid) where resid [n_rows, 4D] holds
    (a | z | r | h̃) per row in the compute dtype — the trainable fused
    step's backward residuals (see :func:`gru_window_step`)."""
    q8 = scales is not None
    ondemand = msg_w is not None
    if emit_res and q8:
        raise ValueError("emit_res (training) and q8 (serving quant) are "
                         "mutually exclusive")
    R, D_row = table.shape
    D = D_row
    if not ondemand and R % window:
        raise ValueError("table rows must be a multiple of window")
    if n_blocks % n_progs:
        raise ValueError("n_progs must divide n_blocks")
    if q8 and packed or ondemand and (q8 or packed):
        raise ValueError("q8 / packed / ondemand are mutually exclusive")
    t2 = gtypes = 0
    if ondemand:
        if window % 128:
            raise ValueError("ondemand needs window % 128 == 0")
        t2 = msg_w.shape[0]
        gtypes = window // 128
        if (t2 * 128) % window or R % 128:
            raise ValueError("ondemand needs (T2*128) % window == 0 and "
                             "h rows % 128 == 0")
        msg_w = msg_w.astype(table.dtype)
    if c_off is None:
        c_off = jnp.arange(win_of_tile.shape[0], dtype=jnp.int32)
    c_cols = window // 2 if packed else window
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    rdt = table.dtype if not q8 else jnp.dtype(jnp.bfloat16)
    scratch = [
        pltpu.VMEM((2, out_rows, D), jnp.float32),
        pltpu.VMEM((nbuf, 128 if ondemand else window, D), table.dtype),
        pltpu.VMEM((nbuf, out_rows, c_cols), c_stream.dtype),
        pltpu.VMEM((2, out_rows, D), jnp.float32),
        pltpu.VMEM((2, out_rows, D), jnp.float32),
    ]
    if ondemand:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        scratch.append(pltpu.VMEM((window, D), table.dtype))
    if emit_res:
        scratch.append(pltpu.VMEM((2, out_rows, 4 * D), rdt))
    scratch += [
        pltpu.SemaphoreType.DMA((nbuf,)),
        pltpu.SemaphoreType.DMA((nbuf,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if emit_res:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((n_blocks * out_rows, D), jnp.float32)
    if emit_res:
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape, jax.ShapeDtypeStruct(
            (n_blocks * out_rows, 4 * D), rdt)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if q8 else 4,
        grid=(n_progs,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_window_step_kernel, window=window, nbuf=nbuf,
                               blocks_per_prog=n_blocks // n_progs,
                               block_n=out_rows, packed=packed,
                               has_init=has_init, q8=q8, ondemand=ondemand,
                               gtypes=gtypes, t2=t2, emit_res=emit_res)
    n_tiles = win_of_tile.shape[0]
    args = (block_of_tile, win_of_tile, tile_start, c_off)
    if q8:
        args = args + (scales,)
    ins = (table, c_stream, init, h, wa, b3, uzr, uh)
    if ondemand:
        ins = ins + (msg_w, msg_b.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * out_rows * window * D
            + (2 * n_tiles * window * D * D if ondemand else 0)
            + n_blocks * out_rows * D * 6 * D * 2,
            bytes_accessed=n_tiles * (
                (128 if ondemand else window) * D_row * table.dtype.itemsize
                + out_rows * c_cols)
            + n_blocks * out_rows * D * 4 * (3 if has_init else 2)
            + (n_blocks * out_rows * 4 * D * rdt.itemsize if emit_res
               else 0),
            transcendentals=3 * n_blocks * out_rows * D,
        ),
    )(*args, *ins)


def gru_window_step(h, layout: DeviceWindowLayout, msg_w, msg_b, gru: dict,
                    interpret: bool | None = None, quantized: bool = False,
                    extra_init=None):
    """One full propagation step h → h' through the fused kernel:
    table kernel → spill partial aggregation → fused window-accumulate +
    GRU epilogue.  Numerically the gate matmuls run bf16-in/f32-acc when
    ``msg_w`` is bf16 (vs f32 in the unfused path).

    TRAINABLE: the custom VJP compiles the kernel with ``emit_res=True``
    under differentiation (one extra [n_rows, 4D] narrow residual stream
    per step — a, z, r, h̃), then reuses :func:`gru_cell_bwd` and
    :func:`_aggregate_window_bwd` for the backward.  The serving (primal)
    compile emits no residuals and pays nothing.  Needs a with_grad
    layout and N % 128 == 0 to take gradients.

    ``quantized``: int8 table with power-of-2 per-window scales
    (node_table_block_major_q8) — the serving quantization mode; needs a
    row_major='block' layout and D % 128 == 0.  Adds ~0.5 % relative
    noise to the aggregation (int8 rounding).  Forward-only.

    ``extra_init`` [R ≤ N, D]: an externally-computed partial
    aggregation added into ``a`` before the GRU epilogue (the sharded
    halo path's remote-edge contribution) — differentiable (its
    cotangent is da's leading rows, so R must not exceed N = h.shape[0];
    the halo path always satisfies this).  Composes with ``quantized``
    (round 6): the extra partial is computed in bf16 outside and folds
    into the init stream, so sharded q8 serving carries no quantization
    noise on cross-shard edges."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if extra_init is not None and extra_init.shape[0] > h.shape[0]:
        # the backward slices d_extra = da[:R] out of da's N rows — more
        # rows than N would silently clip and surface later as an opaque
        # cotangent shape mismatch (ADVICE r2)
        raise ValueError(
            f"extra_init has {extra_init.shape[0]} rows > h's "
            f"{h.shape[0]}; the fused step's cotangent for extra_init "
            "is a leading slice of da [N, D]")
    (n_nodes_pad, W, n_tiles, n_blocks, spill_meta, row_major, _,
     block_rows) = layout.meta[:8]
    pack_fwd = layout.meta[8][0] if len(layout.meta) > 8 else False
    on_demand = layout.on_demand
    if on_demand and quantized:
        raise ValueError("on_demand and quantized_table are mutually "
                         "exclusive serving modes")
    if row_major not in ("block", "src"):
        raise ValueError("gru_window_step needs a row_major='block' or "
                         "'src' layout")
    arrs = layout.arrays
    N, D = h.shape
    cdt = msg_w.dtype
    wa = jnp.concatenate([gru["wz"], gru["wr"], gru["wh"]], axis=1)
    b3 = jnp.concatenate([gru["bz"], gru["br"], gru["bh"]])[None, :]
    uzr = jnp.concatenate([gru["uz"], gru["ur"]], axis=1)
    if quantized:
        if row_major != "block":
            raise ValueError("quantized serving needs row_major='block'")
        if pack_fwd:
            raise ValueError("quantized serving is incompatible with "
                             "pack_counts (int8 MXU consumes raw counts)")
        xw_sp = spill_meta is not None and len(spill_meta) > 8
        table, scales = node_table_block_major_q8(
            h.astype(cdt), msg_w, msg_b, window=W, interpret=interpret)
        scales = scales[:, 0]
        n_rows = n_blocks * block_rows
        has_extra = extra_init is not None and extra_init.shape[0] > 0
        has_init = spill_meta is not None or has_extra
        if xw_sp:
            # XW typed spill: gathers h directly and transforms in bf16
            # type buckets — never touches the q8 table, so the spill
            # contribution carries NO quantization noise (round 6; this
            # is the headline community config's spill)
            init = _spill_partial(h.astype(cdt), None, arrs, spill_meta,
                                  msg_w, msg_b, interpret)
        elif spill_meta is not None:
            # legacy table-gather spill: dequantize the gathered int8
            # rows via the [n_wins] scales vector (KiB-scale footprint —
            # the extra row//W gather is engine-cheap; the round-3
            # in-row exponent byte is gone, see node_table_block_major_q8)
            idx = arrs["s_gather_idx"]
            raw = table[idx]
            msgs = (raw.astype(jnp.float32)
                    * scales[idx // W][:, None]).astype(cdt)
            init = _spill_scatter_msgs(msgs, arrs, spill_meta, interpret)
        else:
            init = jnp.zeros((n_rows, D), jnp.float32)
        if has_extra:
            # externally-computed partial (the sharded halo path's
            # remote-edge contribution, computed in bf16) folded into the
            # init stream — same as the non-quantized fused step
            init = init + jnp.pad(
                extra_init.astype(jnp.float32),
                ((0, n_rows - extra_init.shape[0]), (0, 0)))
        h_pad = jnp.pad(h.astype(jnp.float32), ((0, n_rows - N), (0, 0)))
        h_new = window_step_gru(
            table, arrs["c_stream"], arrs["tile_start"],
            arrs["block_of_tile"], arrs["win_of_tile"], init, h_pad,
            wa.astype(cdt), b3.astype(jnp.float32), uzr.astype(cdt),
            gru["uh"].astype(cdt),
            n_blocks=n_blocks, window=W, out_rows=block_rows,
            packed=pack_fwd, has_init=has_init, interpret=interpret,
            scales=scales, c_off=arrs.get("c_off"))
        return h_new[:N]
    if extra_init is None:
        extra_init = jnp.zeros((0, D), jnp.float32)
    return _fused_gru_step(layout.meta, interpret, arrs, h, msg_w, msg_b,
                           wa, b3, uzr, gru["uh"], extra_init)[:N]


def _fused_step_impl(meta, interpret, arrs, h, msg_w, msg_b, wa, b3, uzr,
                     uh, extra, emit_res):
    (n_nodes_pad, W, n_tiles, n_blocks, spill_meta, row_major, _,
     block_rows) = meta[:8]
    pack_fwd = meta[8][0] if len(meta) > 8 else False
    on_demand = meta[9] if len(meta) > 9 else False
    N, D = h.shape
    cdt = msg_w.dtype
    if on_demand:
        # the table source is h itself (the fused kernel builds windows
        # in VMEM against the resident weight bank)
        table = h.astype(cdt)
    else:
        table = _node_table(h.astype(cdt), msg_w, msg_b, row_major,
                            interpret)
        pad = (-table.shape[0]) % W
        if pad:
            table = jnp.pad(table, ((0, pad), (0, 0)))
    n_rows = n_blocks * block_rows
    has_init = spill_meta is not None or extra.shape[0] > 0
    if spill_meta is not None:
        init = _spill_partial(h.astype(cdt), table, arrs, spill_meta,
                              msg_w, msg_b, interpret)
    else:
        init = jnp.zeros((n_rows, D), jnp.float32)
    if extra.shape[0] > 0:
        # externally-computed partial aggregation folded into the kernel's
        # init stream (the sharded halo path's remote-edge contribution) —
        # the GRU epilogue still sees the complete a
        init = init + jnp.pad(extra.astype(jnp.float32),
                              ((0, n_rows - extra.shape[0]), (0, 0)))
    h_pad = jnp.pad(h.astype(jnp.float32), ((0, n_rows - N), (0, 0)))
    return window_step_gru(
        table, arrs["c_stream"], arrs["tile_start"], arrs["block_of_tile"],
        arrs["win_of_tile"], init, h_pad, wa.astype(cdt),
        b3.astype(jnp.float32), uzr.astype(cdt), uh.astype(cdt),
        n_blocks=n_blocks, window=W, out_rows=block_rows, packed=pack_fwd,
        has_init=has_init, emit_res=emit_res, interpret=interpret,
        c_off=arrs.get("c_off"),
        msg_w=msg_w if on_demand else None,
        msg_b=msg_b if on_demand else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_gru_step(meta, interpret, arrs, h, msg_w, msg_b, wa, b3, uzr,
                    uh, extra):
    return _fused_step_impl(meta, interpret, arrs, h, msg_w, msg_b, wa, b3,
                            uzr, uh, extra, emit_res=False)


def _fused_gru_step_fwd(meta, interpret, arrs, h, msg_w, msg_b, wa, b3,
                        uzr, uh, extra):
    h_new, resid = _fused_step_impl(meta, interpret, arrs, h, msg_w, msg_b,
                                    wa, b3, uzr, uh, extra, emit_res=True)
    cdt = msg_w.dtype
    # h saved narrow (its consumers are matmuls + elementwise vs the
    # already-narrow gates — same policy as models.ggnn._gru_core_fwd)
    # 0-byte witness carrying extra's static row count + dtype for the
    # d_extra cotangent
    e_wit = jnp.zeros((extra.shape[0], 0), extra.dtype)
    return h_new, (arrs, h.astype(cdt), msg_w, wa, uzr, uh, resid,
                   jnp.zeros((), h.dtype), e_wit)


def _fused_gru_step_bwd(meta, interpret, res, g):
    from ggnn_tpu.ops.gru_pallas import gru_cell_bwd
    arrs, hc, msg_w, wa, uzr, uh, resid, h_wit, e_wit = res
    N, D = hc.shape
    if N % 128 or D % 128:
        raise ValueError("the fused window+GRU step takes gradients only "
                         f"for N % 128 == 0 and D % 128 == 0 (got "
                         f"{N}×{D}); use the unfused path "
                         "(cfg.fuse_gru=False)")
    cdt = msg_w.dtype
    a = resid[:N, :D]
    z = resid[:N, D:2 * D]
    r = resid[:N, 2 * D:3 * D]
    htil = resid[:N, 3 * D:]
    # GRU backward on the kernel's saved gates (padding rows of g beyond
    # N carry no gradient: their h_new rows are pad-only)
    dh1, da, dwa, db3, duzr, duh = gru_cell_bwd(
        g[:N].astype(jnp.float32), hc, a, z, r, htil, wa, uzr, uh,
        mdt=jnp.dtype(cdt).name, interpret=interpret,
        # narrow da: every consumer (spill gather, transposed kernel,
        # f32-accumulating db einsum) wants the compute dtype — saves
        # the f32 [N, D] write plus two cast passes per step
        da_dtype=jnp.dtype(cdt).name)
    # aggregation backward (fused bwd kernel + spill backward + indeg db)
    d_arrs, dh2, dW, dbm = _aggregate_window_bwd(
        meta, interpret, (arrs, hc, msg_w), da)
    dh = (dh1 + dh2.astype(jnp.float32)).astype(h_wit.dtype)
    # extra init enters a additively: its cotangent is da's leading rows
    d_extra = da[:e_wit.shape[0]].astype(e_wit.dtype)
    return (d_arrs, dh, dW, dbm, dwa.astype(wa.dtype),
            db3.reshape(1, -1).astype(jnp.float32),
            duzr.astype(uzr.dtype), duh.astype(uh.dtype), d_extra)


_fused_gru_step.defvjp(_fused_gru_step_fwd, _fused_gru_step_bwd)


def _spill_scatter(table, arrs, spill_meta, interpret):
    """Spilled-edge aggregation: per-edge gather from the table + one-hot
    MXU scatter.  16-aligned layouts ride the mono kernel with
    win_stride=edge_align (gather reads ~real rows only)."""
    return _spill_scatter_msgs(table[arrs["s_gather_idx"]], arrs,
                               spill_meta, interpret)


def _spill_partial(h, table, arrs, spill_meta, msg_w, msg_b, interpret):
    """Spill aggregation dispatch: XW (no-table) layouts — marked by the
    9th spill_meta element, the static type-bucket offsets — gather h
    [N, D] directly (~3.5× the per-row rate of the [T2·N, D] table
    gather: footprint-sensitivity, docs/DESIGN.md round 4), transform in
    type-major static buckets (one batched einsum + bias), then ride the
    ordinary block-level one-hot scatter: ``s_gather_idx`` indexes the
    transformed pack, doubling as the permutation into scatter order."""
    if len(spill_meta) > 8:
        offs = spill_meta[8]
        T2, D = msg_w.shape[0], msg_w.shape[2]
        N = h.shape[0]
        src = arrs["sx_src"]
        hc = h.astype(msg_w.dtype)
        # pad slots carry src == n_src_rows: zero their rows so they
        # contribute only the bias, and their one-hot columns are zero
        hsp = jnp.where((src < N)[:, None], hc[jnp.minimum(src, N - 1)], 0)
        strides = {offs[t + 1] - offs[t] for t in range(T2)}
        if len(strides) == 1:
            P = strides.pop()
            msgs = (jnp.einsum("tpd,tdf->tpf", hsp.reshape(T2, P, D),
                               msg_w, preferred_element_type=jnp.float32)
                    + msg_b[:, None, :].astype(jnp.float32)).reshape(-1, D)
        else:
            msgs = jnp.concatenate(
                [jnp.dot(hsp[offs[t]:offs[t + 1]], msg_w[t],
                         preferred_element_type=jnp.float32)
                 + msg_b[t].astype(jnp.float32) for t in range(T2)], axis=0)
        # cast BEFORE the permutation gather (the row engine is
        # byte-sensitive); padding scatter slots gather row 0 and vanish
        # against their all-zero one-hot columns
        return _spill_scatter_msgs(msgs.astype(msg_w.dtype)
                                   [arrs["s_gather_idx"]],
                                   arrs, spill_meta, interpret)
    return _spill_scatter(table, arrs, spill_meta, interpret)


def _spill_scatter_msgs(msgs, arrs, spill_meta, interpret, prefix="s_"):
    s_tile_e, s_blocks = spill_meta[1], spill_meta[3]
    align = spill_meta[6] if len(spill_meta) > 6 else None
    if align is not None:
        use_dstl = (prefix + "dstl") in arrs
        return window_block_spmm_mono(
            msgs,
            arrs[prefix + ("dstl" if use_dstl else "onehot")],
            arrs[prefix + "tile_start"],
            arrs[prefix + "block_of_tile"], arrs[prefix + "tile_msg_off"],
            n_blocks=s_blocks, window=s_tile_e, win_stride=align,
            out_rows=BLOCK_N, dstl=use_dstl, interpret=interpret)
    return onehot_segment_scatter_flat(
        msgs, arrs[prefix + "onehot"], arrs[prefix + "tile_start"],
        arrs[prefix + "block_of_tile"], n_blocks=s_blocks, tile_e=s_tile_e,
        interpret=interpret)


def aggregate_window(h, layout: DeviceWindowLayout, msg_w, msg_b,
                     interpret: bool | None = None):
    """Full typed aggregation via the windowed block-CSR path (+ spill).

    a = Σ_tiles C · table_window (+ one-hot scatter of spilled edges);
    table = einsum(h, W) + b as in :func:`scatter_pallas.aggregate_onehot`.
    Differentiable when the layout was built ``with_grad=True`` (the
    backward typed scatter Y = Cᵀ·ā rides the SAME mono kernel with roles
    swapped; spilled edges fall back to XLA segment_sum)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _aggregate_window(layout.meta, interpret, layout.arrays, h,
                             msg_w, msg_b)


def _agg_window_impl(meta, interpret, arrs, h, msg_w, msg_b):
    (n_nodes_pad, W, n_tiles, n_blocks, spill_meta, row_major, _,
     block_rows) = meta[:8]
    pack_fwd = meta[8][0] if len(meta) > 8 else False
    on_demand = meta[9] if len(meta) > 9 else False
    N, D = h.shape
    if on_demand:
        # no [T2·N, D] table in HBM: the kernel streams h blocks and
        # builds each window in VMEM; the spill (typed) gathers h too
        table = None
        out = window_block_spmm_ondemand(
            h, msg_w, msg_b, arrs["c_stream"], arrs["tile_start"],
            arrs["block_of_tile"], arrs["win_of_tile"],
            arrs.get("c_off"), n_blocks=n_blocks, window=W,
            out_rows=block_rows, interpret=interpret)
    else:
        table = _node_table(h, msg_w, msg_b, row_major, interpret)
        pad = (-table.shape[0]) % W
        if pad:
            table = jnp.pad(table, ((0, pad), (0, 0)))
        out = window_block_spmm_mono(
            table, arrs["c_stream"], arrs["tile_start"],
            arrs["block_of_tile"], arrs["win_of_tile"],
            n_blocks=n_blocks, window=W, out_rows=block_rows,
            packed=pack_fwd, c_off=arrs.get("c_off"), interpret=interpret)
    if spill_meta is not None:
        out = out + _spill_partial(h, table, arrs, spill_meta, msg_w,
                                   msg_b, interpret)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _aggregate_window(meta, interpret, arrs, h, msg_w, msg_b):
    return _agg_window_impl(meta, interpret, arrs, h, msg_w, msg_b)


def _aggregate_window_fwd(meta, interpret, arrs, h, msg_w, msg_b):
    return _agg_window_impl(meta, interpret, arrs, h, msg_w, msg_b), \
        (arrs, h, msg_w)


def _spill_backward(arrs, sp_offs, sb_meta, h, da, msg_w, interpret):
    """dh/dW contributions of the SPILLED edges (db is folded into the
    gt_indeg matmul by the caller), with NO row-serialized XLA op:
    segment_sum and ``.at[].add`` are row-op-rate-bound (~5 ms each for
    ~400K rows, 10 of the 12 ms spill backward).  Per-edge da rows in
    type-major static buckets feed batched einsums; the dh scatter rides
    the one-hot MXU kernel (same machinery as the forward spill).

    When the layout builder chose UNIFORM bucket sizes the einsums are
    single batched [T2, P, D] contractions; otherwise a per-type loop over
    static ragged slices."""
    N, D = h.shape
    T2 = msg_w.shape[0]
    src = arrs["s_bwd_src"]
    tot = src.shape[0]
    # cast BEFORE the gather (an f32 ā gather measured ~3× the bf16 rate
    # at 512 B rows — the row engine is byte-sensitive there)
    G = da.astype(h.dtype)[arrs["s_bwd_dst"]]
    # padding slots carry src == n_src_rows: zero their h rows so the dW
    # einsum drops them (their dh rows are excluded by the one-hot pack)
    Hsp = jnp.where((src < N)[:, None], h[jnp.minimum(src, N - 1)], 0)
    strides = {sp_offs[t + 1] - sp_offs[t] for t in range(T2)}
    if len(strides) == 1:
        P = strides.pop()
        Gb = G.reshape(T2, P, D)
        dh_e = jnp.einsum("tpf,tdf->tpd", Gb, msg_w,
                          preferred_element_type=jnp.float32
                          ).reshape(tot, D)
        dW_sp = jnp.einsum("tpd,tpf->tdf", Hsp.reshape(T2, P, D), Gb,
                           preferred_element_type=jnp.float32)
    else:
        dh_rows, dw_rows = [], []
        for t in range(T2):
            o0, o1 = sp_offs[t], sp_offs[t + 1]
            gsl = G[o0:o1]
            dh_rows.append(jnp.dot(gsl, msg_w[t].T,
                                   preferred_element_type=jnp.float32))
            dw_rows.append(jnp.dot(Hsp[o0:o1].T, gsl,
                                   preferred_element_type=jnp.float32))
        dh_e = jnp.concatenate(dh_rows, axis=0)
        dW_sp = jnp.stack(dw_rows)
    if sb_meta is not None:
        msgs = dh_e.astype(h.dtype)[arrs["sb_gather_idx"]]
        dh_sp = _spill_scatter_msgs(msgs, arrs, sb_meta, interpret,
                                    prefix="sb_")[:N]
    else:
        # fallback (n_src_rows not 128-aligned): row-serialized scatter
        dh_sp = jnp.zeros((N, D), jnp.float32).at[
            jnp.minimum(src, N)].add(dh_e, mode="drop")
    return dh_sp, dW_sp


def _aggregate_window_bwd(meta, interpret, res, da):
    arrs, h, msg_w = res
    (n_nodes_pad, W, n_tiles, n_blocks, spill_meta, row_major, grad_meta,
     block_rows) = meta[:8]
    pack_bwd = meta[8][1] if len(meta) > 8 else False
    if grad_meta is None:
        raise ValueError("aggregate_window backward needs a layout built "
                         "with_grad=True")
    n_wins, _, sp_offs = grad_meta[:3]
    sb_meta = grad_meta[3] if len(grad_meta) > 3 else None
    fwd_stream = grad_meta[4] if len(grad_meta) > 4 else False
    N, D = h.shape
    T2 = msg_w.shape[0]
    R = T2 * N
    # callers may pass da with fewer rows than the layout's padded dst
    # space (out[:N] slicing) — pad once for db (padding rows have zero
    # in-degree) and once in the compute dtype for the kernels.  NOTE:
    # da may already arrive NARROW (compute-dtype) from the fused-step
    # VJP (gru_cell_bwd emits da in cdt since round 7); db and the spill
    # backward still ACCUMULATE f32 from those rows — an intentional,
    # parity-tested trade (ADVICE r4)
    da_f = jnp.pad(da, ((0, n_blocks * block_rows - da.shape[0]), (0, 0)))
    da_pad = da_f.astype(h.dtype)
    dh_sp = dW_sp = None
    if spill_meta is not None:
        dh_sp, dW_sp = _spill_backward(arrs, sp_offs, sb_meta, h, da_f,
                                       msg_w, interpret)
    # db covers ALL real edges (kept + spilled) via the precomputed
    # in-degree: one [T2, N]·[N, D] matmul, no Y row-sum and no masked
    # spill reduction
    db = jnp.einsum("tn,nd->td", arrs["gt_indeg"],
                    da_f[:arrs["gt_indeg"].shape[1]],
                    preferred_element_type=jnp.float32)
    if fwd_stream:
        # fused path: dh/dW straight out of the transposed kernel's VMEM
        # windows (no [T2·N, D] Y in HBM), reading the FORWARD count
        # stream in the fully-transposed orientation (āᵀ in, dhᵀ/dWᵀ out
        # — every kernel dot a standard (1,0) contraction)
        if N % 128 or n_wins != (T2 * N) // W:
            raise ValueError(
                f"fused-backward layout mismatch: h has {N} rows but the "
                f"layout was built for {n_wins * W // T2}")
        if len(meta) > 10 and meta[10]:
            # int8 gradient stream (VERDICT r4 #3): quantize ā's
            # cotangent per block, int8-MXU transposed kernel
            da_q, da_scl = quantize_grad_pow2(da_f, block_rows)
            dht, dWt = window_bwd_fused(
                da_q.T, arrs["c_stream"], arrs["gt_tile_start"],
                arrs["gt_block_of_tile"], arrs["gt_win_of_tile"],
                arrs["gt_c_off"], msg_w, h, n_wins=n_wins,
                window=block_rows, out_rows=W, t2=T2,
                da_scales=da_scl, interpret=interpret)
        else:
            dht, dWt = window_bwd_fused(
                da_pad.T, arrs["c_stream"], arrs["gt_tile_start"],
                arrs["gt_block_of_tile"], arrs["gt_win_of_tile"],
                arrs["gt_c_off"], msg_w, h, n_wins=n_wins,
                window=block_rows, out_rows=W, t2=T2,
                interpret=interpret)
        dh = dht.T
        dW = dWt.transpose(0, 2, 1)
        if dh_sp is not None:
            dh = dh + dh_sp
            dW = dW + dW_sp
        d_arrs = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), arrs)
        return (d_arrs, dh.astype(h.dtype), dW.astype(msg_w.dtype),
                db.astype(msg_w.dtype))
    # Y[row] = Σ_{(u,t,v)} ā_v over windowed edges: the same mono kernel,
    # transposed roles (out blocks = W table rows, inputs = ā dst blocks).
    # Y is a [T2·N, D]-sized intermediate — emit it in the compute dtype
    # (bf16 halves ~3 full HBM passes; the einsums below accumulate f32)
    Y = window_block_spmm_mono(
        da_pad, arrs["ct_stream"], arrs["gt_tile_start"],
        arrs["gt_block_of_tile"], arrs["gt_win_of_tile"], n_blocks=n_wins,
        window=block_rows, out_rows=W, packed=pack_bwd,
        c_off=arrs.get("gt_c_off"), out_dtype=h.dtype,
        interpret=interpret)[:R]
    if row_major == "block":
        Yb = Y.reshape(N // 128, T2, 128, D)
        dh = jnp.einsum("btsf,tdf->bsd", Yb, msg_w,
                        preferred_element_type=jnp.float32).reshape(N, D)
        dW = jnp.einsum("bsd,btsf->tdf", h.reshape(N // 128, 128, D), Yb,
                        preferred_element_type=jnp.float32)
    elif row_major == "src":
        Yr = Y.reshape(N, T2, D)
        dh = jnp.einsum("ntf,tdf->nd", Yr, msg_w,
                        preferred_element_type=jnp.float32)
        dW = jnp.einsum("nd,ntf->tdf", h, Yr,
                        preferred_element_type=jnp.float32)
    else:
        Yr = Y.reshape(T2, N, D)
        dh = jnp.einsum("tnf,tdf->nd", Yr, msg_w,
                        preferred_element_type=jnp.float32)
        dW = jnp.einsum("nd,tnf->tdf", h, Yr,
                        preferred_element_type=jnp.float32)
    if dh_sp is not None:
        dh = dh + dh_sp
        dW = dW + dW_sp
    d_arrs = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), arrs)
    return (d_arrs, dh.astype(h.dtype), dW.astype(msg_w.dtype),
            db.astype(msg_w.dtype))


_aggregate_window.defvjp(_aggregate_window_fwd, _aggregate_window_bwd)
