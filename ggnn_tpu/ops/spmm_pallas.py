"""Pallas TPU typed SpMM: the hot aggregation kernel (SURVEY.md §2.4, §7.2.1).

Design (TPU-first, not a translation of the reference's dense ``bmm``):

1. **Type-tiled edge layout** (``pack_type_tiles``, runs in-jit, once per
   batch — hoisted out of the T-step scan): edges arrive sorted by
   (type, dst) from :mod:`ggnn_tpu.graph`; each type segment is padded to a
   multiple of ``TILE_E`` so every kernel tile is single-type.  Padding
   edges scatter to an out-of-bounds slot and are dropped (XLA scatter
   semantics), leaving mask=0 rows.

2. **Messages kernel**: grid over edge tiles with
   ``PrefetchScalarGridSpec`` — the per-tile type id is a scalar-prefetch
   operand, so the BlockSpec index_map DMAs exactly ONE [D, D] weight
   matrix from the [2E, D, D] bank per tile.  Each tile is one MXU matmul
   ``[TILE_E, D] · [D, D]`` plus bias and mask — messages come out masked,
   so the scatter needs no extra elementwise pass.

3. **Gather/scatter** stay in XLA (``h[src]`` + ``segment_sum``): XLA's
   TPU gather/scatter are fused with neighbors, and the scan keeps
   everything on-chip.  (Full in-kernel DMA gather + sorted-dst
   accumulation is the next optimization stage.)

Falls back to ``interpret=True`` off-TPU so the CPU test suite validates
the exact kernel logic (SURVEY.md §4.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_E = 128


def tiles_budget(e_pad: int, n_message_types: int, tile_e: int = DEFAULT_TILE_E) -> int:
    """Static upper bound on packed tiles: every type can waste < 1 tile."""
    return (e_pad + tile_e - 1) // tile_e + n_message_types


def pack_type_tiles(edge_src, edge_dst, edge_type, edge_mask, type_offsets,
                    n_message_types: int, tile_e: int = DEFAULT_TILE_E):
    """Repack type-sorted edges so each ``tile_e`` tile is single-type.

    Pure jit-side shuffling with static shapes; returns a dict with
    ``src/dst/mask`` packed arrays of length ``n_tiles * tile_e`` and the
    per-tile type vector ``tile_type [n_tiles]``."""
    e_pad = edge_src.shape[0]
    n_tiles = tiles_budget(e_pad, n_message_types, tile_e)
    packed_len = n_tiles * tile_e

    counts = jnp.diff(type_offsets)                          # [T2]
    padded = ((counts + tile_e - 1) // tile_e) * tile_e
    starts = jnp.concatenate([jnp.zeros((1,), padded.dtype),
                              jnp.cumsum(padded)[:-1]])       # [T2]

    idx = jnp.arange(e_pad, dtype=jnp.int32)
    within = idx - type_offsets[edge_type]                    # rank inside segment
    pos = starts[edge_type] + within
    pos = jnp.where(edge_mask > 0, pos, packed_len)           # OOB → dropped

    def scatter(vals, fill):
        out = jnp.full((packed_len,), fill, vals.dtype)
        return out.at[pos].set(vals, mode="drop")

    src_p = scatter(edge_src, 0)
    dst_p = scatter(edge_dst, 0)
    mask_p = scatter(edge_mask.astype(jnp.float32), 0.0)

    tile_starts = starts // tile_e                            # [T2] first tile per type
    tile_ids = jnp.arange(n_tiles, dtype=tile_starts.dtype)
    tile_type = jnp.searchsorted(tile_starts, tile_ids, side="right") - 1
    tile_type = jnp.clip(tile_type, 0, n_message_types - 1).astype(jnp.int32)
    return {"src": src_p, "dst": dst_p, "mask": mask_p,
            "tile_type": tile_type, "n_tiles": n_tiles, "tile_e": tile_e}


def _messages_kernel(tile_type_ref, h_src_ref, w_ref, b_ref, mask_ref, out_ref):
    """One tile: [TILE_E, D] · [D, D] on the MXU + bias + mask."""
    msg = jnp.dot(h_src_ref[...], w_ref[0],
                  preferred_element_type=jnp.float32)
    out_ref[...] = (msg + b_ref[0]) * mask_ref[...]


@functools.partial(jax.jit, static_argnames=("tile_e", "interpret"))
def packed_messages(h, layout_src, layout_mask, tile_type, msg_w, msg_b,
                    tile_e: int = DEFAULT_TILE_E, interpret: bool = False):
    """Compute masked messages for the packed layout: [n_tiles·tile_e, D]."""
    packed_len = layout_src.shape[0]
    n_tiles = packed_len // tile_e
    D = h.shape[-1]
    h_src = h[layout_src]                                     # XLA gather
    mask2d = layout_mask.reshape(packed_len, 1)
    # bias as [T2, 1, D] so its block (1, 1, D) satisfies TPU tiling rules
    msg_b3 = msg_b[:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_e, D), lambda i, tt: (i, 0)),
            pl.BlockSpec((1, D, D), lambda i, tt: (tt[i], 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, tt: (tt[i], 0, 0)),
            pl.BlockSpec((tile_e, 1), lambda i, tt: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_e, D), lambda i, tt: (i, 0)),
    )
    return pl.pallas_call(
        _messages_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((packed_len, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * packed_len * D * D,
            bytes_accessed=packed_len * D * 4 * 2 + n_tiles * D * D * 4,
            transcendentals=0,
        ),
    )(tile_type, h_src, msg_w, msg_b3, mask2d)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sddmm_kernel(p_ref, q_ref, out_ref):
    out_ref[...] = jnp.sum(p_ref[...] * q_ref[...], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_e", "interpret"))
def sddmm_pallas(p_src, q_dst, tile_e: int = DEFAULT_TILE_E,
                 interpret: bool | None = None):
    """Pallas SDDMM: per-edge ⟨p_src[e], q_dst[e]⟩ over pre-gathered
    endpoint features [E, G] → [E] (SURVEY.md §2.4 native-unit table).

    E must be a multiple of ``tile_e`` (pad with zero rows)."""
    if interpret is None:
        interpret = _should_interpret()
    E, G = p_src.shape
    n_tiles = pl.cdiv(E, tile_e)
    out = pl.pallas_call(
        _sddmm_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_e, G), lambda i: (i, 0)),
                  pl.BlockSpec((tile_e, G), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_e, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((E, 1), jnp.float32),
        interpret=interpret,
    )(p_src, q_dst)
    return out[:, 0]


def typed_aggregate_tiled(h, layout, msg_w, msg_b, interpret=None, mask=None):
    """Aggregation using a precomputed type-tiled layout (hot path: the
    layout is built once per batch, outside the T-step scan).  ``mask``
    overrides the packed edge mask — used for per-step SDDMM edge gates
    (values in [0,1] scale messages).  Differentiable wrt h/msg_w/msg_b
    and mask (the gate path needs d·/dmask)."""
    if interpret is None:
        interpret = _should_interpret()
    if mask is None:
        mask = layout["mask"]
    return _typed_tiled(layout["tile_e"], interpret, h, msg_w, msg_b, mask,
                        layout["src"], layout["dst"], layout["tile_type"])


def _int_zero_ct(x):
    """float0 cotangent for integer primal args (layout index arrays are
    traced values inside jit, so they must be primal args, not
    nondiff_argnums)."""
    import numpy as _np
    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


def _typed_tiled_impl(tile_e, interpret, h, msg_w, msg_b, mask, src, dst,
                      tile_type):
    msgs = packed_messages(h, src, mask, tile_type, msg_w, msg_b,
                           tile_e=tile_e, interpret=interpret)
    return jax.ops.segment_sum(msgs, dst, num_segments=h.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _typed_tiled(tile_e, interpret, h, msg_w, msg_b, mask, src, dst,
                 tile_type):
    return _typed_tiled_impl(tile_e, interpret, h, msg_w, msg_b, mask, src,
                             dst, tile_type)


def _typed_tiled_fwd(tile_e, interpret, h, msg_w, msg_b, mask, src, dst,
                     tile_type):
    out = _typed_tiled_impl(tile_e, interpret, h, msg_w, msg_b, mask, src,
                            dst, tile_type)
    return out, (h, msg_w, msg_b, mask, src, dst, tile_type)


def _typed_tiled_bwd(tile_e, interpret, res, da):
    """Node-side backward (see scatter_pallas._aggregate_bwd): with
    ḡ_e = mask_e · da[dst_e], Y[t,u] = Σ_{(u,t,v)} ḡ; then
    dh = Σ_t Y_t·W_tᵀ, dW_t = hᵀ·Y_t, db_t = Σ_u Y_t[u], and
    dmask_e = ⟨m_e_unmasked, da[dst_e]⟩ (the SDDMM gate gradient)."""
    h, msg_w, msg_b, mask, src, dst, tile_type = res
    T2, D = msg_w.shape[0], msg_w.shape[-1]
    N = h.shape[0]
    etype = jnp.repeat(tile_type, tile_e)
    g = da[dst]                                             # [E_pack, D]
    gm = g * mask[:, None]
    Y = jax.ops.segment_sum(gm, etype * N + src,
                            num_segments=T2 * N).reshape(T2, N, D)
    dh = jnp.einsum("tnf,tdf->nd", Y, msg_w,
                    preferred_element_type=jnp.float32).astype(h.dtype)
    dW = jnp.einsum("nd,tnf->tdf", h, Y,
                    preferred_element_type=jnp.float32).astype(msg_w.dtype)
    db = jnp.sum(Y, axis=1).astype(msg_b.dtype)
    # unmasked messages for dmask (recompute — cheaper than stashing)
    msgs_un = packed_messages(h, src, jnp.ones_like(mask), tile_type,
                              msg_w, msg_b, tile_e=tile_e,
                              interpret=interpret)
    dmask = jnp.sum(msgs_un * g, axis=-1).astype(mask.dtype)
    return (dh, dW, db, dmask,
            _int_zero_ct(src), _int_zero_ct(dst), _int_zero_ct(tile_type))


_typed_tiled.defvjp(_typed_tiled_fwd, _typed_tiled_bwd)


def typed_aggregate_pallas(h, edge_src, edge_dst, edge_type, edge_mask,
                           msg_w, msg_b, type_offsets=None,
                           tile_e: int = DEFAULT_TILE_E, interpret=None):
    """Drop-in replacement for :func:`ggnn_tpu.ops.segment.typed_aggregate`.

    Builds the tiled layout inline — prefer :func:`typed_aggregate_tiled`
    with a hoisted layout inside scans."""
    if type_offsets is None:
        n_types = msg_w.shape[0]
        counts = jax.ops.segment_sum(
            (edge_mask > 0).astype(jnp.int32), edge_type, num_segments=n_types)
        type_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)
    layout = pack_type_tiles(edge_src, edge_dst, edge_type, edge_mask,
                             type_offsets, msg_w.shape[0], tile_e)
    return typed_aggregate_tiled(h, layout, msg_w, msg_b, interpret)
