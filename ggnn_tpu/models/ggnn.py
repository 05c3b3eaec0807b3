"""GGNN propagation core: T-step typed-message + GRU recurrence under lax.scan.

TPU-first redesign of the reference's Python step loop over dense ``bmm``
(SURVEY.md §3.2): typed sparse aggregation (ops.segment / ops.spmm_pallas)
feeding a GRU whose three a-projections are fused into one [D, 3D] matmul
for the MXU; the whole recurrence is a single ``lax.scan`` inside jit
(SURVEY.md §2.1 C5/C6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ggnn_tpu.models.config import ModelConfig
from ggnn_tpu.ops.segment import typed_aggregate


def init_state(annotations: jax.Array, state_dim: int) -> jax.Array:
    """h^(1) = pad(x, D) (SURVEY.md §2.3)."""
    n, a = annotations.shape
    return jnp.pad(annotations, ((0, 0), (0, state_dim - a)))


def gru_update(gru: dict, h: jax.Array, a: jax.Array,
               fused: tuple | None = None,
               matmul_dtype=None) -> jax.Array:
    """GRU cell (SURVEY.md §2.1 C6).  If ``fused`` is given it is the
    precomputed (W_a[D,3D], b[3D], U_zr[D,2D]) concatenation — one MXU pass
    for all three a-projections and one for the z/r h-projections.

    ``matmul_dtype`` (e.g. bf16) casts the MATMUL INPUTS only — gates,
    state and accumulation stay f32 (the MXU is bf16-native; f32 matmuls
    run at a fraction of peak).  Production sets this to the aggregation
    compute dtype; the paper-parity default keeps full f32.

    The cell carries a custom VJP with MINIMAL residuals (z, r, h̃ — in
    ``matmul_dtype`` when set): XLA's default AD materializes the [N, 3D]
    pre-activation projections and every gate intermediate per step, which
    measured 7.6 ms at 262K nodes/D=128 — ~3× the traffic the math needs.
    Gate gradients recompute from the saved gates (σ' = z(1−z) etc.)."""
    if fused is None:
        fused = fuse_gru(gru)
    w_a, b_all, u_zr = fused
    mdt = jnp.dtype(matmul_dtype).name if matmul_dtype is not None else None
    N, D = h.shape
    if mdt is not None and N % 128 == 0 and D % 128 == 0:
        # fused Pallas cell (ops/gru_pallas.py): one pass per 128/256/512-
        # row block; the jnp cell below measured ~3× its HBM traffic.
        # 128-row support keeps the sharded halo train path on the kernel
        # at any n_local % 128 == 0 (it silently fell back before)
        return _gru_core_pallas(mdt, w_a, b_all, u_zr, gru["uh"], h, a)
    return _gru_core(mdt, w_a, b_all, u_zr, gru["uh"], h, a)


def _gru_fwd_math(mdt, w_a, b_all, u_zr, uh, h, a):
    D = h.shape[-1]
    proj_a = _mm(mdt, a, w_a) + b_all
    proj_h = _mm(mdt, h, u_zr)
    az, ar, ah = proj_a[..., :D], proj_a[..., D:2 * D], proj_a[..., 2 * D:]
    hz, hr = proj_h[..., :D], proj_h[..., D:]
    z = jax.nn.sigmoid(az + hz)
    r = jax.nn.sigmoid(ar + hr)
    htil = jnp.tanh(ah + _mm(mdt, r * h, uh))
    return (1.0 - z) * h + z * htil, z, r, htil


def _mm(mdt, x, w):
    if mdt is not None:
        x, w = x.astype(mdt), w.astype(mdt)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core(mdt, w_a, b_all, u_zr, uh, h, a):
    return _gru_fwd_math(mdt, w_a, b_all, u_zr, uh, h, a)[0]


def _gru_core_fwd(mdt, w_a, b_all, u_zr, uh, h, a):
    out, z, r, htil = _gru_fwd_math(mdt, w_a, b_all, u_zr, uh, h, a)
    rdt = h.dtype if mdt is None else mdt
    # `a` only feeds aᵀ·dp matmuls in the backward, which cast to the
    # matmul dtype anyway — storing it narrow is lossless for them and
    # drops a [N, D] f32 residual per scan step (the 0-d witness keeps
    # the da cotangent in the primal's dtype).  `h` is stored narrow too:
    # its backward consumers are matmuls (cast anyway) and elementwise
    # terms against the already-narrow z/r/h̃ — and the narrow copy CSEs
    # with the aggregation VJP's saved h.astype(cdt), so the scan stacks
    # ONE bf16 [N, D] per step instead of bf16 + f32
    res = (w_a, u_zr, uh, h.astype(rdt), jnp.zeros((), h.dtype),
           a.astype(rdt), jnp.zeros((), a.dtype),
           z.astype(rdt), r.astype(rdt), htil.astype(rdt))
    return out, res


def _gru_core_bwd(mdt, res, g):
    w_a, u_zr, uh, h, h_wit, a, a_wit, z, r, htil = res
    h = h.astype(jnp.float32)
    z = z.astype(jnp.float32)
    r = r.astype(jnp.float32)
    htil = htil.astype(jnp.float32)
    D = h.shape[-1]
    dz = g * (htil - h)
    dh = g * (1.0 - z)
    dq = (g * z) * (1.0 - htil * htil)        # grad at the tanh preact
    drh = _mm(mdt, dq, uh.T)
    duh = _mm(mdt, (r * h).T, dq)
    dr = drh * h
    dh = dh + drh * r
    dpz = dz * z * (1.0 - z)
    dpr = dr * r * (1.0 - r)
    if mdt is not None:
        # pre-cast once: each grad row feeds two matmuls below, and the
        # concatenated-[N, 3D] form would materialize 400 MB of f32 at
        # the headline config just to slice it again
        dpz, dpr, dq = (x.astype(mdt) for x in (dpz, dpr, dq))
    da = (_mm(mdt, dpz, w_a[:, :D].T) + _mm(mdt, dpr, w_a[:, D:2 * D].T)
          + _mm(mdt, dq, w_a[:, 2 * D:].T))
    dw_a = jnp.concatenate(
        [_mm(mdt, a.T, dpz), _mm(mdt, a.T, dpr), _mm(mdt, a.T, dq)], axis=1)
    db = jnp.concatenate(
        [jnp.sum(x, axis=0, dtype=jnp.float32) for x in (dpz, dpr, dq)])
    dh = dh + _mm(mdt, dpz, u_zr[:, :D].T) + _mm(mdt, dpr, u_zr[:, D:].T)
    du_zr = jnp.concatenate([_mm(mdt, h.T, dpz), _mm(mdt, h.T, dpr)], axis=1)
    return (dw_a.astype(w_a.dtype), db.astype(w_a.dtype),
            du_zr.astype(u_zr.dtype), duh.astype(uh.dtype),
            dh.astype(h_wit.dtype), da.astype(a_wit.dtype))


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_core_pallas(mdt, w_a, b_all, u_zr, uh, h, a):
    from ggnn_tpu.ops.gru_pallas import gru_cell_fwd
    itp = jax.default_backend() != "tpu"
    return gru_cell_fwd(h, a, w_a, b_all, u_zr, uh, mdt=mdt,
                        interpret=itp)[0]


def _gru_core_pallas_fwd(mdt, w_a, b_all, u_zr, uh, h, a):
    from ggnn_tpu.ops.gru_pallas import gru_cell_fwd
    itp = jax.default_backend() != "tpu"
    out, z, r, htil = gru_cell_fwd(h, a, w_a, b_all, u_zr, uh, mdt=mdt,
                                   interpret=itp)
    # h stored narrow: see _gru_core_fwd (CSEs with the aggregation VJP's
    # saved h cast — one bf16 [N, D] stacked per scan step, not two)
    return out, (w_a, b_all, u_zr, uh, h.astype(mdt),
                 jnp.zeros((), h.dtype), a.astype(mdt),
                 jnp.zeros((), a.dtype), z, r, htil)


def _gru_core_pallas_bwd(mdt, res, g):
    from ggnn_tpu.ops.gru_pallas import gru_cell_bwd
    w_a, b_all, u_zr, uh, h, h_wit, a, a_wit, z, r, htil = res
    itp = jax.default_backend() != "tpu"
    dh, da, dwa, db, duzr, duh = gru_cell_bwd(
        g.astype(jnp.float32), h, a, z, r, htil, w_a, u_zr, uh, mdt=mdt,
        interpret=itp)
    return (dwa.astype(w_a.dtype), db.reshape(-1).astype(b_all.dtype),
            duzr.astype(u_zr.dtype), duh.astype(uh.dtype),
            dh.astype(h_wit.dtype), da.astype(a_wit.dtype))


_gru_core_pallas.defvjp(_gru_core_pallas_fwd, _gru_core_pallas_bwd)


def fuse_gru(gru: dict) -> tuple:
    """Concatenate gate weights once (outside the scan) for fused matmuls."""
    w_a = jnp.concatenate([gru["wz"], gru["wr"], gru["wh"]], axis=1)
    b_all = jnp.concatenate([gru["bz"], gru["br"], gru["bh"]], axis=0)
    u_zr = jnp.concatenate([gru["uz"], gru["ur"]], axis=1)
    return w_a, b_all, u_zr


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _typed_fused_step(meta, interpret, mdt, lean, arrs, h, msg_w, msg_b,
                      w_a, b_all, u_zr, uh):
    """Fused typed-pack aggregation + GRU step (onehot backend,
    ``cfg.fuse_gru``): the PRIMAL runs ops.scatter_pallas.typed_step_gru
    — the GRU executes in the scatter kernel's epilogue on the
    VMEM-resident aggregation, so serving skips the [N, D] a round-trip
    and the separate GRU pass (~3.6 ms/step at 262K/D=128).  The VJP's
    fwd rule recomputes the UNFUSED composition (identical math, the
    residuals the existing backwards need), so training costs exactly
    what the unfused path does."""
    from ggnn_tpu.ops.scatter_pallas import BLOCK_N, typed_step_gru
    n_nodes_pad, tile_e = meta[0], meta[1]
    n_blocks, edge_align = meta[3], meta[6]
    N, D = h.shape
    cdt = jnp.dtype(mdt) if mdt is not None else jnp.dtype(jnp.float32)
    h_pack = h.astype(cdt)[arrs["gather_idx"]]
    bias = jnp.einsum("tn,td->nd", arrs["indeg"],
                      msg_b.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    n_rows = n_blocks * BLOCK_N
    h_pad = jnp.pad(h.astype(jnp.float32), ((0, n_rows - N), (0, 0)))
    chunks = meta[8] if len(meta) > 8 else None
    span_rows = meta[9] if len(meta) > 9 else None
    bmeta = meta[10] if len(meta) > 10 else None
    blk16 = arrs.get("blk_off16") if span_rows is not None else None
    if bmeta is not None:
        # per-block kernel (round 8): static (type, chunk) inner loop —
        # see scatter_pallas._typed_block_kernel
        from ggnn_tpu.ops.scatter_pallas import typed_block_step_gru
        S8, cmax, b_span = bmeta
        out = typed_block_step_gru(
            h_pack, arrs["dstl_blk"], arrs["slot_off16"],
            arrs["blk_off16"], msg_w.astype(cdt), bias, h_pad,
            w_a.astype(cdt), b_all[None, :].astype(jnp.float32),
            u_zr.astype(cdt), uh.astype(cdt), n_blocks=n_blocks,
            tile_e=tile_e, S8=S8, cmax=cmax, span_rows=b_span,
            interpret=interpret)
        return out[:N]
    if chunks is None:
        out = typed_step_gru(
            h_pack, arrs["dstl"], arrs["tile_start"], arrs["block_of_tile"],
            arrs["tile_msg_off"], arrs["c_off"], arrs["tile_type"],
            msg_w.astype(cdt), bias, h_pad, w_a.astype(cdt),
            b_all[None, :].astype(jnp.float32), u_zr.astype(cdt),
            uh.astype(cdt), n_blocks=n_blocks, tile_e=tile_e,
            align=edge_align, blk_off16=blk16, span_rows=span_rows,
            interpret=interpret)
        return out[:N]
    # SMEM-capped chunked calls (scatter_pallas._chunk_blocks): each call
    # covers a disjoint dst-block range with its slice of the prefetch
    # arrays and of the per-node init/state rows; stream offsets stay
    # global so h_pack/dstl pass through whole
    from ggnn_tpu.ops.scatter_pallas import _typed_chunk_slices
    outs = []
    for ch in chunks:
        b0, b1 = ch[0], ch[1]
        ts, bot, tmo, coff, tty = _typed_chunk_slices(arrs, ch)
        outs.append(typed_step_gru(
            h_pack, arrs["dstl"], ts, bot, tmo, coff, tty,
            msg_w.astype(cdt), bias[b0 * BLOCK_N:b1 * BLOCK_N],
            h_pad[b0 * BLOCK_N:b1 * BLOCK_N], w_a.astype(cdt),
            b_all[None, :].astype(jnp.float32), u_zr.astype(cdt),
            uh.astype(cdt), n_blocks=b1 - b0, tile_e=tile_e,
            align=edge_align,
            blk_off16=None if blk16 is None else blk16[b0:b1],
            span_rows=span_rows, interpret=interpret))
    return jnp.concatenate(outs, axis=0)[:N]


def _typed_fused_step_fwd(meta, interpret, mdt, lean, arrs, h, msg_w,
                          msg_b, w_a, b_all, u_zr, uh):
    from ggnn_tpu.ops.scatter_pallas import _aggregate_impl
    a = _aggregate_impl(meta, interpret, arrs, h.astype(msg_w.dtype),
                        msg_w, msg_b)
    out, z, r, htil = _gru_fwd_math(mdt, w_a, b_all, u_zr, uh, h, a)
    rdt = h.dtype if mdt is None else mdt
    if lean:
        # LEAN residuals (round 8): the backward-chain's buffer LIVENESS
        # — not scan machinery — was measured as a ~16 ms/prop-step tax
        # at the 262K headline (docs/DESIGN.md "scan-context tax").
        # Save only (h, a) per step and recompute z/r/h̃ in the backward
        # (3 matmuls ≈ 0.6 ms): stacked residuals drop 335 → 134 MB/step.
        res = (arrs, h.astype(msg_w.dtype), msg_w, w_a, b_all, u_zr, uh,
               jnp.zeros((), h.dtype), a.astype(rdt),
               jnp.zeros((), a.dtype))
        return out, res
    res = (arrs, h.astype(msg_w.dtype), msg_w, w_a, u_zr, uh,
           jnp.zeros((), h.dtype), a.astype(rdt), jnp.zeros((), a.dtype),
           z.astype(rdt), r.astype(rdt), htil.astype(rdt))
    return out, res


def _typed_fused_step_bwd(meta, interpret, mdt, lean, res, g):
    from ggnn_tpu.ops.scatter_pallas import _aggregate_bwd
    if lean:
        (arrs, hc, msg_w, w_a, b_all, u_zr, uh, h_wit, a, a_wit) = res
        # recompute the gates from the narrow (h, a) — the fwd's matmuls
        # cast their inputs to mdt anyway, so this matches the saved
        # gates up to elementwise rounding
        _, z, r, htil = _gru_fwd_math(mdt, w_a, b_all, u_zr, uh,
                                      hc.astype(jnp.float32),
                                      a.astype(jnp.float32))
        rdt = hc.dtype
        z, r, htil = z.astype(rdt), r.astype(rdt), htil.astype(rdt)
    else:
        (arrs, hc, msg_w, w_a, u_zr, uh, h_wit, a, a_wit, z, r,
         htil) = res
    gres = (w_a, u_zr, uh, hc, h_wit, a, a_wit, z, r, htil)
    dwa, db3, duzr, duh, dh1, da = _gru_core_bwd(mdt, gres, g)
    d_arrs, dh2, dW, dbm = _aggregate_bwd(
        meta, interpret, (arrs, hc, msg_w), da.astype(jnp.float32))
    dh = (dh1.astype(jnp.float32) + dh2.astype(jnp.float32)
          ).astype(h_wit.dtype)
    return (d_arrs, dh, dW, dbm, dwa, db3, duzr, duh)


_typed_fused_step.defvjp(_typed_fused_step_fwd, _typed_fused_step_bwd)


def propagate(prop: dict, cfg: ModelConfig, annotations: jax.Array,
              edge_src: jax.Array, edge_dst: jax.Array, edge_type: jax.Array,
              edge_mask: jax.Array, h0: jax.Array | None = None,
              collect_states: bool = False, type_offsets: jax.Array | None = None,
              scatter_layout=None, tiles_layout: dict | None = None):
    """Run T propagation steps; returns final h [N, D] (and, if
    ``collect_states``, the stacked per-step states [T, N, D] for the
    oracle-parity tests, BASELINE.json:5)."""
    h = init_state(annotations, cfg.state_dim) if h0 is None else h0
    fused = fuse_gru(prop["gru"])
    # aggregation compute dtype (bf16 halves HBM traffic on the gather/
    # scatter-heavy path; accumulation stays f32 via preferred_element_type,
    # GRU state stays f32 — SURVEY.md §7.2.4)
    cdt = jnp.dtype(cfg.compute_dtype)
    msg_w_c = prop["msg_w"].astype(cdt)
    msg_b_c = prop["msg_b"].astype(cdt)
    # GRU matmul-input dtype: follows the aggregation compute dtype (the
    # MXU is bf16-native — f32 gate matmuls run at a fraction of peak);
    # gates/state/accumulation stay f32 either way
    gmm = cdt if (cfg.gru_matmul_compute
                  and cdt != jnp.dtype(jnp.float32)) else None

    def edge_gate(h):
        """SDDMM edge-feature gates g_uv = σ(⟨h_u·P, h_v·Q⟩)
        (BASELINE.json:5); folded into the edge mask so both backends'
        message kernels apply it for free."""
        if not cfg.edge_gates:
            return edge_mask
        from ggnn_tpu.ops.segment import sddmm
        p = jnp.dot(h, prop["gate_p"], preferred_element_type=jnp.float32)
        q = jnp.dot(h, prop["gate_q"], preferred_element_type=jnp.float32)
        return edge_mask * jax.nn.sigmoid(
            sddmm(p, q, edge_src, edge_dst, edge_mask))

    if cfg.backend == "onehot":
        # MXU one-hot scatter path (ops/scatter_pallas.py): needs the
        # host-built dst-block layout (topology-static, reused every step).
        # A list/tuple of chunk layouts selects the memory-bounded chunked
        # path (build_chunked_dst_layouts).
        from ggnn_tpu.ops.scatter_pallas import (aggregate_onehot,
                                                 aggregate_onehot_chunked,
                                                 build_dst_block_layout)
        if isinstance(scatter_layout, (list, tuple)):
            chunks = list(scatter_layout)

            def step(h, _):
                a = aggregate_onehot_chunked(h.astype(cdt), chunks, msg_w_c,
                                             msg_b_c)
                h_new = gru_update(prop["gru"], h, a, fused,
                                   matmul_dtype=gmm)
                return h_new, h_new if collect_states else None

            h_final, states = jax.lax.scan(step, h, None, length=cfg.n_steps)
            return (h_final, states) if collect_states else h_final
        if scatter_layout is None:
            if isinstance(edge_src, jax.core.Tracer):
                raise ValueError(
                    "backend='onehot' inside jit needs a precomputed layout: "
                    "build_dst_block_layout(...).to_device() outside jit and "
                    "pass it through the jitted function's arguments as "
                    "scatter_layout (closure constants overflow remote "
                    "compile payloads)")
            scatter_layout = build_dst_block_layout(
                np.asarray(edge_src), np.asarray(edge_dst),
                np.asarray(edge_type), np.asarray(edge_mask), h.shape[0])

        from ggnn_tpu.ops.scatter_pallas import DeviceScatterLayout
        if (cfg.fuse_gru
                and isinstance(scatter_layout, DeviceScatterLayout)
                and len(scatter_layout.meta) > 7
                and scatter_layout.meta[7] == "typed"):
            # fused typed step: GRU in the scatter kernel's epilogue
            # (serving); training recomputes the unfused composition in
            # the custom VJP's fwd rule — same cost as fuse_gru=False.
            # Gate matmuls run in the compute dtype on this path.
            itp = jax.default_backend() != "tpu"
            mdt_f = (jnp.dtype(cdt).name
                     if cdt != jnp.dtype(jnp.float32) else None)

            def step(h, _):
                h_new = _typed_fused_step(
                    scatter_layout.meta, itp, mdt_f, cfg.lean_residuals,
                    scatter_layout.arrays, h, msg_w_c, msg_b_c, *fused,
                    prop["gru"]["uh"])
                return h_new, h_new if collect_states else None

            if cfg.remat and not collect_states:
                step = jax.checkpoint(step)
            h_final, states = jax.lax.scan(step, h, None,
                                           length=cfg.n_steps)
            return (h_final, states) if collect_states else h_final

        if cfg.fuse_gru:
            # ADVICE r2: don't let a fuse request silently measure the
            # unfused path (e.g. the legacy table-gather layout cannot
            # fuse — only the round-4 typed pack carries the GRU epilogue)
            import warnings
            warnings.warn(
                "fuse_gru requested with backend='onehot' but the scatter "
                "layout is not a typed DeviceScatterLayout (legacy "
                "table-gather / chunked layouts cannot fuse); running the "
                "UNFUSED step. Build the layout with "
                "build_typed_dst_layout(...) to fuse.", stacklevel=2)

        def step(h, _):
            a = aggregate_onehot(h.astype(cdt), scatter_layout, msg_w_c,
                                 msg_b_c)
            h_new = gru_update(prop["gru"], h, a, fused,
                                   matmul_dtype=gmm)
            return h_new, h_new if collect_states else None
    elif cfg.backend == "window":
        # block-CSR windowed aggregation (ops/window_pallas.py): the
        # clustered-graph fast path — no per-edge random access; spilled
        # low-locality edges ride the one-hot path inside aggregate_window
        from ggnn_tpu.ops.window_pallas import (aggregate_window,
                                                gru_window_step)
        if scatter_layout is None:
            raise ValueError(
                "backend='window' needs a precomputed layout: "
                "build_window_layout(...) outside jit, passed through the "
                "jitted function's arguments as scatter_layout")

        if cfg.fuse_gru:
            # fused step: the GRU runs in the window kernel's epilogue on
            # the VMEM-resident aggregation (no [N,D] a round-trip, no
            # separate GRU pass).  TRAINABLE since round 2: under
            # differentiation the kernel also emits an (a|z|r|h̃) narrow
            # residual stream and the custom VJP reuses the fused window
            # backward + Pallas GRU backward (needs N % 128 == 0 and a
            # with_grad layout; quantized_table stays forward-only).
            def step(h, _):
                h_new = gru_window_step(h, scatter_layout, msg_w_c, msg_b_c,
                                        prop["gru"],
                                        quantized=cfg.quantized_table)
                return h_new, h_new if collect_states else None
        else:
            def step(h, _):
                a = aggregate_window(h.astype(cdt), scatter_layout, msg_w_c,
                                     msg_b_c)
                h_new = gru_update(prop["gru"], h, a, fused,
                                   matmul_dtype=gmm)
                return h_new, h_new if collect_states else None
    elif cfg.backend == "pallas":
        from ggnn_tpu.ops.spmm_pallas import (pack_type_tiles,
                                              typed_aggregate_tiled)
        if tiles_layout is not None:
            layout = tiles_layout  # prebuilt (e.g. hoisted out of the
            # GGS-NN round scan — topology is static across rounds)
        else:
            if type_offsets is None:
                counts = jax.ops.segment_sum(
                    (edge_mask > 0).astype(jnp.int32), edge_type,
                    num_segments=cfg.n_message_types)
                type_offsets = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(counts)]).astype(jnp.int32)
            # tiled layout is topology-only — build once, outside the scan
            layout = pack_type_tiles(edge_src, edge_dst, edge_type, edge_mask,
                                     type_offsets, cfg.n_message_types)

        def packed_gate(h):
            if not cfg.edge_gates:
                return None
            p = jnp.dot(h, prop["gate_p"], preferred_element_type=jnp.float32)
            q = jnp.dot(h, prop["gate_q"], preferred_element_type=jnp.float32)
            score = jnp.sum(p[layout["src"]] * q[layout["dst"]], axis=-1)
            return layout["mask"] * jax.nn.sigmoid(score)

        def step(h, _):
            a = typed_aggregate_tiled(h.astype(cdt), layout, msg_w_c, msg_b_c,
                                      mask=packed_gate(h))
            h_new = gru_update(prop["gru"], h, a, fused,
                                   matmul_dtype=gmm)
            return h_new, h_new if collect_states else None
    else:
        def step(h, _):
            a = typed_aggregate(h.astype(cdt), edge_src, edge_dst, edge_type,
                                edge_gate(h), msg_w_c, msg_b_c,
                                strategy=cfg.agg_strategy)
            h_new = gru_update(prop["gru"], h, a, fused,
                                   matmul_dtype=gmm)
            return h_new, h_new if collect_states else None

    if cfg.remat and not collect_states:
        # trade FLOPs for memory: the backward pass recomputes each step's
        # aggregation instead of keeping T× node-state activations
        step = jax.checkpoint(step)
    h_final, states = jax.lax.scan(step, h, None, length=cfg.n_steps)
    if collect_states:
        return h_final, states
    return h_final
