"""Fused GRU cell kernels (forward + backward) for the node-state update.

The GGNN recurrence spends SURVEY.md §2.3's GRU update on [N, D] node
states.  XLA's lowering of the straightforward jnp cell measured 7.1 ms
fwd+bwd at 262K nodes / D=128 against ~2.5 ms of fundamental HBM traffic:
it materializes the [N, 3D] f32 pre-activation projections and loses
fusion across the custom-VJP boundary.  These kernels run the whole cell
in one pass per 512-row block — three MXU dots and the gate elementwise
chain on VMEM-resident blocks — and emit the minimal residuals (z, r, h̃
in the compute dtype).  The backward accumulates the parameter gradients
(dW_a, db, dU_zr, dU_h) in VMEM f32 scratch across the sequential TPU
grid and flushes them once.

Replaces (TPU-natively) the reference family's `Propogator` gate math
(SURVEY.md §2.1 C6); parity-tested against the jnp cell and the NumPy
oracle in tests/test_gru_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # preferred rows per grid program; smaller N uses 256/128


def pick_block(n: int) -> int:
    """Largest supported block dividing N (512 amortizes the weight loads
    best; 128 is the MXU minimum).  Returns 0 when N is not 128-aligned —
    callers then fall back to the jnp cell."""
    for b in (512, 256, 128):
        if n % b == 0:
            return b
    return 0


def _fwd_kernel(h_ref, a_ref, wa_ref, ball_ref, uzr_ref, uh_ref,
                out_ref, z_ref, r_ref, ht_ref, *, mdt):
    D = h_ref.shape[-1]
    h = h_ref[...]
    a = a_ref[...]

    def mm(x, w):
        return jnp.dot(x.astype(mdt), w[...],
                       preferred_element_type=jnp.float32)

    pa = mm(a, wa_ref) + ball_ref[...]
    ph = mm(h, uzr_ref)
    z = jax.nn.sigmoid(pa[:, :D] + ph[:, :D])
    r = jax.nn.sigmoid(pa[:, D:2 * D] + ph[:, D:])
    htil = jnp.tanh(pa[:, 2 * D:] + mm(r * h, uh_ref))
    out_ref[...] = ((1.0 - z) * h + z * htil).astype(out_ref.dtype)
    z_ref[...] = z.astype(z_ref.dtype)
    r_ref[...] = r.astype(r_ref.dtype)
    ht_ref[...] = htil.astype(ht_ref.dtype)


def _bwd_kernel(g_ref, h_ref, a_ref, z_ref, r_ref, ht_ref, wat_ref,
                uzrt_ref, uht_ref, dh_ref, da_ref, dwa_ref, db_ref,
                duzr_ref, duh_ref, *, mdt):
    i = pl.program_id(0)
    D = h_ref.shape[-1]
    g = g_ref[...]
    h = h_ref[...].astype(jnp.float32)  # residuals may arrive narrow
    z = z_ref[...].astype(jnp.float32)
    r = r_ref[...].astype(jnp.float32)
    htil = ht_ref[...].astype(jnp.float32)

    def mm(x, w):
        return jnp.dot(x.astype(mdt), w,
                       preferred_element_type=jnp.float32)

    def mtm(x, y):
        # xᵀ·y param-grad contraction over the block rows
        return jax.lax.dot_general(
            x.astype(mdt), y.astype(mdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dz = g * (htil - h)
    dh = g * (1.0 - z)
    dq = (g * z) * (1.0 - htil * htil)
    rh = r * h
    drh = mm(dq, uht_ref[...])
    dh = dh + drh * r
    dpz = dz * z * (1.0 - z)
    dpr = (drh * h) * r * (1.0 - r)
    da = (mm(dpz, wat_ref[:D, :]) + mm(dpr, wat_ref[D:2 * D, :])
          + mm(dq, wat_ref[2 * D:, :]))
    dh = dh + mm(dpz, uzrt_ref[:D, :]) + mm(dpr, uzrt_ref[D:, :])
    dh_ref[...] = dh.astype(dh_ref.dtype)
    da_ref[...] = da.astype(da_ref.dtype)

    # parameter grads accumulate in the revisited (constant-index-map)
    # output blocks — VMEM-resident across the sequential grid, flushed
    # once at the end
    a = a_ref[...]

    @pl.when(i == 0)
    def _():
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        duzr_ref[...] = jnp.zeros_like(duzr_ref)
        duh_ref[...] = jnp.zeros_like(duh_ref)

    dwa_ref[:, :D] += mtm(a, dpz)
    dwa_ref[:, D:2 * D] += mtm(a, dpr)
    dwa_ref[:, 2 * D:] += mtm(a, dq)
    db_ref[:, :D] += jnp.sum(dpz, axis=0, keepdims=True,
                             dtype=jnp.float32)
    db_ref[:, D:2 * D] += jnp.sum(dpr, axis=0, keepdims=True,
                                  dtype=jnp.float32)
    db_ref[:, 2 * D:] += jnp.sum(dq, axis=0, keepdims=True,
                                 dtype=jnp.float32)
    duzr_ref[:, :D] += mtm(h, dpz)
    duzr_ref[:, D:] += mtm(h, dpr)
    duh_ref[...] += mtm(rh, dq)


@functools.partial(jax.jit, static_argnames=("mdt", "interpret"))
def gru_cell_fwd(h, a, w_a, b_all, u_zr, uh, mdt: str = "bfloat16",
                 interpret: bool = False):
    """One fused pass: returns (h_new f32, z, r, h̃) with the residual
    gates in ``mdt``.  N must be a multiple of 128 (block size picked by
    :func:`pick_block`); D a multiple of 128."""
    N, D = h.shape
    block = pick_block(N)
    if not block:
        raise ValueError(f"gru_cell_fwd needs N % 128 == 0, got {N}")
    n_blocks = N // block
    rdt = jnp.dtype(mdt)
    row = lambda cols: pl.BlockSpec((block, cols), lambda i: (i, 0))
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, mdt=rdt),
        grid=(n_blocks,),
        in_specs=[row(D), row(D), full(D, 3 * D), full(1, 3 * D),
                  full(D, 2 * D), full(D, D)],
        out_specs=[row(D), row(D), row(D), row(D)],
        out_shape=[jax.ShapeDtypeStruct((N, D), h.dtype),
                   jax.ShapeDtypeStruct((N, D), rdt),
                   jax.ShapeDtypeStruct((N, D), rdt),
                   jax.ShapeDtypeStruct((N, D), rdt)],
        interpret=interpret,
    )(h, a, w_a.astype(rdt), b_all.reshape(1, -1).astype(jnp.float32),
      u_zr.astype(rdt), uh.astype(rdt))


@functools.partial(jax.jit,
                   static_argnames=("mdt", "interpret", "da_dtype"))
def gru_cell_bwd(g, h, a, z, r, htil, w_a, u_zr, uh,
                 mdt: str = "bfloat16", interpret: bool = False,
                 da_dtype: str = "float32"):
    """Fused backward: returns (dh, da, dW_a, db, dU_zr, dU_h); parameter
    grads accumulate in VMEM f32 across the sequential grid.

    ``da_dtype``: emit the aggregation cotangent narrow (bf16) when its
    consumers are the bf16 window/spill backward kernels — saves the
    f32 write + the downstream cast passes over [N, D] (the fused-step
    VJP passes the compute dtype; db then accumulates f32 from bf16 da
    rows, consistent with the overall bf16-compute policy)."""
    N, D = h.shape
    block = pick_block(N)
    if not block:
        raise ValueError(f"gru_cell_bwd needs N % 128 == 0, got {N}")
    n_blocks = N // block
    rdt = jnp.dtype(mdt)
    row = lambda cols: pl.BlockSpec((block, cols), lambda i: (i, 0))
    full = lambda rr, c: pl.BlockSpec((rr, c), lambda i: (0, 0))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, mdt=rdt),
        grid=(n_blocks,),
        in_specs=[row(D), row(D), row(D), row(D), row(D), row(D),
                  full(3 * D, D), full(2 * D, D), full(D, D)],
        out_specs=[row(D), row(D), full(D, 3 * D), full(1, 3 * D),
                   full(D, 2 * D), full(D, D)],
        out_shape=[jax.ShapeDtypeStruct((N, D), jnp.float32),
                   jax.ShapeDtypeStruct((N, D), jnp.dtype(da_dtype)),
                   jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 2 * D), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32)],
        interpret=interpret,
    )(g, h, a, z, r, htil,
      w_a.T.astype(rdt), u_zr.T.astype(rdt), uh.T.astype(rdt))
    return outs
