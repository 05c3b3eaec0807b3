#!/usr/bin/env python
"""Node-transform table probes + fused-step validation on the real chip.

The table einsum measures 5.15 ms where FLOPs (0.7 ms) + bf16 write
(1.3 ms) predict ~2 ms — consistent with XLA materializing the f32 dot
output before the astype(bf16) (2.1 GB extra write + read).  Variants:

  cur    — einsum ntf → +bias → astype(bf16)            (production)
  conv1  — (h@Wc).astype(bf16) + bf16 bias (convert adjacent to dot)
  accbf  — dot with preferred_element_type=bf16 (bf16 accumulation)
  aug    — ones-augmented h, bias baked into Wc, astype directly

Then: gru_window_step (fused kernel) end-to-end step time, packed and
unpacked, vs the unfused aggregate+gru — the round-3 headline measurement.

Run ON THE TPU: python -u scripts/bench_einsum_probe.py > /tmp/eprobe.txt
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.models import ModelConfig, init_params
from ggnn_tpu.models.ggnn import fuse_gru, gru_update
from ggnn_tpu.ops import window_pallas as wp

D, W, BR, T = 128, 512, 512, 8
T2 = 2 * T


def timeit(fn, iters=6, warmup=2, tag=""):
    t0 = time.perf_counter()
    fn()
    comp = time.perf_counter() - t0
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best * 1e3:.2f} ms (compile {comp:.0f}s)", flush=True)
    return best


def diff_chain(tag, chain, *args):
    try:
        t1 = timeit(lambda: float(chain(*args, k=1)), tag=f"{tag} k=1")
        t9 = timeit(lambda: float(chain(*args, k=9)), tag=f"{tag} k=9")
    except Exception as e:
        print(f"  => {tag} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    per = (t9 - t1) / 8
    print(f"  => {tag}: {per * 1e3:.3f} ms", flush=True)
    return per


def main():
    batch = synthetic_batch(262_144, 4_000_000, T, annotation_dim=8, seed=0,
                            node_mult=128, n_communities=512, p_intra=0.95)
    N = batch.spec.n_pad
    cfg = ModelConfig(state_dim=D, annotation_dim=8, n_edge_types=T,
                      compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(1), cfg)
    prop = params["prop"]
    msg_w = prop["msg_w"].astype(jnp.bfloat16)
    msg_b = prop["msg_b"].astype(jnp.bfloat16)
    w_cat = jnp.transpose(msg_w, (1, 0, 2)).reshape(D, T2 * D)
    b_cat = msg_b.reshape(T2 * D).astype(jnp.float32)
    b_cat_bf = b_cat.astype(jnp.bfloat16)
    w_aug = jnp.concatenate([w_cat, b_cat_bf[None, :]], axis=0)  # [D+1, T2D]
    h0 = jax.random.normal(jax.random.PRNGKey(2), (N, D), dtype=jnp.float32)

    def t_cur(hb):
        t = jnp.einsum("nd,tdf->ntf", hb, msg_w,
                       preferred_element_type=jnp.float32) + msg_b[None, :, :]
        return t.reshape(-1, D).astype(jnp.bfloat16)

    def t_conv1(hb):
        t = jnp.dot(hb, w_cat,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return (t + b_cat_bf).reshape(-1, D)

    def t_accbf(hb):
        t = jnp.dot(hb, w_cat, preferred_element_type=jnp.bfloat16)
        return (t + b_cat_bf).reshape(-1, D)

    def t_aug(hb):
        ones = jnp.ones((hb.shape[0], 1), hb.dtype)
        t = jnp.dot(jnp.concatenate([hb, ones], axis=1), w_aug,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return t.reshape(-1, D)

    forms = {"cur": t_cur, "conv1": t_conv1, "accbf": t_accbf, "aug": t_aug}

    # numerics check of the cheapest forms vs cur (device-side)
    ref = t_cur(h0.astype(jnp.bfloat16))
    for name, fn in forms.items():
        d = float(jnp.max(jnp.abs(fn(h0.astype(jnp.bfloat16)).astype(
            jnp.float32) - ref.astype(jnp.float32))))
        print(f"{name}: max|diff vs cur| = {d:.3e}", flush=True)

    @functools.partial(jax.jit, static_argnames=("k", "form"))
    def echain(h, k, form):
        fn = forms[form]
        def body(i, carry):
            h, tot = carry
            tbl = fn(h.astype(jnp.bfloat16))
            s = tbl[0, 0].astype(jnp.float32)
            h = h.at[0, 0].set(h[0, 0] + 1e-30 * s)
            return h, tot + s
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for form in forms:
        diff_chain(f"table [{form}]", functools.partial(echain, form=form),
                   h0)

    # ---- fused step end-to-end --------------------------------------------
    lays = {}
    for packed in (False, True):
        lays[packed] = wp.build_window_layout(
            batch.edge_src, batch.edge_dst, batch.edge_type, batch.edge_mask,
            N, window=W, n_message_types=T2, block_rows=BR,
            pack_counts=packed)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused_chain(h, lay, k):
        def body(i, carry):
            h, tot = carry
            h = wp.gru_window_step(h, lay, msg_w, msg_b, prop["gru"],
                                   interpret=False)
            return h, tot + h[0, 0]
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    fused = fuse_gru(prop["gru"])

    @functools.partial(jax.jit, static_argnames=("k",))
    def unfused_chain(h, lay, k):
        def body(i, carry):
            h, tot = carry
            a = wp.aggregate_window(h.astype(jnp.bfloat16), lay, msg_w,
                                    msg_b, interpret=False)
            h = gru_update(prop["gru"], h, a, fused)
            return h, tot + h[0, 0]
        _, tot = jax.lax.fori_loop(0, k, body, (h, jnp.float32(0)))
        return tot

    for packed in (False, True):
        diff_chain(f"UNFUSED step packed={packed}", unfused_chain, h0,
                   lays[packed])
        diff_chain(f"FUSED step packed={packed}", fused_chain, h0,
                   lays[packed])


if __name__ == "__main__":
    main()
