"""Fused Pallas GRU cell vs the jnp cell (fwd + grads, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.models.ggnn import _gru_core, fuse_gru, gru_update
from ggnn_tpu.models import ModelConfig, init_params


@pytest.fixture
def setup():
    N, D = 1024, 128
    cfg = ModelConfig(state_dim=D, annotation_dim=2, n_edge_types=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    gru = params["prop"]["gru"]
    h = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    a = jax.random.normal(jax.random.PRNGKey(2), (N, D)) * 2.0
    return gru, h, a


def test_gru_pallas_forward_parity(setup):
    gru, h, a = setup
    w_a, b_all, u_zr = fuse_gru(gru)
    ref = _gru_core("bfloat16", w_a, b_all, u_zr, gru["uh"], h, a)
    # N % 512 == 0 and D % 128 == 0 → gru_update dispatches to the
    # Pallas cell when a matmul dtype is set
    got = gru_update(gru, h, a, matmul_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert float(jnp.mean(jnp.abs(got - ref))) < 2e-3


def test_gru_pallas_grad_parity(setup):
    gru, h, a = setup
    w_a, b_all, u_zr = fuse_gru(gru)

    def loss_ref(gru, h, a):
        out = _gru_core("bfloat16", *fuse_gru(gru), gru["uh"], h, a)
        return jnp.sum(out * out)

    def loss_pal(gru, h, a):
        return jnp.sum(gru_update(gru, h, a,
                                  matmul_dtype=jnp.bfloat16) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(gru, h, a)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(gru, h, a)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for pr, pp in zip(flat_r, flat_p):
        scale = np.max(np.abs(np.asarray(pr))) + 1e-6
        np.testing.assert_allclose(np.asarray(pp) / scale,
                                   np.asarray(pr) / scale,
                                   rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("n", [128, 384, 768])
def test_gru_pallas_small_blocks(setup, n):
    """N % 128 == 0 but not % 512: the kernel runs with 128/256-row
    blocks (the sharded halo train path's shard sizes) — fwd AND grad
    parity with the jnp cell."""
    gru, h, a = setup
    h, a = h[:n], a[:n]
    w_a, b_all, u_zr = fuse_gru(gru)
    ref = _gru_core("bfloat16", w_a, b_all, u_zr, gru["uh"], h, a)
    got = gru_update(gru, h, a, matmul_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss_ref(gru):
        return jnp.sum(_gru_core("bfloat16", *fuse_gru(gru), gru["uh"],
                                 h, a) ** 2)

    def loss_pal(gru):
        return jnp.sum(gru_update(gru, h, a, matmul_dtype=jnp.bfloat16) ** 2)

    flat_r, _ = jax.tree_util.tree_flatten(jax.grad(loss_ref)(gru))
    flat_p, _ = jax.tree_util.tree_flatten(jax.grad(loss_pal)(gru))
    for pr, pp in zip(flat_r, flat_p):
        scale = np.max(np.abs(np.asarray(pr))) + 1e-6
        np.testing.assert_allclose(np.asarray(pp) / scale,
                                   np.asarray(pr) / scale,
                                   rtol=5e-2, atol=5e-3)


def test_gru_unaligned_n_falls_back(setup):
    """N not a multiple of 128 uses the jnp cell — same answer."""
    gru, h, a = setup
    h, a = h[:200], a[:200]
    got = gru_update(gru, h, a, matmul_dtype=jnp.bfloat16)
    w_a, b_all, u_zr = fuse_gru(gru)
    ref = _gru_core("bfloat16", w_a, b_all, u_zr, gru["uh"], h, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gru_pallas_vs_f32_reference(setup):
    """The Pallas bf16 cell tracks the full-f32 jnp cell within bf16
    noise (sanity on the numerics of the fused formulation)."""
    gru, h, a = setup
    w_a, b_all, u_zr = fuse_gru(gru)
    ref = _gru_core(None, w_a, b_all, u_zr, gru["uh"], h, a)
    got = gru_update(gru, h, a, matmul_dtype=jnp.bfloat16)
    assert float(jnp.mean(jnp.abs(got - ref))) < 5e-3
