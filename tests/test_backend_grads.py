"""Training-gradient parity across aggregation backends (the Pallas paths
carry custom VJPs — SURVEY.md §4.2), with and without SDDMM edge gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggnn_tpu.graph import PaddingSpec, batch_graphs
from ggnn_tpu.models import ModelConfig, init_params, propagate


@pytest.fixture
def batch(rng):
    graphs = []
    for _ in range(3):
        n = int(rng.integers(4, 10))
        m = int(rng.integers(2, 2 * n))
        graphs.append(dict(
            n_nodes=n,
            edges=np.stack([rng.integers(0, n, m), rng.integers(0, 3, m),
                            rng.integers(0, n, m)], 1),
            annotations=(rng.random((n, 2)) < 0.5).astype(np.float32),
            targets={}))
    spec = PaddingSpec(3, sum(g["n_nodes"] for g in graphs) + 2,
                       2 * sum(g["edges"].shape[0] for g in graphs) + 4,
                       3, 2).round_up()
    return batch_graphs(graphs, spec)


@pytest.mark.parametrize("edge_gates", [False, True])
def test_pallas_backend_grads_match_xla(batch, edge_gates):
    b = batch
    cfg_x = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                        n_steps=3, edge_gates=edge_gates)
    cfg_p = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3,
                        n_steps=3, backend="pallas", edge_gates=edge_gates)
    params = init_params(jax.random.PRNGKey(0), cfg_x)
    args = (jnp.asarray(b.annotations), jnp.asarray(b.edge_src),
            jnp.asarray(b.edge_dst), jnp.asarray(b.edge_type),
            jnp.asarray(b.edge_mask))

    def loss(p, cfg):
        h = propagate(p["prop"], cfg, *args,
                      type_offsets=jnp.asarray(b.type_offsets))
        return jnp.sum(h ** 2)

    gx = jax.grad(lambda p: loss(p, cfg_x))(params)
    gp = jax.grad(lambda p: loss(p, cfg_p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), bb in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))
