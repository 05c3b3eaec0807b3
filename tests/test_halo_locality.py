"""Halo-plan locality: community-structured graphs shrink the deduplicated
exchange (validates the targeted all-to-all design vs all_gather —
SURVEY.md §5.7) and still propagate correctly."""

import numpy as np

from ggnn_tpu.data.synthetic import synthetic_batch
from ggnn_tpu.models import ModelConfig, init_params, propagate
from ggnn_tpu.parallel import make_mesh, partition_batch, sharded_propagate


def test_clustered_halo_is_smaller():
    P, n_nodes, n_edges = 8, 4096, 32768
    uni = synthetic_batch(n_nodes, n_edges, 4, annotation_dim=2, seed=0,
                          node_mult=P * 8)
    clu = synthetic_batch(n_nodes, n_edges, 4, annotation_dim=2, seed=0,
                          node_mult=P * 8, n_communities=P, p_intra=0.95)
    h_uni = partition_batch(uni, P).halo_size
    h_clu = partition_batch(clu, P).halo_size
    # uniform: nearly every remote node is halo; clustered: only the ~5%
    # cross-community edges contribute
    assert h_clu < 0.5 * h_uni, (h_clu, h_uni)


def test_clustered_sharded_propagation_correct():
    P = 4
    b = synthetic_batch(512, 4096, 3, annotation_dim=2, seed=1,
                        node_mult=P * 8, n_communities=P, p_intra=0.9)
    cfg = ModelConfig(state_dim=8, annotation_dim=2, n_edge_types=3, n_steps=3)
    params = init_params(__import__("jax").random.PRNGKey(0), cfg)
    ref = np.asarray(propagate(
        params["prop"], cfg, b.annotations, b.edge_src, b.edge_dst,
        b.edge_type, b.edge_mask))
    mesh = make_mesh(n_graph=P)
    parts = partition_batch(b, P)
    got = np.asarray(sharded_propagate(params["prop"], cfg, mesh, parts,
                                       strategy="halo_overlap"))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-6)
