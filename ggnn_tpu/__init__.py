"""ggnn_tpu — a TPU-native Gated Graph (Sequence) Neural Network framework.

A from-scratch JAX/XLA/Pallas implementation of the GGNN/GGS-NN model family
(Li, Tarlow, Brockschmidt, Zemel, "Gated Graph Sequence Neural Networks",
ICLR 2016) with the capabilities of the reference repo ``crismolav/ggnn``
(see SURVEY.md; the reference mount was empty at build time, so parity is
certified against the in-repo NumPy oracle per SURVEY.md §0.2).

Layering (SURVEY.md §1.3):

- :mod:`ggnn_tpu.graph`      — static-shape padded graph batch containers
- :mod:`ggnn_tpu.data`       — bAbI parser, task generators, batching
- :mod:`ggnn_tpu.oracle`     — dependency-free NumPy oracle (parity target)
- :mod:`ggnn_tpu.ops`        — typed message aggregation: XLA path + Pallas kernels
- :mod:`ggnn_tpu.models`     — GGNN cell, readout heads, GGS-NN
- :mod:`ggnn_tpu.train`      — configs, jitted train/eval steps, checkpoints, metrics
- :mod:`ggnn_tpu.parallel`   — mesh, edge partitioning, halo exchange
"""

__version__ = "0.1.0"

from ggnn_tpu.graph import GraphBatch, PaddingSpec  # noqa: F401
