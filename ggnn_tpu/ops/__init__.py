"""Compute ops: typed message aggregation (the framework's SpMM).

Two interchangeable backends, validated against each other and the oracle
(SURVEY.md §4.1-2):

- :mod:`ggnn_tpu.ops.segment` — pure-XLA path (gather / einsum /
  ``segment_sum``).  Portable fallback and the jit-differentiable default.
- :mod:`ggnn_tpu.ops.spmm_pallas` — Pallas TPU kernels (typed SpMM walking
  type-sorted edge segments; SURVEY.md §2.4).
"""

from ggnn_tpu.ops.segment import typed_aggregate, sddmm, segment_softmax  # noqa: F401
