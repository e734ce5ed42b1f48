"""Pallas TPU kernels for the hot recurrences.

The reference leaned on cuDNN for its GRU loops (SURVEY.md §2.2); these are
the TPU-native equivalents: fused kernels where XLA's generic lowering
leaves throughput on the table. Import is lazy/gated — everything has an
XLA fallback selected by ``ModelConfig.use_pallas``.
"""

from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan, pallas_available  # noqa: F401
