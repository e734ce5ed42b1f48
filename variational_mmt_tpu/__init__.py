"""variational_mmt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
variational multi-modal machine translation.

Re-implements, TPU-first, the capabilities of the reference
``iacercalixto/variational_mmt`` (an OpenNMT-py fork implementing Calixto,
Rios & Aziz, "Latent Variable Model for Multi-modal Translation", ACL 2019):

- Multi30k-style text pipeline: Moses-style tokenization, BPE, vocab,
  length-bucketed batching with static padded shapes (XLA-friendly).
- ResNet pool5/conv image-feature loading, index-aligned to the text data.
- Bi-GRU encoder + global-attention GRU decoder (``lax.scan`` recurrences).
- Gaussian inference network q(z|x,y,v), fixed prior (VMMT_F) or conditional
  prior p(z|x,v) (VMMT_C), reparameterized sampling, analytic KL with
  annealing, image-feature-prediction side objective — a multi-task ELBO
  inside one jit'd train step.
- Fully on-device beam search (beam-4 default) with latent-mean substitution,
  and K-sample importance-weighted ELBO evaluation.
- Data-parallel scaling via ``jax.sharding`` over a device mesh.

The reference mount was empty during the survey (see SURVEY.md §0); behavior
is built to the spec in SURVEY.md §2/§7 and BASELINE.json.
"""

__version__ = "0.1.0"

from variational_mmt_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    DecodeConfig,
)
