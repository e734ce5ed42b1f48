from variational_mmt_tpu.evals.bleu import corpus_bleu  # noqa: F401
from variational_mmt_tpu.evals.meteor import meteor_score  # noqa: F401
