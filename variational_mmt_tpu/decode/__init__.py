from variational_mmt_tpu.decode.translator import Translator, make_translate_fn  # noqa: F401
from variational_mmt_tpu.decode.iw_eval import make_iw_elbo_fn  # noqa: F401
from variational_mmt_tpu.decode.diagnostics import latent_stats_corpus  # noqa: F401
