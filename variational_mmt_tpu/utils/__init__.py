from variational_mmt_tpu.utils.logging import Statistics  # noqa: F401
from variational_mmt_tpu.utils.prng import step_key  # noqa: F401
