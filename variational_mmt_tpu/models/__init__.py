from variational_mmt_tpu.models.model import VMMTModel, build_model  # noqa: F401
