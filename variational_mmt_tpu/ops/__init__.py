from variational_mmt_tpu.ops.beam import beam_search, greedy_search  # noqa: F401
