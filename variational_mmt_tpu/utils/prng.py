"""PRNG discipline.

The reference relies on torch's global RNG; JAX requires explicit keys. The
rule here (SURVEY.md §7 "PRNG discipline under pjit"): one base key from the
config seed, folded with the step counter inside the jit'd train step, so
sampling is (a) reproducible given a seed and (b) collective-free — every
device derives the same key from the replicated step and then folds in its
own shard's batch positions only through the data it sees.
"""

from __future__ import annotations

import jax


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(key: jax.Array, step: jax.Array) -> jax.Array:
    """Per-step key; `step` may be a traced int32 inside jit."""
    return jax.random.fold_in(key, step)
