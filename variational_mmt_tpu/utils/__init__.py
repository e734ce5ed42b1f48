"""Lazy re-exports (PEP 562): ``utils.platform.honor_env_platform`` is
imported by jax-free CLIs (preprocess) BEFORE jax loads — an eager
``from .prng import step_key`` here would pull jax into every importer
and turn platform.py's needs_jax=False guard into dead code."""

_EXPORTS = {
    "Statistics": "variational_mmt_tpu.utils.logging",
    "step_key": "variational_mmt_tpu.utils.prng",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
