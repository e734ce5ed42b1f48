"""Online serving: dynamic batching over the compiled decode path.

Beyond the reference's batch-file CLI (SURVEY.md §3.3) — the deployment
surface a production user needs: ``TranslationService`` (queue + worker
dynamic batcher, static device shapes) and ``ServingServer`` (stdlib HTTP
front end).

Lazy re-exports (PEP 562): the multi-process front end spawns dispatcher
children whose target module ``serve.frontend`` must stay jax-free (its
documented invariant) — an eager ``from .service import ...`` here would
drag jax + the model stack into every dispatcher via this package
__init__.
"""

_EXPORTS = {
    "ClientError": "variational_mmt_tpu.serve.errors",
    "MPServingServer": "variational_mmt_tpu.serve.http_server",
    "ServingServer": "variational_mmt_tpu.serve.http_server",
    "ServeConfig": "variational_mmt_tpu.serve.service",
    "TranslationService": "variational_mmt_tpu.serve.service",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
