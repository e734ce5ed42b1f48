"""Online serving: dynamic batching over the compiled decode path.

Beyond the reference's batch-file CLI (SURVEY.md §3.3) — the deployment
surface a production user needs: ``TranslationService`` (queue + worker
dynamic batcher, static device shapes) and ``ServingServer`` (stdlib HTTP
front end).
"""

from variational_mmt_tpu.serve.errors import ClientError
from variational_mmt_tpu.serve.http_server import MPServingServer, ServingServer
from variational_mmt_tpu.serve.service import ServeConfig, TranslationService

__all__ = ["ClientError", "MPServingServer", "ServeConfig", "ServingServer",
           "TranslationService"]
