"""Platform selection helper.

Some platform plugins (e.g. the axon remote-TPU client) force-set
``jax_platforms`` at import time, silently overriding the user's
``JAX_PLATFORMS`` environment variable. Every CLI calls
:func:`honor_env_platform` first so ``JAX_PLATFORMS=cpu python
train_mm_vi_model1.py ...`` behaves as any JAX user expects.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        current = (jax.config.jax_platforms or "").split(",")[0]
        if current != plat.split(",")[0]:
            jax.config.update("jax_platforms", plat)
    except Exception as e:  # backends already initialized elsewhere
        print(f"warning: could not apply JAX_PLATFORMS={plat}: {e}")
