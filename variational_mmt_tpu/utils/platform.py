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
    if plat:
        import jax

        try:
            current = (jax.config.jax_platforms or "").split(",")[0]
            if current != plat.split(",")[0]:
                jax.config.update("jax_platforms", plat)
        except Exception as e:  # backends already initialized elsewhere
            print(f"warning: could not apply JAX_PLATFORMS={plat}: {e}")
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for every CLI (repeat runs skip the
    multi-minute first compile — on a remote-TPU tunnel, compile dominated
    a full Multi30k-scale training's wall clock).

    ``VMMT_COMPILE_CACHE=<dir>`` overrides the location; ``=0`` disables.
    Default: a per-user owner-only directory (shared-tmp hygiene, same
    policy as the native-code cache).
    """
    loc = os.environ.get("VMMT_COMPILE_CACHE", "")
    if loc == "0":
        return
    if not loc:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
        loc = os.path.join(base, "vmmt", "xla_cache")
    try:
        os.makedirs(loc, mode=0o700, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"warning: compile cache disabled ({e})")
