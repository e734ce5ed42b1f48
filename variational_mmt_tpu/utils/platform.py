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
    import sys

    loc = os.environ.get("VMMT_COMPILE_CACHE", "")
    if loc == "0":
        return
    if ("jax" not in sys.modules and not loc
            and not os.environ.get("JAX_PLATFORMS")):
        # jax-free CLIs (preprocess) must stay jax-free: don't pay the
        # import (or create cache dirs) unless explicitly asked
        return
    if not loc:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # respect JAX's own configuration
        base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
        loc = os.path.join(base, "vmmt", "xla_cache")
    try:
        import jax

        if (os.environ.get("VMMT_COMPILE_CACHE", "") == ""
                and jax.config.jax_compilation_cache_dir):
            return  # already configured (user code or JAX env var)
        os.makedirs(loc, mode=0o700, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"warning: compile cache disabled ({e})")
