"""Device mesh + sharding layout.

The reference is single-process single-GPU (SURVEY.md §2.3); scaling here is
first-class data parallelism over a 1-D ``jax.sharding.Mesh`` axis ('data'):

- batches are sharded along their leading axis (each chip gets its slice,
  landing directly in its HBM via ``jax.device_put`` with a NamedSharding);
- parameters and optimizer state are replicated;
- the jit'd train step is annotated with these shardings and GSPMD inserts
  the gradient all-reduce over ICI automatically — no hand-written
  collectives needed at this model scale (~40M params, v5e-8).

At VMMT scale TP/PP/SP/EP are out of scope by design (SURVEY.md §2.3), but
the mesh helper accepts extra axes so the layout generalizes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices:
        if num_devices > len(devs):
            # silently clamping would run on fewer shards than the user's
            # batch/throughput math assumes
            raise ValueError(
                f"requested {num_devices} data shards but only "
                f"{len(devs)} devices are available"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a host batch pytree with each leaf sharded on its leading
    axis (ints/masks/features alike — all leading-dim = global batch)."""
    sh = batch_sharding(mesh, axis)
    return jax.device_put(batch, sh)

