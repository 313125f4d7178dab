"""Device mesh construction for multi-stream serving and detector training.

The reference is a single-process pipeline with no distributed backend
(SURVEY.md §2 "Parallelism strategies" / "Distributed comm backend" — both
absent).  The TPU-native parallel axes of this domain are:

  * "stream" — independent video streams, one tracker bank per shard
    (the data parallelism of serving; BASELINE configs[4]: 8 concurrent
    1080p streams on a v5e-8).
  * "batch"  — detector data parallelism for training (grads psum over
    ICI).

Multi-host: call jax.distributed.initialize() before building the mesh and
the same code spans hosts — collectives ride ICI intra-pod, DCN across
pods; there is no custom transport layer to configure (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stream_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the "stream" axis (serving)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("stream",))


def batch_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the "batch" axis (detector training DP)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("batch",))


def shard_leading(mesh: Mesh, axis: str):
    """NamedSharding that splits an array's leading dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
