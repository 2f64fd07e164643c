"""Device-mesh construction and sharding helpers.

The reference is single-GPU with no distribution layer (SURVEY.md §2c);
here parallelism is expressed entirely through `jax.sharding`:

  * axis "data"  — data parallelism: batch groups sharded across chips,
    gradient all-reduce inserted by XLA over ICI;
  * axis "frame" — frame/view parallelism: the TSM frame axis sharded across
    chips, ShareLayer's max/mean becoming `pmax`/`pmean` collectives
    (the reference's in-core reduce, model_with_TSM.py:218-225).

No custom transport: XLA compiles the collectives onto ICI within a slice
and DCN across slices.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = None,
              axis_names: Sequence[str] = ("data", "frame")) -> Mesh:
    """Build a Mesh over all local devices.

    Default: all devices on the "data" axis, "frame" unsharded.
    """
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, *, frame_axis: bool = False) -> NamedSharding:
    """Sharding for [B, ...] batches: B split over data (and optionally the
    flattened frame groups over frame)."""
    if frame_axis:
        return NamedSharding(mesh, P(("data", "frame")))
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
