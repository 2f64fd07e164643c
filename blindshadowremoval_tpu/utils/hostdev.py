"""Host CPU device pinning for data-pipeline jax work.

The parse path runs concurrently with training: dispatching its small jax
ops to the default (possibly remote/tunneled TPU) device would pay a device
round trip per op and serialize against train steps, so everything jax on
the HOST half of the pipeline executes under this device.
"""

from __future__ import annotations

import jax


def host_cpu_device():
    return jax.local_devices(backend="cpu")[0]
