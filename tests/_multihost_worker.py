"""Worker process for tests/test_multihost.py.

Each of the 2 processes owns 2 virtual CPU devices; together they form a
4-device global mesh.  The worker initializes jax.distributed through
parallel/distributed.py, assembles its host-local shard of a global batch,
runs ONE full GAN train step under the global mesh, and prints the losses —
the parent asserts finiteness and exact cross-host agreement.

Usage: python _multihost_worker.py <coordinator_addr> <num_procs> <pid>
"""

import json
import os
import sys

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin registers eagerly and wins over JAX_PLATFORMS env; the
# explicit config update (before any backend exists) is the reliable recipe
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from blindshadowremoval_tpu.parallel import distributed  # noqa: E402

distributed.initialize(addr, nproc, pid)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

from blindshadowremoval_tpu.config import get_config  # noqa: E402
from blindshadowremoval_tpu.train.trainer import Trainer  # noqa: E402

mesh = distributed.global_mesh((2 * nproc, 1), ("data", "frame"))

S = 16
GLOBAL_VIEWS = 4            # 2 sample groups x 2 mirrored views
cfg = get_config("train", img_size=S, batch_size=GLOBAL_VIEWS // 2,
                 compute_dtype="float32")
trainer = Trainer(cfg)
state = trainer.init_state(jax.random.PRNGKey(0))

local, offset = distributed.host_local_batch(GLOBAL_VIEWS)
assert local == GLOBAL_VIEWS // nproc and offset == pid * local

rng = np.random.default_rng(0)


def mk(shape, lo=0.0, hi=1.0):
    full = rng.uniform(lo, hi, size=(GLOBAL_VIEWS,) + shape).astype(np.float32)
    return distributed.make_global_array(
        full[offset:offset + local], mesh, P(("data", "frame")))


batch = {
    "img_dark": mk((S, S, 3)),
    "gt": mk((S, S, 3)),
    "mask": mk((S, S, 1)),
    "uv": mk((S, S, 3)),
    "reg": mk((S, S, 6), -0.02, 0.02),
    "face": mk((S, S, 1)),
}
state = jax.device_put(state, NamedSharding(mesh, P()))

with mesh:
    new_state, losses, _ = trainer.train_step(
        state, batch, jax.random.PRNGKey(1), train=True)
    out = {name: float(v) for name, v in losses.items()}

assert int(jax.device_get(new_state.step)) == 1
print("LOSSES " + json.dumps(out, sort_keys=True), flush=True)
