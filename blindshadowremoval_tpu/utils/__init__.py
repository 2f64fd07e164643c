from blindshadowremoval_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from blindshadowremoval_tpu.utils.logging import TrainLogger  # noqa: F401
