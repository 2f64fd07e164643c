from blindshadowremoval_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicate,
)
