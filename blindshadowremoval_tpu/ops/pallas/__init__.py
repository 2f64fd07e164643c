from blindshadowremoval_tpu.ops.pallas.nonlocal_attn import (  # noqa: F401
    fused_nonlocal_attention,
)
