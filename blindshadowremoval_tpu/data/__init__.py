from blindshadowremoval_tpu.data.synthesis import (  # noqa: F401
    compose_shadow_image,
    shadow_synthesis_host,
    ShadowMaker,
)
