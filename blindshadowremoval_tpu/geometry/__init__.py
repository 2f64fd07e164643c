from blindshadowremoval_tpu.geometry.warp import (  # noqa: F401
    batch_map_coordinates,
    batch_map_offsets,
)
from blindshadowremoval_tpu.geometry.landmarks import (  # noqa: F401
    ANCHOR_POINTS,
    LM_MIRROR_PERM,
    LM_REF,
    UV_TABLE,
)
from blindshadowremoval_tpu.geometry.triangulation import (  # noqa: F401
    Triangulation,
    rasterize_linear,
    generate_offset_map,
    generate_uv_map,
    generate_face_region,
)
