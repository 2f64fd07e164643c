from blindshadowremoval_tpu.ops.image import (  # noqa: F401
    rgb_to_grayscale,
    rgb_to_yuv,
    rgb_to_hsv,
    hsv_to_rgb,
    adjust_saturation,
    image_gradients,
    psnr,
    ssim,
)
from blindshadowremoval_tpu.ops.filters import (  # noqa: F401
    gaussian_blur,
    dilate,
    disc_blur,
)
from blindshadowremoval_tpu.ops.perlin import (  # noqa: F401
    perlin,
    perlin_collection,
    brightness_mask,
    render_perlin_mask,
)
from blindshadowremoval_tpu.ops.tonecurve import (  # noqa: F401
    apply_tone_curve,
    get_ctm_ls,
    apply_ctm,
)
from blindshadowremoval_tpu.ops.ssscatter import (  # noqa: F401
    wavelength_filter,
    apply_ss_shadow_map,
)
