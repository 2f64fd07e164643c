from blindshadowremoval_tpu.models.blocks import (  # noqa: F401
    ConvBlock,
    ConvTBlock,
    NonLocalBlock,
    ResBottleneck,
)
from blindshadowremoval_tpu.models.generator import GSCGenerator  # noqa: F401
from blindshadowremoval_tpu.models.generator_tsm import (  # noqa: F401
    ShareLayer,
    TSMGenerator,
)
from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator  # noqa: F401
from blindshadowremoval_tpu.models.discriminator import (  # noqa: F401
    Discriminator,
    MultiScaleDiscriminators,
)
from blindshadowremoval_tpu.models.vgg import VGG19Features  # noqa: F401
from blindshadowremoval_tpu.models.fan import FAN  # noqa: F401
