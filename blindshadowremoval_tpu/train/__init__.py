from blindshadowremoval_tpu.train.losses import (  # noqa: F401
    l1_loss,
    l1_loss_yuv,
    l1_loss_hsv,
    l2_loss,
    l2_loss_yuv,
    hinge_loss,
    style_content_loss,
    style_content_loss_pair,
    multi_scale_gradient_loss,
)
