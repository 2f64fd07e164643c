"""blindshadowremoval_tpu — a TPU-native framework for blind facial foreign-shadow removal.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
andrewhou1/BlindShadowRemoval (BMVC 2022, "Blind Removal of Facial Foreign
Shadows"): landmark-driven face alignment, on-device synthetic shadow
augmentation, a two-stage GSC (grayscale shadow consistency) + RGB generator
trained adversarially against multi-scale discriminators, temporal sharing
(TSM) across video frames expressed as mesh-axis collectives, and the full
evaluation stack (UCB PSNR/SSIM with heuristic post-processing, SFW ROC-AUC,
in-the-wild inference).

Design stance (vs. the TF2 reference):
  * all stochastic augmentation is driven by explicit `jax.random` keys and
    runs jitted on device (reference: numpy RNG + tf.cond on host/GPU,
    utils.py:438-1055);
  * geometry maps (UV / offset / face-region) are barycentric rasterizations
    with host-side Delaunay topology and device-side interpolation
    (reference: matplotlib CPU triangulation per image, warp.py:194-232);
  * cross-view/temporal sharing (TSM) is a max/mean reduction over a named
    `frame` mesh axis so video clips shard across chips
    (reference: in-core reshape+reduce, model_with_TSM.py:199-229);
  * training is data-parallel over a `jax.sharding.Mesh` with XLA-inserted
    collectives (reference: single GPU, batch 1).
"""

__version__ = "0.1.0"

from blindshadowremoval_tpu.config import Config, get_config  # noqa: F401
