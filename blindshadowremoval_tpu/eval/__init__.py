from blindshadowremoval_tpu.eval.postprocess import (  # noqa: F401
    PostprocessParams,
    ucb_postprocess,
)
