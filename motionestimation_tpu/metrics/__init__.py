from motionestimation_tpu.metrics.cost import (  # noqa: F401
    block_reduce,
    mse_from_ssd,
    ssim_from_sums,
    SSIM_C1,
    SSIM_C2,
    SSIM_C3,
)
