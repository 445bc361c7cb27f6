from motionestimation_tpu.kernels.full_search_pallas import (  # noqa: F401
    full_search_frame_pallas,
)
from motionestimation_tpu.kernels.ssim_pallas import (  # noqa: F401
    ssim_search_frame_pallas,
)
