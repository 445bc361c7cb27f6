from motionestimation_tpu.kernels.full_search_pallas import (  # noqa: F401
    full_search_frame_pallas,
)
