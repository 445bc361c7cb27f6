from motionestimation_tpu.search.full_search import (  # noqa: F401
    MotionField,
    full_search_frame,
    full_search_tile,
    compensate_tile,
    compensate_frame,
    make_ref_halo,
)
