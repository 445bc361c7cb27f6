from motionestimation_tpu.pipeline.runner import (  # noqa: F401
    PairResult,
    run_pair,
    run_gop,
)
