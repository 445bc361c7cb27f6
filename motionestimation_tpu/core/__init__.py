from motionestimation_tpu.core.config import SearchConfig  # noqa: F401
