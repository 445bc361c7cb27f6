from motionestimation_tpu.parallel.mesh import make_mesh  # noqa: F401
from motionestimation_tpu.parallel.sharded import (  # noqa: F401
    sharded_full_search,
    sharded_gop_pipelined,
    sharded_motion_step,
)
