"""TPU-native block-matching motion estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
souravBhat/MotionEstimation (C/pthread/CUDA): full-search and diamond-search
block matching over raw YUV luma frames with MSE(SSD) and SSIM costs,
motion-compensated reconstruction, PSNR/residual scoring, a benchmark
harness with version-over-version regression checks, and SPMD scaling over
TPU device meshes via halo-exchange collectives.

Layering (bottom to top), mirroring the reference's layer map (SURVEY.md §1):

    core.geometry    block-grid / search-window math    [ref: prediction_frame.c, main.c:67-76]
    core.frames      YUV I/O, PSNR, frame ops           [ref: utils.c]
    metrics          SSD/MSE + SSIM cost definitions    [ref: main.c:18-36, ssim.c]
    search           full-search & diamond-search       [ref: main.c:39-82, ssim.c:83-108]
    kernels          Pallas TPU kernels (fused cost volume + argmin)
    parallel         mesh / shard_map halo-exchange spatial parallelism
    pipeline         end-to-end frame-pair runner with timing splits
    bench            regression harness                 [ref: src/gpu/run.sh:66-96]
"""

__version__ = "0.1.0"

from motionestimation_tpu.core.config import SearchConfig  # noqa: F401
