from hdenseformer_tpu.ops.resize import (
    avg_pool,
    global_avg_pool,
    max_pool,
    resize_linear,
    resize_linear_align_corners,
    resize_nearest,
    upsample_linear,
    upsample_linear_align_corners,
)

__all__ = [
    "avg_pool",
    "global_avg_pool",
    "max_pool",
    "resize_linear",
    "resize_linear_align_corners",
    "resize_nearest",
    "upsample_linear",
    "upsample_linear_align_corners",
]
