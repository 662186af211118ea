from hdenseformer_tpu.ops.resize import (
    resize_nearest,
    resize_linear,
    upsample_linear,
    max_pool,
)

__all__ = [
    "resize_nearest",
    "resize_linear",
    "upsample_linear",
    "max_pool",
]
