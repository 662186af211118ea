from hdenseformer_tpu.utils.profiling import (
    count_params,
    count_flops,
    Timer,
    set_process_title,
)

__all__ = ["count_params", "count_flops", "Timer", "set_process_title"]
