from hdenseformer_tpu.infer.sliding import (
    cal_steps,
    get_gaussian,
    inference_slidingwindow,
    predict_volume,
)

__all__ = ["cal_steps", "get_gaussian", "inference_slidingwindow", "predict_volume"]
