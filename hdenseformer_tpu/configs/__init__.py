from hdenseformer_tpu.configs.config import (
    ExperimentConfig,
    DATASET_PRESETS,
    get_config,
)

__all__ = ["ExperimentConfig", "DATASET_PRESETS", "get_config"]
