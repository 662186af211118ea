from hdenseformer_tpu.data.io import hdf5_reader, save_as_hdf5
from hdenseformer_tpu.data.pipeline import (
    SegDataset,
    BatchLoader,
    get_cross_validation_by_sample,
)

__all__ = [
    "hdf5_reader",
    "save_as_hdf5",
    "SegDataset",
    "BatchLoader",
    "get_cross_validation_by_sample",
]
