from diagan_tpu.data.arrays import ArrayDataset
from diagan_tpu.data.pipeline import DeviceDataSource
from diagan_tpu.data.predefined import get_predefined_dataset
from diagan_tpu.data.sampler import (
    sample_uniform_indices,
    sample_weighted_indices,
)

__all__ = [
    "ArrayDataset",
    "DeviceDataSource",
    "get_predefined_dataset",
    "sample_uniform_indices",
    "sample_weighted_indices",
]
