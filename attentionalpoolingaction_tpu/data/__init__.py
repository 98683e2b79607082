"""Data layer: dataset descriptors, TFRecord IO, preprocessing, pipelines."""

from attentionalpoolingaction_tpu.data.datasets import (
    DATASETS,
    DatasetSpec,
    get_dataset,
)

__all__ = ["DATASETS", "DatasetSpec", "get_dataset"]
