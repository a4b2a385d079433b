"""Host data layer: indexed record files, collation, masks, datasets."""

from speech_editing_tpu.data.collate import (batch_by_size, collate_1d,
                                             collate_1d_or_2d, collate_2d)
from speech_editing_tpu.data.datasets import (BaseDataset, BaseSpeechDataset,
                                              DataLoader, EditingDataset)
from speech_editing_tpu.data.indexed_dataset import (IndexedDataset,
                                                     IndexedDatasetBuilder)
from speech_editing_tpu.data.masks import (generate_alignment_aware_time_mask,
                                           generate_inference_mask,
                                           generate_time_mask)

__all__ = [
    "batch_by_size", "collate_1d", "collate_1d_or_2d", "collate_2d",
    "BaseDataset", "BaseSpeechDataset", "DataLoader", "EditingDataset",
    "IndexedDataset", "IndexedDatasetBuilder",
    "generate_alignment_aware_time_mask", "generate_inference_mask",
    "generate_time_mask",
]
