"""Data pipeline: preset banks, on-device dataset synthesis, streaming
datasets with host-side prefetch.

Replaces the reference's VST datagen worker pools and tar/FLAC streaming
(reference: scripts/data/vst_datagen*.py, st_ito/dataset/). The renderer is
the native chain executor, so dataset synthesis runs as batched XLA programs
on the accelerator instead of serial C++ plugin calls in forked processes.
"""

from st_ito_tpu.data.presets import PresetBank, sample_preset_bank
from st_ito_tpu.data.datagen import generate_pretext_dataset, generate_style_dataset
from st_ito_tpu.data.datasets import (
    NpzShardDataset,
    StyleShardDataset,
    prefetch_batches,
)

__all__ = [
    "PresetBank",
    "sample_preset_bank",
    "generate_pretext_dataset",
    "generate_style_dataset",
    "NpzShardDataset",
    "StyleShardDataset",
    "prefetch_batches",
]
