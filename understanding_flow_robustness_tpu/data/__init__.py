"""Data pipelines: datasets, augmentors, transforms, loaders."""

from .augmentor import ColorJitter, FlowAugmentor, SparseFlowAugmentor
from .datasets import (
    HD1K,
    KITTI,
    ConcatFlowDataset,
    FlowDataset,
    FlyingChairs,
    FlyingThings3D,
    MpiSintel,
    fetch_dataset,
)
from .loader import DataLoader, pad_batch
from .sequence_folders import SequenceFolder, crawl_folders
from .transforms import (
    Compose,
    Normalize,
    RandomCrop,
    RandomHorizontalFlip,
    RandomScaleCrop,
    Scale,
    ToFloat,
    ToFloat01,
    imresize,
)
from .validation import (
    KittiPairDataset,
    ValidationSet,
    ValidationSetPair,
    ValidationFlowKitti2012,
    ValidationFlowKitti2015,
    ValidationFlowKitti2015MV,
    ValidationSintel,
    get_evaluation_set,
)

__all__ = [
    "ColorJitter", "Compose", "ConcatFlowDataset", "DataLoader",
    "FlowAugmentor", "FlowDataset", "FlyingChairs", "FlyingThings3D",
    "HD1K", "KITTI", "KittiPairDataset", "MpiSintel", "Normalize",
    "RandomCrop", "RandomHorizontalFlip", "RandomScaleCrop", "Scale",
    "SequenceFolder", "SparseFlowAugmentor", "ToFloat", "ToFloat01",
    "ValidationFlowKitti2012", "ValidationFlowKitti2015",
    "ValidationFlowKitti2015MV",
    "ValidationSet", "ValidationSetPair", "ValidationSintel",
    "crawl_folders", "fetch_dataset",
    "get_evaluation_set", "imresize", "pad_batch",
]
