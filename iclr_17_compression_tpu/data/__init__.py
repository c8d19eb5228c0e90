from .datasets import (
    ImageFolderDataset,
    KodakDataset,
    StereoPairDataset,
    StereoKittiDataset,
    batch_iterator,
)

__all__ = [
    "ImageFolderDataset",
    "KodakDataset",
    "StereoPairDataset",
    "StereoKittiDataset",
    "batch_iterator",
]
