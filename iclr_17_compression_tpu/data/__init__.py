from .datasets import (
    ImageFolderDataset,
    KodakDataset,
    StereoPairDataset,
    StereoKittiDataset,
    StereoHoloPixDataset,
    FIFEnhanceDataset,
    StereoPassrDataset,
    StereoPlusDataset,
    batch_iterator,
    floor_to_multiple,
)

__all__ = [
    "ImageFolderDataset",
    "KodakDataset",
    "StereoPairDataset",
    "StereoKittiDataset",
    "StereoHoloPixDataset",
    "FIFEnhanceDataset",
    "StereoPassrDataset",
    "StereoPlusDataset",
    "batch_iterator",
    "floor_to_multiple",
]
