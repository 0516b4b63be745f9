"""Data layer: manifest datasets, datamodules, loaders, preprocessing."""

from tdanet_tpu.datas.datasets import (
    Loader,
    SeparationDataset,
    normalize_wav,
    pad_to_lattice,
)
from tdanet_tpu.datas.modules import (
    Libri2MixDataModule,
    LibriCSSDataModule,
    LibriCSSDataset,
    LRS2DataModule,
    WhamDataModule,
    WSJ0DataModule,
)
from tdanet_tpu.datas.preprocess import (
    preprocess_dataset,
    preprocess_one_dir,
)

__all__ = [
    "Loader", "SeparationDataset", "normalize_wav", "pad_to_lattice",
    "Libri2MixDataModule", "LibriCSSDataModule", "LibriCSSDataset",
    "LRS2DataModule", "WhamDataModule", "WSJ0DataModule",
    "preprocess_dataset", "preprocess_one_dir",
]
