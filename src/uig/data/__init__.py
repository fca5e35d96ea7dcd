from uig.data.datasets import FolderDataset, SyntheticUnpairedDataset
from uig.data.pipeline import UnpairedPipeline, make_input_pipeline

__all__ = [
    "FolderDataset",
    "SyntheticUnpairedDataset",
    "UnpairedPipeline",
    "make_input_pipeline",
]
