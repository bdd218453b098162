from . import augment, morphology, tiff  # noqa: F401
from .pipelines import (  # noqa: F401
    DataLoader,
    DataProcess2D,
    DataProcess3D,
    DataProcessMultiOutput,
    DataProcessMultiOutput3D,
    DataProcessSiam,
    Subset,
    clip_and_normalize,
    edit_mask,
    random_split,
    tile_starts,
)

__all__ = [
    "tiff",
    "morphology",
    "augment",
    "DataProcess2D",
    "DataProcessSiam",
    "DataProcess3D",
    "DataProcessMultiOutput",
    "DataProcessMultiOutput3D",
    "DataLoader",
    "Subset",
    "random_split",
    "clip_and_normalize",
    "edit_mask",
    "tile_starts",
]
