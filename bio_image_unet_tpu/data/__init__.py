from . import morphology, tiff  # noqa: F401

__all__ = ["tiff", "morphology"]
