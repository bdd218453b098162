"""bio-image-unet-tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
biological microscopy image segmentation.

Capability-matching rebuild of danihae/bio-image-unet (reference layout:
``bio_image_unet/{unet,siam_unet,unet3d,multi_output_unet,multi_output_unet3d}``),
re-designed as one horizontal stack:

- :mod:`~bio_image_unet_tpu.parallel`  — device mesh & sharding runtime
- :mod:`~bio_image_unet_tpu.ops`       — conv/norm/act building blocks (XLA + Pallas)
- :mod:`~bio_image_unet_tpu.models`    — the full U-Net model family
- :mod:`~bio_image_unet_tpu.losses`    — the complete loss zoo
- :mod:`~bio_image_unet_tpu.data`      — TIFF I/O, DataProcess pipelines, augmentation
- :mod:`~bio_image_unet_tpu.train`     — the generic Trainer
- :mod:`~bio_image_unet_tpu.predict`   — tiled/stitched batched inference
- :mod:`~bio_image_unet_tpu.checkpoint`— self-describing checkpoints
- :mod:`~bio_image_unet_tpu.interop`   — torch .pt checkpoint import

For drop-in familiarity the reference's vertical subpackages are provided as
facades over the horizontal stack: ``bio_image_unet_tpu.unet``,
``.siam_unet``, ``.unet3d``, ``.multi_output_unet``, ``.multi_output_unet3d``
each export ``DataProcess``, ``Trainer``, ``Predict`` and the model classes
(reference: bio_image_unet/unet/__init__.py:6-11 and siblings).
"""

__version__ = "0.1.0"

from . import checkpoint, losses, progress  # noqa: F401

__all__ = [
    "progress",
    "losses",
    "checkpoint",
    "__version__",
]
