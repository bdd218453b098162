"""Inference — batched tiled prediction with overlap-aware stitching.

One generic engine covers the reference's five Predict classes:

- :class:`Predict`              ≙ unet/predict.py:14-229  (nanmean stitch)
- :class:`PredictSiam`          ≙ siam_unet/predict.py:15-240 (streaming movie)
- :class:`Predict3D`            ≙ unet3d/predict.py:12-195 (3D grid)
- :class:`PredictMultiOutput`   ≙ multi_output_unet/predict.py:13-285
                                  (margin-weight stitch, batched, fp16)
- :class:`PredictMultiOutput3D` ≙ multi_output_unet3d/predict.py:13-307
                                  (linear blend-margin stitch)

TPU-native redesign: patches are predicted in fixed-shape device batches
(the reference predicts one patch at a time at batch 1 —
unet/predict.py:184-202), and all stitch accumulation is vectorized
scatter-add into (result, weight) planes instead of NaN stacks.
"""

from .sharded import (
    predict_frames_spatial_sharded,
    predict_volume_spatial_sharded,
)
from .predictor import (
    Predict,
    Predict3D,
    PredictMultiOutput,
    PredictMultiOutput3D,
    PredictSiam,
)
from .tiling import (
    grid_starts,
    overlap_starts,
    stitch_blend3d,
    stitch_margin,
    stitch_mean,
)

__all__ = [
    "Predict",
    "predict_frames_spatial_sharded",
    "predict_volume_spatial_sharded",
    "PredictSiam",
    "Predict3D",
    "PredictMultiOutput",
    "PredictMultiOutput3D",
    "grid_starts",
    "overlap_starts",
    "stitch_mean",
    "stitch_margin",
    "stitch_blend3d",
]
