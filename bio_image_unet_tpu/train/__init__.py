"""Training — one generic, jit-compiled, mesh-sharded Trainer.

The reference implements five near-identical Trainers (unet/train.py,
siam_unet/train.py, unet3d/train.py, multi_output_unet/train.py,
multi_output_unet3d/train.py); here a single :class:`Trainer` covers every
feature-set (per-channel weights, siamese frame pairs, temporal-consistency
loss, multi-head configs, deep supervision, grad clipping, plateau LR
schedule, best-val checkpointing, resume, TensorBoard/CSV metrics, validation
imaging) and is parameterized by the model + head config.
"""

from .trainer import Trainer

__all__ = ["Trainer"]
