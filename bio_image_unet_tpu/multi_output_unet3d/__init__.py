"""Multi-output 3D U-Net facade — drop-in surface of
``bio_image_unet.multi_output_unet3d`` (reference
multi_output_unet3d/__init__.py:6-10)."""

from ..data.pipelines import DataProcessMultiOutput3D as DataProcess
from ..losses import (
    BCEDiceLoss,
    BCEDiceTemporalLoss,
    BCELoss,
    SoftDiceLoss,
    TemporalConsistencyLoss,
    TverskyLoss,
    logcoshDiceLoss,
    logcoshTverskyLoss,
)
from ..models import MultiOutputUnet3D
from ..predict import PredictMultiOutput3D as Predict
from ..train.trainer import Trainer as _GenericTrainer


class Trainer(_GenericTrainer):
    """multi_output_unet3d.Trainer defaults (reference
    multi_output_unet3d/train.py:57-60): MultiOutputUnet3D with per-head
    configs (incl. 'BCEDiceTemporalLoss'), ``output_heads`` positional second
    arg, grad-clip 1.0, plateau patience 5 / factor 0.2 (train.py:118).
    ``loss_function``/``loss_params``/``time_loss_weight`` are accepted in
    the reference's positional slots; like the reference (which stores
    ``time_loss_weight`` and builds ``criterion_time`` but never applies
    them, train.py:79,116), per-head losses from ``output_heads`` govern."""

    def __init__(self, dataset, output_heads, num_epochs,
                 network="MultiOutputUnet3D", use_interpolation=False,
                 batch_size=4, lr=1e-3, in_channels=1, n_filter=64, dilation=1,
                 val_split=0.2, save_dir="./", save_name="model.ckpt",
                 save_iter=False, load_weights=False, loss_function="BCEDice",
                 loss_params=(0.5, 0.5), time_loss_weight=None, device="auto",
                 **kwargs):
        del loss_function, loss_params, time_loss_weight  # reference dead knobs
        super().__init__(
            dataset, num_epochs, network=network,
            use_interpolation=use_interpolation, batch_size=batch_size, lr=lr,
            in_channels=in_channels, output_heads=output_heads,
            n_filter=n_filter, dilation=dilation, val_split=val_split,
            save_dir=save_dir, save_name=save_name, save_iter=save_iter,
            load_weights=load_weights, grad_clip=1.0,
            scheduler_patience=5, scheduler_factor=0.2, **kwargs,
        )


__all__ = [
    "DataProcess", "Trainer", "Predict", "MultiOutputUnet3D", "BCEDiceLoss",
    "BCELoss", "SoftDiceLoss", "TverskyLoss", "logcoshDiceLoss",
    "logcoshTverskyLoss", "TemporalConsistencyLoss", "BCEDiceTemporalLoss",
]
