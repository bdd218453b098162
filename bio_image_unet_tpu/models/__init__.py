"""The full model family (10 architectures), with a name registry used by
checkpoint self-description (reference unet/predict.py:83-101 rebuilds the
network from the name + hyperparams embedded in the checkpoint)."""

from .legacy import BabyUnet, Unet_v0
from .nested_unet import MultiOutputNestedUNet, MultiOutputNestedUNet_3Levels
from .unet2d import AttentionUnet, MultiOutputUnet, Siam_UNet, Unet, UNet2DBase
from .unet3d import MultiOutputUnet3D, UNet3D

MODEL_REGISTRY = {
    "Unet": Unet,
    "AttentionUnet": AttentionUnet,
    "Unet_v0": Unet_v0,
    "BabyUnet": BabyUnet,
    "Siam_UNet": Siam_UNet,
    "UNet3D": UNet3D,
    "MultiOutputUnet": MultiOutputUnet,
    "MultiOutputNestedUNet": MultiOutputNestedUNet,
    "MultiOutputNestedUNet_3Levels": MultiOutputNestedUNet_3Levels,
    "MultiOutputUnet3D": MultiOutputUnet3D,
}


def get_model(name, **kwargs):
    """Instantiate a model by registry name or class, dropping unknown kwargs
    (checkpoints may carry extra hyperparameters)."""
    if isinstance(name, str):
        if name not in MODEL_REGISTRY:
            raise ValueError(f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}")
        cls = MODEL_REGISTRY[name]
    else:
        cls = name
    fields = {f.name for f in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    return cls(**{k: v for k, v in kwargs.items() if k in fields})


__all__ = [
    "Unet",
    "AttentionUnet",
    "Unet_v0",
    "BabyUnet",
    "Siam_UNet",
    "UNet3D",
    "MultiOutputUnet",
    "MultiOutputNestedUNet",
    "MultiOutputNestedUNet_3Levels",
    "MultiOutputUnet3D",
    "UNet2DBase",
    "MODEL_REGISTRY",
    "get_model",
]
