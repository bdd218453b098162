from .torch_ckpt import (
    load_torch_checkpoint,
    torch_key_to_flax,
    torch_state_dict_to_variables,
)
from .torch_export import export_torch_checkpoint, variables_to_torch_state_dict

__all__ = [
    "torch_state_dict_to_variables",
    "torch_key_to_flax",
    "load_torch_checkpoint",
    "export_torch_checkpoint",
    "variables_to_torch_state_dict",
]
