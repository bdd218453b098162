"""Export flax variables back to reference-compatible torch ``.pt``
checkpoints — the inverse of :mod:`.torch_ckpt`, so models trained with this
framework can be loaded by the PyTorch reference (migration in both
directions; the forward import is verified bit-compatible in
tests/test_model_parity.py).

Layout inverses:
- conv kernel  (*spatial, I, O) → (O, I, *spatial)
- conv-transpose kernel (*spatial, O, I) → (I, O, *spatial)
- BatchNorm scale/bias/mean/var → <block>.1.{weight,bias,running_mean,
  running_var} + a zero ``num_batches_tracked``
- ``final`` is a Sequential in the 2D family (``final.0.*``,
  unet/unet.py:50-52) but a bare Conv3d in UNet3D (``final.*``,
  unet3d/unet3d.py:50).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _kernel_to_torch(arr: np.ndarray) -> np.ndarray:
    """(*spatial, I, O) → (O, I, *spatial)."""
    nsp = arr.ndim - 2
    return np.transpose(arr, (nsp + 1, nsp) + tuple(range(nsp)))


def _convt_kernel_to_torch(arr: np.ndarray) -> np.ndarray:
    """(*spatial, O, I) → (I, O, *spatial)."""
    nsp = arr.ndim - 2
    return np.transpose(arr, (nsp + 1, nsp) + tuple(range(nsp)))


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def variables_to_torch_state_dict(variables: dict, final_sequential: bool = True
                                  ) -> Dict[str, np.ndarray]:
    """Convert flax ``{'params', 'batch_stats'}`` into a torch-style
    state_dict of numpy arrays (reference key schema)."""
    params = _flatten(variables.get("params", {}))
    stats = _flatten(variables.get("batch_stats", {}))
    sd: Dict[str, np.ndarray] = {}

    def seq_block(block: str) -> str:
        """Our structured block name → the reference's Sequential prefix."""
        if block.startswith("grid_"):  # UNet++ grid VGG blocks keep names
            return block[len("grid_"):]
        return block

    for path, arr in params.items():
        block = path[0]
        if block.startswith("output_layers_"):
            name = block[len("output_layers_"):]
            leaf = "weight" if path[-1] == "kernel" else "bias"
            sd[f"output_layers.{name}.{leaf}"] = (
                _kernel_to_torch(arr) if leaf == "weight" else arr
            )
        elif block.startswith("up") and len(path) == 2 and path[-1] in ("kernel", "bias"):
            # Bare ConvTranspose blocks only (path == (block, leaf)).  The
            # interpolation variants' ``up*_conv`` are ConvBlocks
            # (multi_output_unet3d.py:68-70 → Sequential ``up1_conv.0.*``/
            # ``.1.*``) and must fall through to the generic conv/bn mapping.
            leaf = "weight" if path[-1] == "kernel" else "bias"
            sd[f"{block}.{leaf}"] = (
                _convt_kernel_to_torch(arr) if leaf == "weight" else arr
            )
        elif block == "final":
            # NB: Unet_v0's decode9 must NOT take this branch — it is a full
            # conv+BN block (reference unet_v0.py:50-63), handled by the
            # generic conv/bn mapping below (decode9.0.* / decode9.1.*)
            leaf = "weight" if path[-1] == "kernel" else "bias"
            prefix = f"{block}.0" if final_sequential else block
            sd[f"{prefix}.{leaf}"] = _kernel_to_torch(arr) if leaf == "weight" else arr
        elif len(path) >= 3 and path[1] in ("conv", "bn"):
            base = seq_block(block)
            idx = "0" if path[1] == "conv" else "1"
            if path[1] == "conv":
                leaf = "weight" if path[-1] == "kernel" else "bias"
                sd[f"{base}.{idx}.{leaf}"] = (
                    _kernel_to_torch(arr) if leaf == "weight" else arr
                )
            else:
                leaf = "weight" if path[-1] == "scale" else "bias"
                sd[f"{base}.{idx}.{leaf}"] = arr
        elif len(path) >= 3 and (path[1].startswith("conv") or path[1].startswith("bn")):
            # VGG grid blocks: grid_conv<i>_<j>/conv1/kernel → conv<i>_<j>.conv1.*
            base = seq_block(block)
            sub = path[1]
            if sub.startswith("conv"):
                leaf = "weight" if path[-1] == "kernel" else "bias"
                sd[f"{base}.{sub}.{leaf}"] = (
                    _kernel_to_torch(arr) if leaf == "weight" else arr
                )
            else:
                leaf = "weight" if path[-1] == "scale" else "bias"
                sd[f"{base}.{sub}.{leaf}"] = arr
        elif len(path) >= 3 and path[1] in ("W_gate_conv", "W_gate_bn", "W_x_conv",
                                            "W_x_bn", "psi_conv", "psi_bn"):
            sub, kind = path[1].rsplit("_", 1)
            idx = "0" if kind == "conv" else "1"
            if kind == "conv":
                leaf = "weight" if path[-1] == "kernel" else "bias"
                sd[f"{block}.{sub}.{idx}.{leaf}"] = (
                    _kernel_to_torch(arr) if leaf == "weight" else arr
                )
            else:
                leaf = "weight" if path[-1] == "scale" else "bias"
                sd[f"{block}.{sub}.{idx}.{leaf}"] = arr
        else:
            raise ValueError(f"unmapped flax param path: {'/'.join(path)}")

    for path, arr in stats.items():
        block = path[0]
        if len(path) >= 3 and path[1] == "bn":
            base = f"{seq_block(block)}.1"
        elif len(path) >= 3 and path[1].startswith("bn"):
            base = f"{seq_block(block)}.{path[1]}"
        elif len(path) >= 3 and path[1].endswith("_bn"):
            sub = path[1][: -len("_bn")]
            base = f"{block}.{sub}.1"
        else:
            raise ValueError(f"unmapped flax batch_stats path: {'/'.join(path)}")
        leaf = "running_mean" if path[-1] == "mean" else "running_var"
        sd[f"{base}.{leaf}"] = arr
        sd.setdefault(f"{base}.num_batches_tracked", np.array(0, dtype=np.int64))

    return sd


def export_torch_checkpoint(path, variables: dict, hyperparams: dict = None,
                            epoch=None, best_loss=None,
                            final_sequential: bool = True) -> None:
    """Write a reference-loadable ``.pt`` (requires the baked-in CPU torch)."""
    import torch

    sd = variables_to_torch_state_dict(variables, final_sequential)
    ckpt = {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim else torch.tensor(v)
            for k, v in sd.items()}
    out = {"state_dict": ckpt, "epoch": epoch, "best_loss": best_loss}
    out.update(hyperparams or {})
    torch.save(out, path)
