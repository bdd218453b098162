"""Import PyTorch reference checkpoints into flax variables.

The reference saves single-file ``.pt`` dicts ``{'state_dict', 'epoch',
'best_loss', **hyperparams}`` (unet/train.py:107-118,174-188) and its Predict
classes rebuild the network from the embedded hyperparams
(unet/predict.py:83-101).  This module converts those checkpoints so users
can migrate trained models, and so parity tests can verify that our models
reproduce PyTorch outputs bit-for-bit on identical weights.

Key-mapping rules (torch → flax path, with layout transposes):

====================================  =========================================
torch key                             flax path
====================================  =========================================
``<block>.0.weight``  (Conv)          ``params/<block>/conv/kernel``  OIHW→HWIO
``<block>.0.bias``                    ``params/<block>/conv/bias``
``<block>.1.weight``  (BatchNorm)     ``params/<block>/bn/scale``
``<block>.1.bias``                    ``params/<block>/bn/bias``
``<block>.1.running_mean``            ``batch_stats/<block>/bn/mean``
``<block>.1.running_var``             ``batch_stats/<block>/bn/var``
``up<k>.weight``      (ConvT)         ``params/up<k>/kernel``  (in,out,*k)→(*k,out,in)
``final.0.weight`` / ``final.weight`` ``params/final/kernel``
``attention<k>.W_gate.0.*``           ``params/attention<k>/W_gate_conv/*``
``attention<k>.W_gate.1.*``           ``params/attention<k>/W_gate_bn/*`` (+stats)
``conv<i>_<j>.conv1.weight`` (VGG)    ``params/grid_conv<i>_<j>/conv1/kernel``
``conv<i>_<j>.bn1.*``                 ``.../bn1/*``
``output_layers.<name>.weight``       ``params/output_layers_<name>/kernel``
``conv_concat.0.weight`` (Siam)       ``params/conv_concat/conv/kernel``
====================================  =========================================
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _conv_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *spatial) → flax (*spatial, I, O)."""
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight (I, O, *spatial) → our (*spatial, O, I)
    (consumed by lax.conv_transpose(transpose_kernel=True))."""
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


_ATTENTION_SUB = re.compile(r"^(attention\d+)\.(W_gate|W_x|psi)\.(\d)\.(.+)$")
_VGG_SUB = re.compile(r"^(conv\d+_\d+)\.(conv|bn)(\d)\.(.+)$")
_HEAD_SUB = re.compile(r"^output_layers\.([^.]+)\.(weight|bias)$")
_SEQ_SUB = re.compile(r"^(.+)\.(\d)\.(.+)$")
_UP_SUB = re.compile(r"^(up\d+)\.(weight|bias)$")
# only `final` maps as a plain conv; decode9 is NOT here — the reference's
# Unet_v0 builds it as a conv+BN Sequential (unet_v0.py:50-63), so its keys
# arrive as decode9.0.*/.1.* and route through the generic Sequential mapping
_PLAIN_CONV_SUB = re.compile(r"^(final)\.(weight|bias)$")


def torch_key_to_flax(key: str, value: np.ndarray) -> Optional[Tuple[Tuple[str, ...], np.ndarray]]:
    """Map one torch state_dict entry to (flax path tuple, transformed array).
    Returns None for entries with no flax counterpart (num_batches_tracked)."""
    if key.endswith("num_batches_tracked"):
        return None

    m = _ATTENTION_SUB.match(key)
    if m:
        block, sub, idx, leaf = m.groups()
        layer = f"{sub}_conv" if idx == "0" else f"{sub}_bn"
        return _map_layer((block, layer), idx == "0", leaf, value)

    m = _VGG_SUB.match(key)
    if m:
        block, kind, num, leaf = m.groups()
        layer = f"{kind}{num}"
        return _map_layer((f"grid_{block}", layer), kind == "conv", leaf, value)

    m = _HEAD_SUB.match(key)
    if m:
        name, leaf = m.groups()
        if leaf == "weight":
            return ("params", f"output_layers_{name}", "kernel"), _conv_kernel_to_hwio(value)
        return ("params", f"output_layers_{name}", "bias"), value

    m = _UP_SUB.match(key)
    if m:
        block, leaf = m.groups()
        if leaf == "weight":
            return ("params", block, "kernel"), _convt_kernel(value)
        return ("params", block, "bias"), value

    m = _PLAIN_CONV_SUB.match(key)
    if m:
        block, leaf = m.groups()
        if leaf == "weight":
            return ("params", block, "kernel"), _conv_kernel_to_hwio(value)
        return ("params", block, "bias"), value

    m = _SEQ_SUB.match(key)
    if m:
        block, idx, leaf = m.groups()
        if block == "final":  # final.0.weight — Sequential around the 1×1 conv
            if leaf == "weight":
                return ("params", "final", "kernel"), _conv_kernel_to_hwio(value)
            return ("params", "final", "bias"), value
        layer = "conv" if idx == "0" else "bn"
        return _map_layer((block, layer), idx == "0", leaf, value)

    raise ValueError(f"unrecognized torch checkpoint key: {key}")


def _map_layer(path: Tuple[str, ...], is_conv: bool, leaf: str, value: np.ndarray):
    if is_conv:
        if leaf == "weight":
            return ("params", *path, "kernel"), _conv_kernel_to_hwio(value)
        if leaf == "bias":
            return ("params", *path, "bias"), value
    else:  # batch norm
        if leaf == "weight":
            return ("params", *path, "scale"), value
        if leaf == "bias":
            return ("params", *path, "bias"), value
        if leaf == "running_mean":
            return ("batch_stats", *path, "mean"), value
        if leaf == "running_var":
            return ("batch_stats", *path, "var"), value
    raise ValueError(f"unrecognized leaf '{leaf}' at {path}")


def torch_state_dict_to_variables(state_dict: Dict[str, np.ndarray]) -> dict:
    """Convert a full torch state_dict into flax variables
    ``{'params': ..., 'batch_stats': ...}`` (nested dicts)."""
    from flax.traverse_util import unflatten_dict

    flat = {}
    for key, value in state_dict.items():
        value = np.asarray(value, dtype=np.float32)
        mapped = torch_key_to_flax(key, value)
        if mapped is None:
            continue
        path, arr = mapped
        flat[path] = arr
    return unflatten_dict(flat)


def load_torch_checkpoint(path) -> dict:
    """Load a reference ``.pt`` checkpoint: returns
    ``{'variables': {...}, 'hyperparams': {...}, 'epoch', 'best_loss'}``.

    Torch-free by default (the restricted zip/pickle reader in
    :mod:`.pt_reader` — SURVEY.md §7.4); falls back to ``torch.load`` only
    for exotic payloads the restricted reader refuses (then a CPU torch
    build is sufficient)."""
    try:
        from .pt_reader import read_pt

        ckpt = read_pt(path)
        state_dict = {k: np.asarray(v) for k, v in ckpt["state_dict"].items()}
    except Exception as torch_free_err:
        from .pt_reader import DisallowedGlobalError

        try:
            import torch
        except ImportError:
            raise torch_free_err from None
        try:
            # torch's own safe unpickler next — it executes NO pickled
            # code, so it is safe to try even after a DisallowedGlobalError
            # (e.g. a benign argparse.Namespace in the hyperparams that our
            # allowlist refuses)
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as safe_err:
            import os as _os

            if _os.environ.get("BIU_UNSAFE_TORCH_LOAD", "").strip().lower() \
                    in ("1", "true", "yes", "on"):
                # explicit opt-in for trusted files only: this executes
                # pickled code (the classic torch.load hazard)
                ckpt = torch.load(path, map_location="cpu",
                                  weights_only=False)
            elif isinstance(torch_free_err, DisallowedGlobalError):
                # a SECURITY refusal by BOTH safe readers — never silently
                # fall back to an unrestricted unpickler, which would
                # execute exactly the pickled code they refused
                raise DisallowedGlobalError(
                    f"{torch_free_err} — torch.load(weights_only=True) "
                    f"also refused it ({safe_err}). Set "
                    "BIU_UNSAFE_TORCH_LOAD=1 ONLY if you fully trust this "
                    "file: the unrestricted legacy loader executes pickled "
                    "code.") from torch_free_err
            else:
                raise ValueError(
                    f"cannot read {path!r} as a torch checkpoint: the "
                    f"torch-free restricted reader failed "
                    f"({torch_free_err}) and torch.load(weights_only=True) "
                    f"also failed ({safe_err}). If you trust this file, "
                    "set BIU_UNSAFE_TORCH_LOAD=1 to allow the unrestricted "
                    "legacy loader (it executes pickled code)."
                ) from safe_err
        if not isinstance(ckpt, dict) or "state_dict" not in ckpt:
            raise ValueError(
                f"{path!r} is not a reference checkpoint dict "
                "(missing 'state_dict')")
        state_dict = {k: v.detach().cpu().numpy() for k, v in ckpt["state_dict"].items()}
    hyperparams = {
        k: v for k, v in ckpt.items() if k not in ("state_dict", "optimizer_state_dict")
    }
    return {
        "variables": torch_state_dict_to_variables(state_dict),
        "hyperparams": hyperparams,
        "epoch": ckpt.get("epoch"),
        "best_loss": ckpt.get("best_loss"),
    }
