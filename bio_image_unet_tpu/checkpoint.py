"""Self-describing single-file checkpoints (torch-free).

The reference's checkpoint is its de-facto model-config format: a single
``.pt`` dict ``{'state_dict', 'epoch', 'best_loss', **hyperparams}``
(unet/train.py:107-118,174-188) from which Predict rebuilds the network
(unet/predict.py:83-101).  This module keeps that key schema but stores
flax variables (and, unlike the reference — which saves the optimizer state
yet never restores it, unet/train.py:107,119-121 — a restorable optimizer
state) in one msgpack file:

    [8-byte magic "BIUTPU01"][4-byte header length][json header][msgpack blob]

The json header carries ``model_name``, hyperparams, epoch and best_loss so a
checkpoint can be inspected without deserializing any weights.  Torch ``.pt``
checkpoints from the reference are imported via
:func:`bio_image_unet_tpu.interop.load_torch_checkpoint`; :func:`load`
transparently dispatches on the file magic so user code can pass either.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["save", "load", "peek"]

_MAGIC = b"BIUTPU01"


def _jsonable(obj):
    """Best-effort conversion of hyperparam values to json-encodable form."""
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return repr(obj)


def save(
    path,
    variables: Dict[str, Any],
    hyperparams: Optional[Dict[str, Any]] = None,
    epoch: Optional[int] = None,
    best_loss: Optional[float] = None,
    opt_state=None,
) -> None:
    """Write a checkpoint.  ``variables`` is the flax variable dict
    ``{'params': ..., 'batch_stats': ...}``; ``opt_state`` any optax state."""
    from flax import serialization

    import jax

    payload = {"variables": jax.device_get(variables)}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(jax.device_get(opt_state))
    blob = serialization.msgpack_serialize(payload)

    header = json.dumps(
        {
            "format": 1,
            "hyperparams": _jsonable(hyperparams or {}),
            "epoch": epoch,
            "best_loss": None if best_loss is None else float(best_loss),
            "has_opt_state": opt_state is not None,
        }
    ).encode()

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<I", len(header)))
        fh.write(header)
        fh.write(blob)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def peek(path) -> Dict[str, Any]:
    """Read only the hyperparams/epoch/best_loss — no weight bytes.  Native
    checkpoints read the json header; torch ``.pt`` files go through the
    restricted unpickler in metadata-only mode (tensor records untouched)."""
    with open(path, "rb") as fh:
        magic = fh.read(8)
        if magic != _MAGIC:
            from .interop.pt_reader import read_pt_meta

            try:
                ckpt = read_pt_meta(path)
            except ValueError:
                raise
            except Exception as err:  # e.g. UnpicklingError on exotic globals
                # keep peek's documented error contract: callers fall back
                # to the full checkpoint.load (whose torch.load fallback
                # handles payloads the restricted reader refuses)
                raise ValueError(
                    f"cannot peek {path} with the restricted reader: {err}"
                ) from err
            return {
                "hyperparams": {
                    k: v for k, v in ckpt.items()
                    if k not in ("state_dict", "optimizer_state_dict")
                },
                "epoch": ckpt.get("epoch"),
                "best_loss": ckpt.get("best_loss"),
            }
        raw = fh.read(4)
        if len(raw) < 4:
            raise ValueError(f"corrupt checkpoint {path!r}: truncated header")
        (n,) = struct.unpack("<I", raw)
        try:
            return json.loads(fh.read(n))
        except ValueError as err:
            raise ValueError(f"corrupt checkpoint {path!r}: {err}") from err


def load(path, opt_state_template=None) -> Dict[str, Any]:
    """Load a checkpoint → ``{'variables', 'hyperparams', 'epoch',
    'best_loss', 'opt_state'}``.

    Dispatches on file magic: native checkpoints load torch-free; reference
    ``.pt`` files route through interop's restricted zip/pickle reader —
    also torch-free (``torch.load`` is only a fallback for exotic payloads).
    ``opt_state_template`` (an optax state with the right structure) restores
    the optimizer state into real pytrees; without it the raw state dict is
    returned.
    """
    with open(path, "rb") as fh:
        magic = fh.read(8)
    if magic != _MAGIC:
        from .interop import load_torch_checkpoint

        out = load_torch_checkpoint(path)
        out.setdefault("opt_state", None)
        return out

    from flax import serialization

    try:
        with open(path, "rb") as fh:
            fh.read(8)
            raw = fh.read(4)
            if len(raw) < 4:
                raise ValueError(
                    f"corrupt checkpoint {path!r}: truncated header")
            (n,) = struct.unpack("<I", raw)
            header = json.loads(fh.read(n))
            payload = serialization.msgpack_restore(fh.read())
        if not isinstance(payload, dict) or "variables" not in payload:
            raise ValueError(
                f"corrupt checkpoint {path!r}: missing 'variables' payload")
    except ValueError:
        raise
    except Exception as err:
        # msgpack/struct internals must not leak as TypeError etc. — a
        # corrupt file is ONE error class for callers (fuzz-tested)
        raise ValueError(f"corrupt checkpoint {path!r}: {err}") from err

    opt_state = payload.get("opt_state")
    if opt_state is not None and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template, opt_state)
    return {
        "variables": payload["variables"],
        "hyperparams": header.get("hyperparams", {}),
        "epoch": header.get("epoch"),
        "best_loss": header.get("best_loss"),
        "opt_state": opt_state,
    }
