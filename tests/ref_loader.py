"""Load reference PyTorch model files standalone (they only need torch),
bypassing the reference package __init__ which pulls in unavailable deps
(tifffile/albumentations).  Used to generate golden outputs for parity tests."""

import importlib.util
import sys
from pathlib import Path

REF_ROOT = Path("/root/reference/bio_image_unet")


def load_ref_module(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, REF_ROOT / relpath)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def torch_state_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
