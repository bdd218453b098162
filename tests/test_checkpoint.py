"""Native checkpoint save/load/peek round-trip, including optimizer state
restore (which the reference saves but never restores — unet/train.py:107,119)
and transparent dispatch to torch .pt import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from bio_image_unet_tpu import checkpoint
from bio_image_unet_tpu.models import Unet


@pytest.fixture(scope="module")
def small_model():
    model = Unet(n_filter=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    return model, variables


def test_roundtrip(tmp_path, small_model):
    model, variables = small_model
    hp = {"model_name": "Unet", "n_filter": 4, "lr": 1e-4, "dim": (32, 32)}
    path = str(tmp_path / "model.ckpt")

    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])

    checkpoint.save(path, variables, hp, epoch=7, best_loss=0.123, opt_state=opt_state)

    meta = checkpoint.peek(path)
    assert meta["epoch"] == 7
    assert meta["best_loss"] == pytest.approx(0.123)
    assert meta["hyperparams"]["n_filter"] == 4
    assert meta["has_opt_state"]

    out = checkpoint.load(path, opt_state_template=tx.init(variables["params"]))
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(out["variables"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out["epoch"] == 7
    # optimizer state restored with correct structure
    restored = out["opt_state"]
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(opt_state)


def test_load_dispatches_torch(tmp_path):
    import torch

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_baby", "/root/reference/bio_image_unet/unet/baby_unet.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    net = mod.BabyUnet(n_filter=4)
    path = str(tmp_path / "model.pt")
    torch.save({"state_dict": net.state_dict(), "epoch": 1, "best_loss": 0.9,
                "n_filter": 4}, path)
    out = checkpoint.load(path)
    assert out["hyperparams"]["n_filter"] == 4
    assert "params" in out["variables"]


def test_bad_magic(tmp_path):
    p = tmp_path / "x.ckpt"
    p.write_bytes(b"NOTACKPT" + b"\x00" * 16)
    with pytest.raises(Exception):
        checkpoint.load(str(p))
