"""Torch-free .pt reader: parity against torch.load, restricted-global
safety, and end-to-end checkpoint.load('.pt') with torch blocked."""

import builtins
import importlib.util
import io
import pickle

import numpy as np
import pytest
import torch

from bio_image_unet_tpu.interop.pt_reader import read_pt


def _ref_unet(n_filter=4):
    spec = importlib.util.spec_from_file_location(
        "ref_unet_ptr", "/root/reference/bio_image_unet/unet/unet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Unet(in_channels=1, out_channels=1, n_filter=n_filter)


def test_read_pt_matches_torch_load(tmp_path):
    net = _ref_unet()
    net.train()
    for _ in range(2):
        net(torch.rand(2, 1, 32, 32))
    path = str(tmp_path / "m.pt")
    torch.save({"state_dict": net.state_dict(), "epoch": 7, "best_loss": 0.25,
                "n_filter": 4, "clip_threshold": (0.2, 99.8),
                "loss_function": "BCEDice"}, path)

    ours = read_pt(path)
    theirs = torch.load(path, map_location="cpu", weights_only=False)
    assert ours["epoch"] == 7 and ours["best_loss"] == 0.25
    assert ours["loss_function"] == "BCEDice"
    assert tuple(ours["clip_threshold"]) == (0.2, 99.8)
    assert set(ours["state_dict"]) == set(theirs["state_dict"])
    for k, v in theirs["state_dict"].items():
        np.testing.assert_array_equal(ours["state_dict"][k], v.numpy(), err_msg=k)


def test_read_pt_dtypes_and_noncontiguous(tmp_path):
    t = torch.arange(24, dtype=torch.float64).reshape(4, 6).t()  # non-contiguous
    obj = {"f16": torch.rand(3, 3).half(), "i64": torch.arange(5),
           "u8": torch.tensor([1, 2, 255], dtype=torch.uint8),
           "b": torch.tensor([True, False]), "t": t,
           "bf16": torch.rand(2, 2).bfloat16(),
           "scalar0d": torch.tensor(3.5)}
    path = str(tmp_path / "d.pt")
    torch.save(obj, path)
    ours = read_pt(path)
    for k, v in obj.items():
        np.testing.assert_array_equal(
            np.asarray(ours[k], dtype=np.float64),
            v.to(torch.float64).numpy(), err_msg=k)


def test_read_pt_refuses_arbitrary_globals(tmp_path):
    """A malicious pickle global (os.system & co.) must be refused."""
    import os as _os
    import zipfile

    payload = pickle.dumps({"boom": _os.getcwd})  # any non-allowlisted global
    path = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
        zf.writestr("archive/version", "3")
    with pytest.raises(Exception, match="not allowed"):
        read_pt(path)


def test_malicious_pickle_never_reaches_unrestricted_torch_load(tmp_path):
    """SECURITY: a pickle the restricted reader refuses for a disallowed
    global must NOT be retried with torch.load(weights_only=False) — that
    fallback would execute exactly the code the allowlist refused (fuzz
    finding, round 4). The refusal surfaces as DisallowedGlobalError and
    the payload must not run."""
    import zipfile

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.interop.pt_reader import DisallowedGlobalError

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os as _os

            return (_os.system, (f"touch {marker}",))

    payload = pickle.dumps({"state_dict": Evil()})
    path = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
        zf.writestr("archive/version", "3")
    with pytest.raises(DisallowedGlobalError, match="not allowed"):
        checkpoint.load(path)
    assert not marker.exists(), "malicious pickle payload was EXECUTED"


def test_oob_tensor_metadata_rejected(tmp_path):
    """SECURITY: a crafted checkpoint whose tensor size/stride/offset span
    more elements than its storage holds must be rejected, not silently
    materialized — as_strided does no bounds checking, so unvalidated
    metadata reads out-of-bounds process memory."""
    import zipfile

    import torch

    class EvilTensor:
        def __init__(self, size, stride, offset=0):
            self.size, self.stride, self.offset = size, stride, offset

        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2,
                    (_StorageRef(), self.offset, self.size, self.stride,
                     False, None))

    class _StorageRef:
        pass

    class _Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _StorageRef):
                # 4-element float32 storage; the view claims far more
                return ("storage", torch.FloatStorage, "0", "cpu", 4)
            return None

    for size, stride, offset in [
        ((10**6,), (1,), 0),        # shape alone exceeds storage
        ((2, 2), (100, 1), 0),      # stride walks past the end
        ((4,), (1,), 2),            # offset + extent exceeds storage
        ((2,), (-3,), 0),           # negative stride walks below the start
        ((), (), 4),                # 0-d offset beyond storage
    ]:
        buf = io.BytesIO()
        _Pickler(buf).dump({"w": EvilTensor(size, stride, offset)})
        path = str(tmp_path / "oob.pt")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("archive/data.pkl", buf.getvalue())
            zf.writestr("archive/data/0", b"\x00" * 16)  # 4 float32s
            zf.writestr("archive/version", "3")
        with pytest.raises(ValueError, match="corrupt|bounds|beyond"):
            read_pt(path)

    # sanity: in-bounds metadata through the same writer still loads
    buf = io.BytesIO()
    _Pickler(buf).dump({"w": EvilTensor((2, 2), (2, 1), 0)})
    path = str(tmp_path / "ok.pt")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", np.arange(4, dtype=np.float32).tobytes())
        zf.writestr("archive/version", "3")
    out = read_pt(path)
    np.testing.assert_array_equal(out["w"], [[0.0, 1.0], [2.0, 3.0]])


def test_unsafe_opt_in_reachable_for_trusted_legacy_checkpoints(
        tmp_path, monkeypatch):
    """A trusted checkpoint with a benign non-allowlisted global in its
    hyperparams (e.g. argparse.Namespace saved by a training script) must
    be loadable via the explicit BIU_UNSAFE_TORCH_LOAD=1 opt-in — review
    finding: the opt-in used to be unreachable because DisallowedGlobalError
    aborted before the env check. Without the opt-in, the refusal must
    name it."""
    import argparse

    from bio_image_unet_tpu.interop import load_torch_checkpoint
    from bio_image_unet_tpu.interop.pt_reader import DisallowedGlobalError

    net = _ref_unet()
    path = str(tmp_path / "ns.pt")
    torch.save({"state_dict": net.state_dict(), "n_filter": 4,
                "args": argparse.Namespace(lr=1e-4)}, path)

    monkeypatch.delenv("BIU_UNSAFE_TORCH_LOAD", raising=False)
    with pytest.raises(DisallowedGlobalError, match="BIU_UNSAFE_TORCH_LOAD"):
        load_torch_checkpoint(path)

    monkeypatch.setenv("BIU_UNSAFE_TORCH_LOAD", "1")
    out = load_torch_checkpoint(path)
    assert out["hyperparams"]["n_filter"] == 4
    assert out["hyperparams"]["args"].lr == 1e-4


def test_corrupt_files_raise_value_error(tmp_path):
    """Corrupt containers are ONE error class (ValueError) for callers of
    checkpoint.load/peek and read_pt — zipfile/msgpack/struct internals
    must not leak (fuzz-tested: 1500 seeded truncation/flip cases)."""
    import jax
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import Unet

    v = Unet(n_filter=4).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 1)))
    good = tmp_path / "good.ckpt"
    checkpoint.save(str(good), v, {"model_name": "Unet", "n_filter": 4})
    data = good.read_bytes()

    for case in [data[:9], data[:40], data[:200],
                 data[:30] + bytes([255]) * 8 + data[38:]]:
        bad = tmp_path / "bad.ckpt"
        bad.write_bytes(case)
        for op in (checkpoint.load, checkpoint.peek):
            try:
                op(str(bad))
            except ValueError:
                pass  # the one acceptable failure type

    # corrupt torch zip: flip bytes inside a valid .pt (CRC breaks)
    net = _ref_unet()
    pt = tmp_path / "m.pt"
    torch.save({"state_dict": net.state_dict(), "n_filter": 4}, str(pt))
    raw = bytearray(pt.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    bad_pt = tmp_path / "bad.pt"
    bad_pt.write_bytes(bytes(raw))
    try:
        read_pt(str(bad_pt))
    except ValueError:
        pass
    # the high-level loader names the explicit unsafe opt-in
    from bio_image_unet_tpu.interop import load_torch_checkpoint

    try:
        load_torch_checkpoint(str(bad_pt))
    except ValueError as err:
        assert "BIU_UNSAFE_TORCH_LOAD" in str(err) or "corrupt" in str(err)


def test_checkpoint_load_pt_without_torch(tmp_path, monkeypatch):
    """checkpoint.load('.pt') end-to-end with torch uninstalled (simulated):
    the network must rebuild and run from the imported variables."""
    import jax.numpy as jnp

    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.models import get_model

    net = _ref_unet()
    net.train()
    net(torch.rand(2, 1, 32, 32))
    net.eval()
    x = torch.rand(1, 1, 32, 32)
    with torch.no_grad():
        ref = net(x)[0].numpy()
    path = str(tmp_path / "m.pt")
    torch.save({"state_dict": net.state_dict(), "epoch": 1, "best_loss": 0.5,
                "model_name": "Unet", "n_filter": 4, "in_channels": 1,
                "out_channels": 1}, path)

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch is not installed (simulated)")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    state = checkpoint.load(path)
    monkeypatch.undo()

    model = get_model("Unet", **state["hyperparams"])
    out = model.apply(state["variables"], jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
                      train=False)[0]
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=2e-4)


def test_peek_pt_is_lazy(tmp_path, monkeypatch):
    """checkpoint.peek on a .pt must read hyperparams WITHOUT touching any
    tensor record (arbitrarily large checkpoints stay cheap to inspect)."""
    from bio_image_unet_tpu import checkpoint
    from bio_image_unet_tpu.interop import pt_reader

    net = _ref_unet()
    path = str(tmp_path / "m.pt")
    torch.save({"state_dict": net.state_dict(), "epoch": 3, "best_loss": 0.5,
                "model_name": "Unet", "n_filter": 4}, path)

    def boom(self):
        raise AssertionError("peek must not read tensor records")

    monkeypatch.setattr(pt_reader._Storage, "as_array", boom)
    meta = checkpoint.peek(path)
    assert meta["epoch"] == 3 and meta["best_loss"] == 0.5
    assert meta["hyperparams"]["model_name"] == "Unet"
    assert meta["hyperparams"]["n_filter"] == 4
    assert "state_dict" not in meta["hyperparams"]
