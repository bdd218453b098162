"""Each examples/ walkthrough runs end-to-end (--demo) at CI scale.

The examples are the executable equivalents of the reference's tutorial
notebooks (using_unet.ipynb / using_siam_unet.ipynb); these tests run each
one in-process with a tiny synthetic dataset so the documented recipes can
never rot.
"""

import functools
import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(monkeypatch, mod, argv, demo_kwargs=None):
    if demo_kwargs:
        monkeypatch.setattr(
            mod, "make_demo_data",
            functools.partial(mod.make_demo_data, **demo_kwargs))
    monkeypatch.setattr(sys, "argv", ["example"] + argv)
    mod.main()


def test_example_unet2d(tmp_path, monkeypatch):
    mod = _load("train_unet_2d")
    _run(monkeypatch, mod,
         ["--demo", "--workdir", str(tmp_path), "--epochs", "1",
          "--batch-size", "2", "--n-filter", "4", "--dim", "64"],
         demo_kwargs={"n": 2, "shape": (128, 128)})
    assert os.path.exists(tmp_path / "model" / "model.ckpt")
    assert os.path.exists(tmp_path / "prediction.tif")


def test_example_siam(tmp_path, monkeypatch):
    mod = _load("train_siam_unet")
    _run(monkeypatch, mod,
         ["--workdir", str(tmp_path), "--epochs", "1", "--batch-size", "2",
          "--n-filter", "4", "--dim", "64", "--aug-factor", "2"],
         demo_kwargs={"n": 2, "shape": (128, 128)})
    assert os.path.exists(tmp_path / "prediction.tif")


def test_example_unet3d(tmp_path, monkeypatch):
    mod = _load("train_unet3d")
    _run(monkeypatch, mod,
         ["--demo", "--workdir", str(tmp_path), "--epochs", "1",
          "--batch-size", "2", "--n-filter", "4", "--dim", "8", "16", "16"],
         demo_kwargs={"n": 2, "shape": (12, 32, 32)})
    assert os.path.exists(tmp_path / "prediction.tif")


def test_example_multi_output(tmp_path, monkeypatch):
    mod = _load("train_multi_output_unet")
    _run(monkeypatch, mod,
         ["--demo", "--workdir", str(tmp_path), "--epochs", "1",
          "--batch-size", "2", "--n-filter", "4", "--dim", "64"],
         demo_kwargs={"n": 2, "shape": (128, 128)})
    results = os.listdir(tmp_path / "results")
    assert results, "per-head result tifs expected"


def test_example_multi_output_3d(tmp_path, monkeypatch):
    mod = _load("train_multi_output_unet3d")
    _run(monkeypatch, mod,
         ["--demo", "--workdir", str(tmp_path), "--epochs", "1",
          "--batch-size", "2", "--n-filter", "4", "--dim", "8", "16", "16"],
         demo_kwargs={"n": 2, "shape": (12, 32, 32)})
    results = os.listdir(tmp_path / "results")
    assert results, "per-head result tifs expected"
