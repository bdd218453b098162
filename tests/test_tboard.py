"""The dependency-free TensorBoard writer must produce files the REAL
TensorBoard reader accepts (scalars + images, CRC-checked TFRecords)."""

import numpy as np
import pytest

from bio_image_unet_tpu.utils.tboard import SummaryWriter, _masked_crc, encode_png_gray

pytestmark = pytest.mark.quick


def test_masked_crc_known_vector():
    # crc32c("123456789") = 0xE3069283; TFRecord masking formula on top
    crc = 0xE3069283
    expected = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"123456789") == expected


def test_png_roundtrip():
    from PIL import Image
    import io

    img = (np.arange(32 * 48) % 251).astype(np.uint8).reshape(32, 48)
    png = encode_png_gray(img)
    back = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(back, img)


def test_tensorboard_reads_our_events(tmp_path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    w = SummaryWriter(log_dir=str(tmp_path))
    for step, v in enumerate([1.0, 0.5, 0.25]):
        w.add_scalar("Loss/train", v, step)
        w.add_scalar("Loss/val", v * 2, step)
    w.add_image("val/mask", np.random.default_rng(0).random((1, 16, 16)), 2)
    w.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"Loss/train", "Loss/val"}
    vals = [e.value for e in acc.Scalars("Loss/train")]
    assert vals == pytest.approx([1.0, 0.5, 0.25])
    steps = [e.step for e in acc.Scalars("Loss/val")]
    assert steps == [0, 1, 2]
    assert "val/mask" in acc.Tags()["images"]
    img_events = acc.Images("val/mask")
    assert img_events[0].width == 16 and img_events[0].height == 16


def test_varint_negative_step(tmp_path):
    """Negative steps (legal in torch's SummaryWriter) must encode as 64-bit
    two's-complement varints, not hang."""
    from bio_image_unet_tpu.utils.tboard import SummaryWriter, _varint

    assert len(_varint(-1)) == 10  # protobuf 10-byte negative varint
    w = SummaryWriter(log_dir=str(tmp_path))
    w.add_scalar("loss", 0.5, -1)
    w.flush()
