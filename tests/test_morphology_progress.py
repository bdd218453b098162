"""Morphology ops and ProgressNotifier."""

import numpy as np

from bio_image_unet_tpu import progress
from bio_image_unet_tpu.data import morphology as morph


def test_disk_square():
    d = morph.disk(2)
    assert d.shape == (5, 5)
    assert d[2, 2] and d[0, 2] and not d[0, 0]
    s = morph.square(3)
    assert s.shape == (3, 3) and s.all()


def test_dilation_erosion_inverse_on_blob():
    m = np.zeros((32, 32), bool)
    m[10:20, 10:20] = True
    grown = morph.binary_dilation(m, morph.disk(2))
    assert grown.sum() > m.sum()
    shrunk = morph.binary_erosion(grown, morph.disk(2))
    # opening of a square by a disk keeps the core
    assert shrunk[12:18, 12:18].all()


def test_skeletonize_thick_line():
    m = np.zeros((20, 40), bool)
    m[8:13, 5:35] = True  # 5px-thick horizontal bar
    sk = morph.skeletonize(m)
    # skeleton is thin: every column in the interior has at most 2 pixels
    assert sk.sum() < m.sum() / 2
    interior = sk[:, 10:30]
    assert (interior.sum(axis=0) <= 2).all()
    assert interior.sum() > 0
    # skeleton lies inside the original mask
    assert not (sk & ~m).any()


def test_skeletonize_preserves_connectivity():
    m = np.zeros((30, 30), bool)
    m[5:25, 12:18] = True
    sk = morph.skeletonize(m)
    from scipy import ndimage

    _, n = ndimage.label(sk, structure=np.ones((3, 3)))
    assert n == 1


def test_progress_notifier_callbacks():
    fractions, details = [], []
    pn = progress.ProgressNotifier()
    pn.set_progress_report(lambda f: fractions.append(f))
    pn.set_progress_detail(lambda *a: details.append(a))
    out = [x * 2 for x in pn.iterator(range(4))]
    assert out == [0, 2, 4, 6]
    # first 0 is the set_progress_report validation probe
    assert fractions == [0, 0.25, 0.5, 0.75, 1.0]
    assert len(details) >= 4  # init call + one per step


def test_progress_notifier_unknown_total():
    counts = []
    pn = progress.ProgressNotifier()
    pn.set_progress_report(lambda c: counts.append(c))
    list(pn.iterator(iter(range(3))))  # generator: no len()
    assert counts == [0, 1, 2, 3]  # leading 0 = validation probe


def test_silent_and_tqdm_notifiers():
    assert list(progress.ProgressNotifier.silent_notifier().iterator([1, 2])) == [1, 2]
    assert list(progress.ProgressNotifier.progress_notifier_tqdm().iterator([1, 2])) == [1, 2]


def test_metrics():
    import numpy as np

    from bio_image_unet_tpu.utils import dice_coefficient, iou, pixel_accuracy

    a = np.zeros((8, 8)); a[:4] = 1
    b = np.zeros((8, 8)); b[2:6] = 1
    # overlap 2 rows of 8 px = 16; union 6 rows = 48
    assert abs(iou(a, b) - 16 / 48) < 1e-6
    assert abs(dice_coefficient(a, b) - 2 * 16 / 64) < 1e-6
    assert pixel_accuracy(a, a) == 1.0
    # uint8 0/255 masks binarize at threshold*255
    assert iou((a * 255).astype(np.uint8), (a * 255).astype(np.uint8)) == 1.0
