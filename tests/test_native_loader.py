"""Native C++ batch loader: build, decode, fallbacks, loader wiring."""

import numpy as np
import pytest

from vlm_clip_tpu.data.native_loader import (load_batch_native,
                                             native_available)
from vlm_clip_tpu.data.rafdb import BatchLoader, FolderDataset

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def jpeg_tree(tmp_path_factory):
    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS

    root = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.default_rng(0)
    for e in EMOTIONS:
        d = root / e
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (60 + 10 * i, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.jpg", quality=90)
    return root


def test_batch_decode_and_dummy(jpeg_tree):
    paths = [str(jpeg_tree / "angry" / "0.jpg"),
             str(jpeg_tree / "angry" / "1.jpg"),
             str(jpeg_tree / "nope.jpg")]
    out, ok = load_batch_native(paths, 64)
    assert out.shape == (3, 64, 64, 3) and out.dtype == np.uint8
    assert list(ok) == [True, True, False]
    assert out[2].sum() == 0  # black dummy fallback
    assert out[0].std() > 0


def test_close_to_pil(jpeg_tree):
    from vlm_clip_tpu.data.preprocess import load_and_resize

    p = str(jpeg_tree / "happy" / "2.jpg")
    nat, ok = load_batch_native([p], 48)
    assert ok[0]
    ref = load_and_resize(p, 48)
    # bilinear vs bicubic on natural-ish content: same image, small diff
    diff = np.abs(nat[0].astype(int) - ref.astype(int)).mean()
    assert diff < 30, diff


def test_batchloader_native_path(jpeg_tree):
    ds = FolderDataset(str(jpeg_tree), image_size=32)
    nat = BatchLoader(ds, batch_size=8, native=True, seed=1)
    assert nat.native
    ref = BatchLoader(ds, batch_size=8, seed=1)
    nb = list(nat)
    rb = list(ref)
    assert len(nb) == len(rb)
    assert nb[0].images.shape == rb[0].images.shape
    np.testing.assert_array_equal(nb[0].labels, rb[0].labels)
    assert nb[-1].valid.sum() == rb[-1].valid.sum()
