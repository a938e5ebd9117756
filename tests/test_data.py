"""Input pipeline: ImageFolder decode, sharding, prefetch double-buffering.

Reference: utils/imagenet_dataloaders.py (transforms + ImageFolder layout);
prefetch is the TPU-side counterpart of torch DataLoader worker prefetch.
"""

import os

import numpy as np
import pytest

from fp8_quantization_tpu.data.imagenet import (
    ImageFolderDataset, SyntheticImageNet, make_dataloaders, prefetch_iter)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """Tiny ImageFolder tree: 3 classes x 8 synthetic JPEGs."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for c in range(3):
        d = root / f"class_{c}"
        d.mkdir()
        for i in range(8):
            arr = (rng.rand(48 + 4 * c, 56, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.jpg")
    return str(root)


def test_val_loader_shapes_and_determinism(image_tree):
    ds = ImageFolderDataset(image_tree, image_size=32, batch_size=5)
    batches = list(ds)
    assert sum(len(y) for _, y in batches) == 24
    x0, y0 = batches[0]
    assert x0.shape == (5, 32, 32, 3) and x0.dtype == np.float32
    # val order is deterministic across epochs
    again = list(ds)
    np.testing.assert_array_equal(batches[0][0], again[0][0])
    np.testing.assert_array_equal(batches[0][1], again[0][1])


def test_prefetch_matches_unprefetched(image_tree):
    a = list(ImageFolderDataset(image_tree, image_size=32, batch_size=4,
                                prefetch=0))
    b = list(ImageFolderDataset(image_tree, image_size=32, batch_size=4,
                                prefetch=3))
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_prefetch_overlaps_decode_with_consumer():
    """The producer must run ahead of the consumer (double-buffering)."""
    import time

    produced = []

    def slow_gen():
        for i in range(5):
            produced.append(i)
            yield i

    it = prefetch_iter(slow_gen(), depth=2)
    first = next(it)
    time.sleep(0.1)   # give the worker time to fill the buffer
    assert first == 0
    # with the consumer stalled, the worker decoded ahead
    assert len(produced) >= 3
    assert list(it) == [1, 2, 3, 4]


def test_prefetch_propagates_exceptions():
    def bad_gen():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_iter(bad_gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_shards_are_disjoint(image_tree):
    all_labels = []
    for shard in range(2):
        ds = ImageFolderDataset(image_tree, image_size=32, batch_size=64,
                                shard_id=shard, num_shards=2)
        assert len(ds.paths) == 12
        all_labels.extend(ds.paths)
    assert len(set(all_labels)) == 24   # no overlap, full cover


def test_train_loader_shuffles_and_augments(image_tree):
    ds = ImageFolderDataset(image_tree, image_size=32, batch_size=24,
                            train=True, seed=3)
    (x1, y1), = list(ds)
    (x2, y2), = list(ds)     # second epoch: fresh shuffle + fresh crops
    assert x1.shape == (24, 32, 32, 3)
    assert not np.array_equal(x1, x2)


def test_make_dataloaders_synthetic_fallback():
    train, val = make_dataloaders(None, image_size=16, batch_size=4)
    assert isinstance(train, SyntheticImageNet)
    x, y = next(iter(val))
    assert x.shape == (4, 16, 16, 3)
