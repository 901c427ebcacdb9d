"""Native C++ prefetching DataLoader + dataset format (dataloader.py).

The reference has no data subsystem (SURVEY.md §5.4: IO is save/load only);
this covers the runtime extension: record packing, epoch shuffling (the C++
mt19937_64 stream, reproduced exactly by the Python fallback), field
alignment under shuffle, partial batches, and multi-epoch iteration.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu import native


def setup_function(_):
    md.set_backend("numpy")


def _unwrap_all(batches, field):
    return np.concatenate([np.asarray(b[field].detach()) for b in batches])


def test_native_library_builds():
    """The C++ toolchain is present in this image; the loader must build."""
    assert native.available()


def _check_loader(ld, x, y):
    batches = list(ld)
    assert len(batches) == len(ld)
    xs = _unwrap_all(batches, "x")
    ys = _unwrap_all(batches, "y")
    assert xs.shape[0] == x.shape[0]
    # reconstruct the permutation from the float rows: every item exactly once
    lookup = {row.tobytes(): i for i, row in enumerate(x)}
    order = np.array([lookup[row.tobytes()] for row in xs])
    assert sorted(order.tolist()) == list(range(x.shape[0]))
    # fields stay aligned under the shuffle
    np.testing.assert_array_equal(y[order], ys)
    return order


@pytest.mark.parametrize("use_native", [True, False])
def test_permutation_and_alignment(use_native):
    np.random.seed(0)
    x = np.random.randn(257, 5).astype(np.float32)  # prime -> partial batch
    y = np.random.randint(0, 7, 257).astype(np.int64)
    ld = md.DataLoader({"x": x, "y": y}, batch_size=64, shuffle=True, seed=3)
    if not use_native:
        ld._handle, saved = None, ld._handle
        ld._records = np.fromfile(ld.path + ".bin", dtype=np.uint8).reshape(
            ld.n_items, ld.item_bytes
        )
    order = _check_loader(ld, x, y)
    assert not np.array_equal(order, np.arange(257))  # actually shuffled
    if not use_native:
        ld._handle = saved
    ld.close()


def test_native_and_fallback_share_the_shuffle_stream():
    """Bit-for-bit identical batch order from C++ mt19937_64 and the Python
    reimplementation — seeds/checkpoints transfer across machines without
    the toolchain."""
    np.random.seed(1)
    x = np.random.randn(130, 3).astype(np.float32)
    y = np.arange(130, dtype=np.int64)

    ld = md.DataLoader({"x": x, "y": y}, batch_size=32, shuffle=True, seed=9)
    assert ld.native
    nat = [np.asarray(b["y"].detach()) for b in ld]
    ld.close()

    ld2 = md.DataLoader({"x": x, "y": y}, batch_size=32, shuffle=True, seed=9)
    ld2._handle, saved = None, ld2._handle
    ld2._records = np.fromfile(ld2.path + ".bin", dtype=np.uint8).reshape(
        ld2.n_items, ld2.item_bytes
    )
    fb = [np.asarray(b["y"].detach()) for b in ld2]
    ld2._handle = saved
    ld2.close()

    assert len(nat) == len(fb)
    for a, b in zip(nat, fb):
        np.testing.assert_array_equal(a, b)


def test_epochs_reshuffle_deterministically():
    np.random.seed(2)
    x = np.random.randn(96, 2).astype(np.float64)
    ld = md.DataLoader({"x": x}, batch_size=32, shuffle=True, seed=4)
    e0 = _unwrap_all(list(ld), "x")
    e1 = _unwrap_all(list(ld), "x")
    assert not np.array_equal(e0, e1)  # epochs differ
    ld.close()
    # fresh loader with the same seed replays the same epoch sequence
    ld2 = md.DataLoader({"x": x}, batch_size=32, shuffle=True, seed=4)
    np.testing.assert_array_equal(_unwrap_all(list(ld2), "x"), e0)
    np.testing.assert_array_equal(_unwrap_all(list(ld2), "x"), e1)
    ld2.close()


def test_stale_iterator_invalidated_by_new_epoch():
    """A second __iter__ while the first is active must not let the old
    generator silently yield the new epoch's batches from the shared native
    handle — it raises instead."""
    x = np.arange(128, dtype=np.int32).reshape(128, 1)
    ld = md.DataLoader({"x": x}, batch_size=32, shuffle=True, seed=1)
    if not ld.native:
        pytest.skip("native loader unavailable; fallback iterators are "
                    "independent")
    it_old = iter(ld)
    next(it_old)  # old epoch active
    it_new = iter(ld)  # claims the handle for the next epoch
    with pytest.raises(RuntimeError, match="invalidated"):
        next(it_old)
    # the new iterator still delivers its full epoch
    batches = [next(it_new) for _ in range(len(ld))]
    assert sum(b["x"].shape[0] for b in batches) == 128
    ld.close()


def test_no_shuffle_preserves_order_and_drop_last():
    x = np.arange(100, dtype=np.int32).reshape(100, 1)
    ld = md.DataLoader({"x": x}, batch_size=32, shuffle=False, drop_last=True)
    batches = list(ld)
    assert len(batches) == 3 and all(b["x"].shape[0] == 32 for b in batches)
    np.testing.assert_array_equal(
        _unwrap_all(batches, "x").ravel(), np.arange(96)
    )
    ld.close()


def test_save_dataset_file_roundtrip():
    np.random.seed(3)
    x = np.random.randn(40, 4, 2).astype(np.float32)  # multi-dim items
    y = np.random.randn(40).astype(np.float64)        # mixed dtypes
    with tempfile.TemporaryDirectory() as d:
        path = md.save_dataset(os.path.join(d, "ds"), x=x, y=y)
        ld = md.DataLoader(path, batch_size=40, shuffle=False)
        batch = next(iter(ld))
        np.testing.assert_array_equal(np.asarray(batch["x"].detach()), x)
        np.testing.assert_array_equal(np.asarray(batch["y"].detach()), y)
        assert batch["x"].shape == (40, 4, 2)
        ld.close()


def test_misaligned_fields_raise():
    with pytest.raises(ValueError):
        md.save_dataset(
            tempfile.mktemp(), x=np.zeros((4, 2)), y=np.zeros((5,))
        )


def test_training_through_loader():
    """End-to-end: the MLP train loop consumes DataLoader batches."""
    from minidiff_tpu.models import MLP, SGD, make_train_step
    from minidiff_tpu.models.data import synthetic_classification

    xs, ys = synthetic_classification(256, 16, 4)
    model = MLP(16, (32,), 4)
    params = model.init()
    opt = SGD(0.2)
    state = opt.init(params)
    step = make_train_step(model, opt, jit=False)
    losses = []
    ld = md.DataLoader({"x": xs, "y": ys}, batch_size=64, shuffle=True, seed=0)
    for _ in range(4):  # epochs
        for batch in ld:
            params, state, loss = step(params, state, batch["x"], batch["y"])
            losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    ld.close()
