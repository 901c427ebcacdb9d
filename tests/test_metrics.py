"""Metrics/observability (utils/metrics.py) and async rotating checkpoints
(utils/checkpoint.py AsyncCheckpointer) — the §5.5 aux-subsystem layer."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.utils import (
    AsyncCheckpointer,
    MetricsLogger,
    MFUMeter,
    transformer_train_flops,
)


# ---------------------------------------------------------------------------
# MetricsLogger
# ---------------------------------------------------------------------------


def test_metrics_logger_jsonl_and_history(tmp_path):
    path = tmp_path / "run.jsonl"
    with MetricsLogger(path) as log:
        log.log(step=1, loss=md.Tensor(2.5), lr=3e-4)
        log.log(step=2, loss=1.5, lr=3e-4, grad_norm=0.7)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert [r["step"] for r in lines] == [1, 2]
    assert lines[0]["loss"] == 2.5          # Tensor auto-converted
    assert lines[1]["grad_norm"] == 0.7
    assert all("time_s" in r for r in lines)


def test_metrics_logger_summary_windows():
    log = MetricsLogger()  # in-memory only
    for i, loss in enumerate([4.0, 3.0, 2.0, 1.0]):
        log.log(step=i, loss=loss)
    log.log(step=4, loss=0.0, acc=1.0)  # key missing from earlier records
    s_all = log.summary()
    assert s_all["loss"] == pytest.approx(2.0)
    assert s_all["acc"] == pytest.approx(1.0)  # averaged where present
    s_last2 = log.summary(window=2)
    assert s_last2["loss"] == pytest.approx(0.5)


def test_metrics_logger_append_mode(tmp_path):
    path = tmp_path / "run.jsonl"
    with MetricsLogger(path) as log:
        log.log(step=1, loss=1.0)
    with MetricsLogger(path) as log:  # resume: appends, never truncates
        log.log(step=2, loss=0.5)
    assert len(path.read_text().splitlines()) == 2


# ---------------------------------------------------------------------------
# MFU
# ---------------------------------------------------------------------------


def test_transformer_train_flops_formula():
    # 6 * N * T, plus 12 * L * d * S per token when geometry is given
    assert transformer_train_flops(1000, 10) == 6.0 * 1000 * 10
    got = transformer_train_flops(1000, 10, num_layers=2, dim=8, seq_len=4)
    assert got == 6.0 * 1000 * 10 + 12.0 * 2 * 8 * 4 * 10


def test_mfu_meter_math():
    meter = MFUMeter(flops_per_step=1e12, peak_tflops=100.0)
    meter.times.extend([0.1, 0.1])  # inject known timings
    assert meter.tflops() == pytest.approx(10.0)
    assert meter.mfu() == pytest.approx(0.1)
    assert meter.tokens_per_sec(2048) == pytest.approx(20480.0)
    meter.times.append(0.2)
    assert meter.tflops(window=1) == pytest.approx(5.0)


def test_mfu_meter_start_stop_records():
    meter = MFUMeter(flops_per_step=1.0, peak_tflops=1.0)
    meter.start()
    dt = meter.stop()
    assert dt >= 0 and meter.times == [dt]
    with pytest.raises(AssertionError):
        meter.stop()  # stop without start


# ---------------------------------------------------------------------------
# AsyncCheckpointer
# ---------------------------------------------------------------------------


def _tree():
    return {
        "w": md.Tensor(np.arange(6.0).reshape(2, 3), allow_grad=True),
        "blocks": [{"b": md.Tensor(np.ones(4))}],
    }


def test_async_checkpointer_roundtrip_and_rotation(tmp_path, backend):
    params = _tree()
    state = {"m": md.Tensor(np.full(3, 0.5))}
    with AsyncCheckpointer(tmp_path / "ck", keep=2) as ckpt:
        for step in (1, 2, 3):
            # vary a leaf per step so restore provably picks the newest
            params["w"] = md.Tensor(
                np.arange(6.0).reshape(2, 3) * step, allow_grad=True)
            ckpt.save(step, params, state, extra={"epoch": step})
        ckpt.wait()
        assert ckpt.steps() == [2, 3]  # step 1 rotated away
        rp, rs, step, extra = ckpt.restore_latest(params, state)
    assert step == 3 and extra == {"epoch": 3}
    np.testing.assert_array_equal(np.asarray(rp["w"]),
                                  np.arange(6.0).reshape(2, 3) * 3)
    assert rp["w"].allow_grad  # like-tree flags preserved
    np.testing.assert_array_equal(np.asarray(rs["m"]), np.full(3, 0.5))
    # no tmp litter
    assert not [f for f in os.listdir(tmp_path / "ck") if f.endswith(".tmp")]


def test_async_checkpointer_snapshot_isolated_from_later_updates(tmp_path):
    """The device->host pull happens inside save(): mutating/rebinding the
    tree afterwards must not change what lands on disk."""
    params = _tree()
    with AsyncCheckpointer(tmp_path / "ck") as ckpt:
        ckpt.save(7, params)
        params["w"] = md.Tensor(np.zeros((2, 3)))  # post-save update
        rp, _, step, _ = ckpt.restore_latest(params)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(rp["w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_async_checkpointer_wait_reraises(tmp_path):
    ckpt = AsyncCheckpointer(tmp_path / "ck")
    # sabotage the target directory AFTER construction: the background write
    # fails, and wait() must surface it instead of losing it
    os.rmdir(tmp_path / "ck")
    (tmp_path / "ck").write_text("not a directory")
    ckpt.save(1, _tree())
    with pytest.raises(Exception):
        ckpt.wait()


def test_async_checkpointer_restore_empty_raises(tmp_path):
    with AsyncCheckpointer(tmp_path / "ck") as ckpt:
        with pytest.raises(FileNotFoundError):
            ckpt.restore_latest(_tree())
