"""PipelineRunner unit tests with fake device steps (no model, no jit)."""

import numpy as np
import pytest

from rife_tpu.io.runner import PipelineRunner, Task


@pytest.fixture
def frames(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = tmp_path / f"{i:03d}.png"
        Image.fromarray(
            rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
        ).save(p)
        paths.append(str(p))
    return paths


def _mean_blend(in0, in1, ts):
    t = ts.reshape(-1, 1, 1, 1).astype(np.float32)
    return ((1 - t) * in0 + t * in1).astype(np.uint8)


def _tasks(paths, out_dir, n):
    return [
        Task(
            id=i,
            in0_path=paths[i % len(paths)],
            in1_path=paths[(i + 1) % len(paths)],
            out_path=str(out_dir / f"{i:04d}.png"),
            timestep=0.25 + 0.5 * (i % 2),
        )
        for i in range(n)
    ]


def test_runner_sync_path(frames, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    runner = PipelineRunner([_mean_blend], batch_size=4)
    errors = runner.run(_tasks(frames, out, 10))
    assert errors == []
    assert len(list(out.iterdir())) == 10


def test_runner_async_device_path(frames, tmp_path):
    """device_fns dispatch without blocking; the downloader drains them.
    A list-backed 'device array' is enough — np.asarray materializes it."""
    out = tmp_path / "out"
    out.mkdir()
    calls = []

    def device_fn(in0, in1, ts):
        calls.append(len(ts))
        return _mean_blend(in0, in1, ts)  # ndarray stands in for jax.Array

    def never(*a):  # sync fn must not be used when device_fns are given
        raise AssertionError("sync path used")

    runner = PipelineRunner([never], batch_size=4, device_fns=[device_fn])
    errors = runner.run(_tasks(frames, out, 11))
    assert errors == []
    assert len(list(out.iterdir())) == 11
    assert sum(calls) == 11  # all frames went through the device fn


def test_runner_async_error_capture(frames, tmp_path):
    out = tmp_path / "out"
    out.mkdir()

    def boom(in0, in1, ts):
        raise RuntimeError("device on fire")

    runner = PipelineRunner([lambda *a: None], batch_size=2,
                            device_fns=[boom])
    errors = runner.run(_tasks(frames, out, 4))
    assert errors and "device on fire" in errors[0]
    assert len(list(out.iterdir())) == 0


def test_runner_per_device_batch_sizes(frames, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    seen = {0: [], 1: []}

    def mk(i):
        def fn(in0, in1, ts):
            seen[i].append(len(ts))
            return _mean_blend(in0, in1, ts)
        return fn

    runner = PipelineRunner([mk(0), mk(1)], batch_size=[2, 3])
    errors = runner.run(_tasks(frames, out, 12))
    assert errors == []
    assert len(list(out.iterdir())) == 12
    assert all(n <= 2 for n in seen[0]) and all(n <= 3 for n in seen[1])
