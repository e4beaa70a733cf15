"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np

from rife_tpu.engine.session import RIFE
from rife_tpu.parallel.sharding import (
    ShardedRIFE,
    make_mesh,
    make_mesh_2d,
    partition_tasks,
)


def mkframe(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_single_device():
    s = RIFE("rife-v4.6")
    mesh = make_mesh()
    sh = ShardedRIFE(s, mesh, batch_axis="data")
    in0 = np.stack([mkframe(32, 32, i) for i in range(8)])
    in1 = np.stack([mkframe(32, 32, 100 + i) for i in range(8)])
    ts = np.linspace(0.1, 0.9, 8).astype(np.float32)
    out_sharded = sh.process_batch(in0, in1, ts)
    out_single = s.process_batch(in0, in1, ts)
    # float reassociation across the sharded program can land a value on the
    # other side of the *255+0.5 rounding boundary for isolated pixels —
    # allow off-by-one u8 on <0.1% of pixels, nothing more
    diff = np.abs(out_sharded.astype(np.int16) - out_single.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_data_parallel_pads_partial_batch():
    s = RIFE("rife-v4.6")
    sh = ShardedRIFE(s, make_mesh(), batch_axis="data")
    in0 = np.stack([mkframe(32, 32, i) for i in range(3)])  # 3 % 8 != 0
    in1 = np.stack([mkframe(32, 32, 50 + i) for i in range(3)])
    ts = np.asarray([0.25, 0.5, 0.75], np.float32)
    out = sh.process_batch(in0, in1, ts)
    assert out.shape == (3, 32, 32, 3)
    ref = s.process_batch(in0, in1, ts)
    np.testing.assert_array_equal(out, ref)


def test_spatial_parallel_height_sharding():
    """Shard a single frame's height across 4 chips: XLA GSPMD handles the
    conv/warp halo exchange; the result must match unsharded execution."""
    s = RIFE("rife-v2.3")
    mesh = make_mesh_2d(2, 4)
    sh = ShardedRIFE(s, mesh, batch_axis="data", height_axis="spatial")
    in0 = np.stack([mkframe(64, 32, 1), mkframe(64, 32, 2)])
    in1 = np.stack([mkframe(64, 32, 3), mkframe(64, 32, 4)])
    ts = np.asarray([0.5, 0.5], np.float32)
    out = sh.process_batch(in0, in1, ts)
    ref = s.process_batch(in0, in1, ts)
    diff = np.abs(out.astype(int) - ref.astype(int))
    # GSPMD may reassociate reductions; allow 1 u8 step on a few pixels
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_spatial_sharding_v4_matches_unsharded():
    """v4.6 under height sharding: every warp (plain, fused-ds4, render)
    takes the shard_map spatial path (jax_ops.warp_spatial) — all-gathered
    source, per-shard sampling — and must match unsharded execution."""
    s = RIFE("rife-v4.6")
    mesh = make_mesh_2d(2, 4)
    sh = ShardedRIFE(s, mesh, batch_axis="data", height_axis="spatial")
    in0 = np.stack([mkframe(64, 64, 11), mkframe(64, 64, 12)])
    in1 = np.stack([mkframe(64, 64, 13), mkframe(64, 64, 14)])
    ts = np.asarray([0.5, 0.25], np.float32)
    out = sh.process_batch(in0, in1, ts)
    ref = s.process_batch(in0, in1, ts)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_spatial_sharding_non_divisible_heights_no_gather_fallback(monkeypatch):
    """Pyramid levels whose height is NOT divisible by the spatial mesh
    extent (here 1/8- and 1/16-scale taps of a 96-row frame on an 8-shard
    axis: 12 and 6 rows) must PAD to the mesh multiple and stay on the
    sharded warp path — never silently revert to the partitioned XLA
    gather the repo measured at ~1000x the Pallas cost at 4K
    (VERDICT r4 #6)."""
    from rife_tpu.ops import jax_ops

    s = RIFE("rife-v2.3")
    mesh = make_mesh_2d(1, 8)
    sh = ShardedRIFE(s, mesh, batch_axis="data", height_axis="spatial")

    calls = {"warn": 0, "spatial": 0}
    real_spatial = jax_ops.warp_spatial

    def spy_warn(shape, dims):
        calls["warn"] += 1

    def spy_spatial(image, sy, sx, ctx, **kw):
        calls["spatial"] += 1
        return real_spatial(image, sy, sx, ctx, **kw)

    monkeypatch.setattr(jax_ops, "_warn_spatial_fallback", spy_warn)
    monkeypatch.setattr(jax_ops, "warp_spatial", spy_spatial)

    in0 = mkframe(96, 64, 21)[None]
    in1 = mkframe(96, 64, 22)[None]
    ts = np.asarray([0.5], np.float32)
    out = sh.process_batch(in0, in1, ts)
    ref = s.process_batch(in0, in1, ts)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99
    assert calls["spatial"] > 0  # the spatial path was exercised
    assert calls["warn"] == 0  # and never fell back to the XLA gather


def test_partition_tasks():
    tasks = list(range(10))
    parts = [partition_tasks(tasks, r, 3) for r in range(3)]
    assert sorted(sum(parts, [])) == tasks
    assert partition_tasks(tasks, 0, 1) == tasks
