"""Multi-chip scaling via jax.sharding — the TPU replacement for the
reference's multi-GPU task loop (/root/reference/src/main.cpp:819-866).

The reference scales by running one independent engine per GPU with zero
inter-device traffic.  On TPU the idiomatic equivalents are:

* **data parallel** — shard the frame-pair batch axis across the mesh;
  weights are replicated, XLA inserts no collectives (embarrassingly
  parallel, matching the reference's work-stealing semantics but with one
  fused program and no host-side queue contention);
* **spatial parallel** — for single giant frames (UHD mode's "long
  sequence" analog, SURVEY.md §5), shard the frame HEIGHT axis; XLA GSPMD
  auto-inserts halo exchanges (collective-permutes over ICI) for every
  conv/warp window that crosses a shard boundary — the hand-written ring
  ppermute the reference never needed becomes a compiler concern.

Both paths reuse the session's raw step function and re-jit it with
NamedSharding constraints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.session import RIFE, pad_to


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_data: int, n_spatial: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if n_data * n_spatial != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


class ShardedRIFE:
    """Wraps a RIFE session with mesh-sharded execution.

    ``batch_axis``: mesh axis name sharding the frame-pair batch (or None).
    ``height_axis``: mesh axis name sharding frame height (or None).
    """

    def __init__(
        self,
        session: RIFE,
        mesh: Mesh,
        *,
        batch_axis: Optional[str] = "data",
        height_axis: Optional[str] = None,
    ):
        self.session = session
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.height_axis = height_axis
        self._cache = {}
        # session weights are committed to one device; replicate them onto
        # the mesh once
        self.weights = jax.device_put(
            session.weights, NamedSharding(mesh, P())
        )

    @property
    def model(self):
        return self.session.model

    def _spec_frame(self):
        return P(self.batch_axis, self.height_axis, None, None)

    def _spec_t(self):
        return P(self.batch_axis)

    def _get_step(self, b: int, h: int, w: int):
        key = (b, pad_to(h), pad_to(w))
        fn = self._cache.get(key)
        if fn is None:
            frame_sh = NamedSharding(self.mesh, self._spec_frame())
            t_sh = NamedSharding(self.mesh, self._spec_t())
            repl = NamedSharding(self.mesh, P())
            if self.height_axis is None:
                # batch-only sharding: shard_map runs the FULL per-device
                # program on each device's batch shard — Pallas kernels stay
                # usable (GSPMD cannot auto-partition custom calls), and no
                # collectives exist (embarrassingly parallel, like the
                # reference's per-GPU engines)
                raw = self.session.build_step_fn(pad_to(h), pad_to(w))
                mapped = jax.shard_map(
                    raw,
                    mesh=self.mesh,
                    in_specs=(
                        jax.tree_util.tree_map(
                            lambda _: P(), self.session.weights
                        ),
                        self._spec_frame(), self._spec_frame(),
                        self._spec_t(),
                    ),
                    out_specs=self._spec_frame(),
                    check_vma=False,
                )
                fn = jax.jit(mapped)
            else:
                # spatial (height) sharding: conv/resize windows cross shard
                # boundaries and GSPMD inserts their halo exchanges; the
                # warps — where a partitioned XLA gather measured ~1000x the
                # Pallas cost (BASELINE.md round-1, 44 s vs 17 ms at 4K) —
                # route through shard_map instead: all-gather the u8 source
                # frame over ICI, run the Pallas slab kernel on each shard's
                # own output rows (jax_ops.warp_spatial)
                raw = self.session.build_step_fn(
                    pad_to(h), pad_to(w),
                    spatial_warp=(self.mesh, self.height_axis,
                                  self.batch_axis),
                )
                fn = jax.jit(
                    raw,
                    in_shardings=(
                        jax.tree_util.tree_map(
                            lambda _: repl, self.session.weights
                        ),
                        frame_sh, frame_sh, t_sh,
                    ),
                    out_shardings=frame_sh,
                )
            self._cache[key] = fn
        return fn

    def _batch_multiple(self) -> int:
        if self.batch_axis is None:
            return 1
        return int(self.mesh.shape[self.batch_axis])

    def process_batch_device(self, in0, in1, timesteps):
        """Dispatch one sharded step and return the on-device padded output
        array WITHOUT blocking (rows past the input batch are padding).  The
        batch is padded up to a multiple of the data-axis size (padding rows
        replay the last pair)."""
        in0 = np.asarray(in0)
        in1 = np.asarray(in1)
        ts = np.asarray(timesteps, np.float32).reshape(in0.shape[0])
        b = in0.shape[0]
        mult = self._batch_multiple()
        bp = (b + mult - 1) // mult * mult
        if bp != b:
            rep = bp - b
            in0 = np.concatenate([in0, np.repeat(in0[-1:], rep, axis=0)])
            in1 = np.concatenate([in1, np.repeat(in1[-1:], rep, axis=0)])
            ts = np.concatenate([ts, np.repeat(ts[-1:], rep)])
        step = self._get_step(bp, in0.shape[1], in0.shape[2])
        return step(self.weights, in0, in1, ts)

    def process_batch(self, in0, in1, timesteps):
        """Like RIFE.process_batch but sharded over the mesh."""
        b = np.asarray(in0).shape[0]
        out = self.process_batch_device(in0, in1, timesteps)
        return np.asarray(out)[:b]


def partition_tasks(tasks: Sequence, rank: int, world: int):
    """Static file-range partitioning for multi-host directory mode
    (SURVEY.md §5: hosts never need to communicate — outputs are
    independently named files)."""
    if world <= 1:
        return list(tasks)
    return [t for i, t in enumerate(tasks) if i % world == rank]
