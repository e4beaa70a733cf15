"""Single-chip-equivalent cost of the height-sharded (spatial) step.

Multi-chip hardware is not reachable from this dev environment, so this
measures the spatial path's per-shard program on the ONE real chip via a
1x1 mesh: the program is the exact shard_map program a multi-chip run
executes (all-gather of the u8 source frames + per-shard Pallas slab
warps + GSPMD-partitioned convs), minus the ICI transfer time.  Comparing
against the unsharded step at the same size bounds the spatial path's
overhead; the ICI adder is the all-gathered source bytes (2 frames x H x W
x 4B quad words per warp site) over ~45 GB/s/link.

Run: python -u tools/spatial_cost.py [H W B iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from rife_tpu.engine.session import RIFE
    from rife_tpu.parallel.sharding import ShardedRIFE, make_mesh_2d

    argv = sys.argv[1:]
    H = int(argv[0]) if len(argv) > 0 else 2160
    W = int(argv[1]) if len(argv) > 1 else 3840
    B = int(argv[2]) if len(argv) > 2 else 2
    iters = int(argv[3]) if len(argv) > 3 else 4

    rng = np.random.default_rng(0)
    in0 = rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8)
    in1 = rng.integers(0, 256, (B, H, W, 3)).astype(np.uint8)
    ts = np.full((B,), 0.5, np.float32)

    def sync(x):
        return np.asarray(x[:1, :1, :1, :1])

    def run(label, fn):
        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:34s}: {dt * 1e3:8.1f} ms/step  "
              f"{B / dt:6.2f} fps", flush=True)
        return dt

    session = RIFE("rife-v4.6", dtype="bfloat16")
    d0 = jax.device_put(in0, session.device)
    d1 = jax.device_put(in1, session.device)
    dt = jax.device_put(ts, session.device)
    step = session._get_step(B, H, W)
    t_plain = run("unsharded (Pallas warps)",
                  lambda: step(session.weights, d0, d1, dt))

    mesh = make_mesh_2d(1, 1)
    sh = ShardedRIFE(session, mesh, batch_axis="data", height_axis="spatial")
    # pre-stage inputs with the mesh sharding (process_batch_device takes
    # numpy and would re-upload through the dev tunnel every step)
    from jax.sharding import NamedSharding

    frame_sh = NamedSharding(mesh, sh._spec_frame())
    t_sh_sp = NamedSharding(mesh, sh._spec_t())
    s0 = jax.device_put(in0, frame_sh)
    s1 = jax.device_put(in1, frame_sh)
    st = jax.device_put(ts, t_sh_sp)
    spstep = sh._get_step(B, H, W)
    t_sp = run("spatial 1x1 mesh (shard_map warps)",
               lambda: spstep(sh.weights, s0, s1, st))

    print(f"spatial-path overhead vs unsharded: "
          f"{(t_sp - t_plain) * 1e3:+.1f} ms ({t_sp / t_plain:.3f}x)")


if __name__ == "__main__":
    main()
