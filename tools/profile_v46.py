"""Where does the v4.6 1080p step spend its time on the real chip?

Measures, on the TPU:
  1. full fused step (B=1 and B=4, bf16)
  2. the same step with warps replaced by identity (ablation)
  3. each individual warp in the v4.6 graph, at its true scale, with the
     flow tensors the graph actually produces (synthetic calibrated weights)

Run:  python -u tools/profile_v46.py
(One python process at a time — the axon relay serialises.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def sync(x):
    return np.asarray(x if x.ndim == 0 else x.ravel()[0])


def timeit(fn, *args, iters=5, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.engine.session import RIFE
    from rife_tpu.ops.warp_pallas import warp_pallas

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev}")

    H, W = 1080, 1920
    from PIL import Image

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8
            )

    f0 = load("/root/reference/images/0.png")
    f1 = load("/root/reference/images/1.png")

    session = RIFE("rife-v4.6", dtype="bfloat16")

    for b in (1, 4):
        in0 = np.broadcast_to(f0, (b, H, W, 3)).copy()
        in1 = np.broadcast_to(f1, (b, H, W, 3)).copy()
        ts = jnp.full((b,), 0.5, jnp.float32)
        d0 = jax.device_put(jnp.asarray(in0), dev)
        d1 = jax.device_put(jnp.asarray(in1), dev)
        step = session._get_step(b, H, W)
        dt = timeit(step, session.weights, d0, d1, ts, iters=5)
        print(f"full step    B={b}: {dt*1e3:8.1f} ms  ({b/dt:6.2f} fps)")

    # ---- ablation: no-warp step --------------------------------------------
    from rife_tpu.graph.executor import Executor
    from rife_tpu.ops import jax_ops

    def ident_warp(node, inputs, w, ctx):
        return [inputs[0]]

    table = dict(jax_ops.OP_TABLE)
    table["rife.Warp"] = ident_warp
    net = session.model.nets["flownet"]
    ex_nowarp = Executor(net.graph, table, net.weights, ctx={})

    from rife_tpu.engine import pipelines
    from rife_tpu.ops import frame

    pad_h, pad_w = 1088, 1920

    def step_nowarp(Wt, a0, a1, t):
        img0 = frame.preprocess(a0, pad_h, pad_w, jnp.bfloat16)
        img1 = frame.preprocess(a1, pad_h, pad_w, jnp.bfloat16)
        tp = frame.timestep_plane(t, a0.shape[0], pad_h, pad_w, jnp.bfloat16)
        out = ex_nowarp.run(
            {"in0": img0, "in1": img1, "in2": tp}, ["out0"],
            {"w": Wt["flownet"]},
        )[0]
        return frame.postprocess(out, H, W)

    jn = jax.jit(step_nowarp)
    for b in (1, 4):
        in0 = np.broadcast_to(f0, (b, H, W, 3)).copy()
        in1 = np.broadcast_to(f1, (b, H, W, 3)).copy()
        ts = jnp.full((b,), 0.5, jnp.float32)
        d0 = jax.device_put(jnp.asarray(in0), dev)
        d1 = jax.device_put(jnp.asarray(in1), dev)
        dt = timeit(jn, session.weights, d0, d1, ts, iters=5)
        print(f"no-warp step B={b}: {dt*1e3:8.1f} ms")

    # ---- real per-warp cost: grab the graph's own warp inputs ---------------
    # tap the actual (image, flow) pairs feeding each Warp node at B=1
    net_graph = net.graph
    warp_nodes = [n for n in net_graph.nodes if n.type == "rife.Warp"]
    need = sorted({b_ for n in warp_nodes for b_ in n.bottoms})

    ex = session.executors["flownet"]
    b = 1
    img0 = frame.preprocess(jnp.asarray(f0[None]), pad_h, pad_w, jnp.bfloat16)
    img1 = frame.preprocess(jnp.asarray(f1[None]), pad_h, pad_w, jnp.bfloat16)
    tp = frame.timestep_plane(
        jnp.full((1,), 0.5, jnp.float32), 1, pad_h, pad_w, jnp.bfloat16
    )

    @jax.jit
    def taps(Wt, a, bb, t):
        return ex.run({"in0": a, "in1": bb, "in2": t}, need, {"w": Wt["flownet"]})

    vals = dict(zip(need, taps(session.weights, img0, img1, tp)))
    u8_blobs = session.executors["flownet"].ctx.get("u8_image_blobs", ())
    for node in warp_nodes:
        image, flow = vals[node.bottoms[0]], vals[node.bottoms[1]]
        fl = np.asarray(flow, np.float32)
        dt = timeit(warp_pallas, image, flow, iters=5)
        line = (
            f"warp {node.name:8s} img{tuple(image.shape)} "
            f"flow[{fl.min():7.1f},{fl.max():7.1f}] "
            f"|f|~{np.abs(fl).mean():6.2f}: {dt*1e3:7.2f} ms"
        )
        if node.bottoms[0] in u8_blobs:
            dt8 = timeit(
                lambda i, f: warp_pallas(i, f, u8_origin=True),
                image, flow, iters=5,
            )
            line += f"  | u8-quad: {dt8*1e3:7.2f} ms"
        print(line)


if __name__ == "__main__":
    main()
