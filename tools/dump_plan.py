"""Dump the region-layout plan for a model's full forward (out0/output
extraction): per-node layouts, plus every conversion site (blob produced in
one layout, consumed in the other) with its shape — the cost model of the
plan is 'conversions are the only new cost; lane-padding is the avoided one'.

Run: python -u tools/dump_plan.py [model] [HxW] [B]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from rife_tpu.engine import pipelines
    from rife_tpu.engine.session import RIFE, pad_to
    from rife_tpu.graph import layout as L
    from rife_tpu.graph.executor import RegionExecutor
    from rife_tpu.ops import frame

    model = sys.argv[1] if len(sys.argv) > 1 else "rife-v4.6"
    hw = sys.argv[2] if len(sys.argv) > 2 else "1080x1920"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    H, W = (int(v) for v in hw.split("x"))
    ph, pw = pad_to(H), pad_to(W)

    s = RIFE(model, dtype="bfloat16")
    name = "flownet"
    ex = s.executors[name]
    assert isinstance(ex, RegionExecutor), "set RIFE_TPU_LAYOUT=region"
    cfg = s.cfg

    out_blob = "out0" if cfg.family == "v4" else "flow"
    inputs_names = (
        {"in0", "in1", "in2"} if cfg.family == "v4" else {"input0", "input1"}
    )

    dt = cfg.jdtype
    inputs = {
        n: jax.ShapeDtypeStruct((B, ph, pw, 3 if n != "in2" else 1), dt)
        for n in inputs_names
    }
    planar_out = {out_blob} if cfg.family == "v4" else set()
    ctx = {**ex.ctx, "w": s.weights[name],
           "planar_outputs": frozenset(planar_out)}
    shapes = ex._blob_shapes(inputs, [out_blob], ctx)
    needed = ex.graph.required_nodes([out_blob], list(inputs))
    plan = L.plan_layouts(ex.graph, needed, shapes, ctx, [out_blob],
                          {b: L.NCHW for b in planar_out})

    prod_layout = {}
    for n in inputs:
        prod_layout[n] = L.NHWC
    for i in needed:  # topological: Split transparency resolves forward
        node = ex.graph.nodes[i]
        if node.type == "Split":
            for t in node.tops:
                prod_layout[t] = prod_layout.get(node.bottoms[0], L.NHWC)
            continue
        for t in node.tops:
            prod_layout[t] = plan[i] if node.type != "Input" else L.NHWC

    n_p = sum(1 for i in needed if plan[i] == L.NCHW)
    print(f"{model} {H}x{W} B={B}: {n_p}/{len(needed)} nodes planar")
    conv_bytes = 0
    for i in needed:
        node = ex.graph.nodes[i]
        if node.type in ("Input", "Split"):
            continue
        for b in node.bottoms:
            if prod_layout.get(b) != plan[i]:
                shp = shapes.get(b)
                sz = int(np.prod(shp)) * 2 if shp else 0
                conv_bytes += sz
                print(
                    f"  CONVERT {b:12s} {str(shp):28s} "
                    f"{prod_layout.get(b)}->{plan[i]}  at {node.type} "
                    f"{node.name}  ({sz/1e6:.1f} MB)"
                )
    print(f"total conversion traffic ~{2*conv_bytes/1e9:.2f} GB (r+w)")
    print("\nplanar nodes:")
    for i in needed:
        if plan[i] == L.NCHW:
            node = ex.graph.nodes[i]
            shp = shapes.get(node.tops[0])
            print(f"  {node.type:16s} {node.name:20s} out={shp}")


if __name__ == "__main__":
    main()
