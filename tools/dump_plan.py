"""Dump the region-layout plan for a model's full forward (out0/output
extraction): per-node layouts, plus every conversion site (blob produced in
one layout, consumed in the other) with its shape — the cost model of the
plan is 'conversions are the only new cost; lane-padding is the avoided one'.

Covers every net of the model (v4: flownet; v1/v2: flownet + contextnet +
fusionnet with the pipeline's real inter-net shapes).

Run: python -u tools/dump_plan.py [model] [HxW] [B]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# plan inspection works on CPU: force the planner's gates on
os.environ.setdefault("RIFE_TPU_LAYOUT", "region")
os.environ.setdefault("RIFE_TPU_LAYOUT_CONV", "1")
os.environ.setdefault("RIFE_TPU_LAYOUT_DECONV", "1")
os.environ.setdefault("RIFE_TPU_PLANAR", "0")


def _net_io(family: str, net: str, B, ph, pw, dt):
    """(inputs, outputs) with the pipeline's real inter-net shapes
    (engine/pipelines.py)."""
    import jax

    def s(*shp):
        return jax.ShapeDtypeStruct(shp, dt)

    if family == "v4":
        return (
            {"in0": s(B, ph, pw, 3), "in1": s(B, ph, pw, 3),
             "in2": s(B, ph, pw, 1)},
            ["out0"],
        )
    if net == "flownet":
        return (
            {"input0": s(B, ph, pw, 3), "input1": s(B, ph, pw, 3)},
            ["flow"],
        )
    # v2 flownet emits flow at HALF resolution (ConvTranspose_193 ->
    # Add_196); contextnet/fusionnet consume it there
    if net == "contextnet":
        flow_c = 2 if family == "v2" else 4
        return (
            {"input.1": s(B, ph, pw, 3),
             "flow.0": s(B, ph // 2, pw // 2, flow_c)},
            ["f1", "f2", "f3", "f4"],
        )
    # fusionnet: img0/img1 full res, half-res flow, ctx features f1..f4 x2
    # (contextnet emits f_k at 1/4..1/32 of full resolution)
    ins = {"img0": s(B, ph, pw, 3), "img1": s(B, ph, pw, 3),
           "flow": s(B, ph // 2, pw // 2, 4 if family == "v2" else 2)}
    for i in range(8):
        c = [32, 64, 128, 256][i % 4]
        sc = 2 ** (2 + i % 4)
        ins[str(3 + i)] = s(B, ph // sc, pw // sc, c)
    return ins, ["output"]


def main():
    from rife_tpu.engine.session import RIFE, pad_to
    from rife_tpu.graph import layout as L
    from rife_tpu.graph.executor import RegionExecutor

    model = sys.argv[1] if len(sys.argv) > 1 else "rife-v4.6"
    hw = sys.argv[2] if len(sys.argv) > 2 else "1080x1920"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    H, W = (int(v) for v in hw.split("x"))
    ph, pw = pad_to(H), pad_to(W)

    s = RIFE(model, dtype="bfloat16")
    cfg = s.cfg
    for name, ex in s.executors.items():
        if not isinstance(ex, RegionExecutor):
            # CPU sessions build plain Executors; rebuild for planning only
            from rife_tpu.graph.executor import RegionExecutor as RE
            from rife_tpu.ops import jax_ops, planar_ops

            ex = RE(ex.graph, jax_ops.OP_TABLE,
                    planar_ops.OP_TABLE_PLANAR, ex.raw_weights,
                    ctx={**ex.ctx, "use_pallas_warp": True})
        inputs, outs = _net_io(cfg.family, name, B, ph, pw, cfg.jdtype)
        planar_out = frozenset(("out0",)) if cfg.family == "v4" else frozenset()
        ctx = {**ex.ctx, "w": s.weights[name], "planar_outputs": planar_out}
        try:
            shapes = ex._blob_shapes(inputs, outs, {**ctx, "use_pallas_warp":
                                                    False})
        except Exception as e:  # noqa: BLE001 - inspection tool
            print(f"== {name}: shape pass failed: {e!r}")
            continue
        needed = ex.graph.required_nodes(outs, list(inputs))
        plan = L.plan_layouts(ex.graph, needed, shapes, ctx, outs,
                              {b: L.NCHW for b in planar_out})

        prod_layout = {n: L.NHWC for n in inputs}
        for i in needed:
            node = ex.graph.nodes[i]
            if node.type == "Split":
                for t in node.tops:
                    prod_layout[t] = prod_layout.get(node.bottoms[0], L.NHWC)
                continue
            for t in node.tops:
                prod_layout[t] = plan[i] if node.type != "Input" else L.NHWC

        n_p = sum(1 for i in needed if plan[i] == L.NCHW)
        print(f"== {name} {H}x{W} B={B}: {n_p}/{len(needed)} nodes planar")
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
                        f"  CONVERT {b:14s} {str(shp):26s} "
                        f"{prod_layout.get(b)}->{plan[i]}  at {node.type} "
                        f"{node.name}  ({sz / 1e6:.1f} MB)"
                    )
        print(f"  total conversion traffic ~{2 * conv_bytes / 1e9:.2f} GB (r+w)")
        print("  planar nodes:")
        for i in needed:
            if plan[i] == L.NCHW:
                node = ex.graph.nodes[i]
                shp = shapes.get(node.tops[0])
                print(f"    {node.type:16s} {node.name:20s} out={shp}")


if __name__ == "__main__":
    main()
