"""Graph executor — the TPU-native replacement for ncnn::Net/Extractor.

A single topological interpreter drives either backend:

* the JAX op table (``rife_tpu.ops.jax_ops``) — traced under ``jax.jit`` this
  flattens the whole model into one XLA program (the reference records one
  Vulkan command buffer per frame, /root/reference/src/rife.cpp:1196; here the
  compiler sees everything at once and fuses across layer boundaries);
* the NumPy oracle (``rife_tpu.ops.numpy_ref``) for tests.

``Executor.run`` mirrors ncnn Extractor semantics: callers provide input
blobs (any blob may be pinned, not just graph inputs — the v4 TTA pyramid
re-injects flow0..flow3 exactly this way, /root/reference/src/rife.cpp:2657-2669)
and request any named blobs as outputs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence

from .ir import Graph
from .weights import LayerWeights


class Executor:
    def __init__(
        self,
        graph: Graph,
        op_table: Mapping[str, Any],
        raw_weights: Mapping[str, LayerWeights],
        ctx: Dict[str, Any] | None = None,
    ):
        self.graph = graph
        self.op_table = op_table
        self.raw_weights = raw_weights
        self.ctx = ctx or {}

    def run(
        self,
        inputs: Mapping[str, Any],
        outputs: Sequence[str],
        ctx: Dict[str, Any] | None = None,
    ) -> List[Any]:
        """Execute; ``ctx`` entries override the constructor context (lets
        jitted callers pass the prepared weight pytree as a traced argument
        instead of baking it into the program as constants)."""
        ctx = {**self.ctx, **ctx} if ctx else self.ctx
        blobs: Dict[str, Any] = dict(inputs)
        rec = ctx.get("_record_shapes")  # layout planner's abstract pass
        if rec is not None:
            for k, v in blobs.items():
                if hasattr(v, "shape"):
                    rec[k] = tuple(v.shape)
        needed = self.graph.required_nodes(outputs, list(inputs.keys()))
        for idx in needed:
            node = self.graph.nodes[idx]
            if node.type == "Input":
                if node.tops[0] not in blobs:
                    raise KeyError(f"graph input {node.tops[0]!r} not provided")
                continue
            # a node may be "needed" while all its tops are already pinned
            if all(t in blobs for t in node.tops):
                continue
            fn = self.op_table.get(node.type)
            if fn is None:
                raise NotImplementedError(f"layer type {node.type!r}")
            ins = [blobs[b] for b in node.bottoms]
            outs = fn(node, ins, self.raw_weights.get(node.name), ctx)
            if len(outs) != len(node.tops):
                raise RuntimeError(
                    f"{node.type} {node.name}: produced {len(outs)} outputs, "
                    f"graph expects {len(node.tops)}"
                )
            for top, val in zip(node.tops, outs):
                if top not in blobs:  # pinned blobs always win
                    blobs[top] = val
                    if rec is not None and hasattr(val, "shape"):
                        rec[top] = tuple(val.shape)
        return [blobs[b] for b in outputs]


class RegionExecutor(Executor):
    """Executor with region-level layout planning (graph/layout.py).

    Each node is assigned 'nhwc' (XLA's conv-friendly layout) or 'nchw'
    (planes: W on lanes, no channel lane-padding) by a planning pass over
    recorded blob shapes; chains of narrow-channel ops then execute as
    planes end-to-end with layout conversions only at region boundaries.
    This is what makes the planar kernels win: round-2 measured both
    whole-net planar and per-op escape NET-NEGATIVE because every op/net
    boundary re-materialized the lane-padded NHWC buffers the kernels avoid
    (BASELINE.md "Planar integration: measured and rejected as default").

    Blobs are stored in their producing node's layout; a per-blob converted
    copy is cached so a blob consumed by both layouts transposes once.
    Callers keep the NHWC convention at the boundary unless
    ``ctx['planar_outputs']`` (a set of blob names) asks for planes.
    """

    planar_capable = True  # callers may request planar outputs

    def __init__(self, graph, op_table, planar_table, raw_weights, ctx=None):
        super().__init__(graph, op_table, raw_weights, ctx)
        self.planar_table = planar_table
        self._shape_cache: Dict = {}

    def _blob_shapes(self, inputs, outputs, ctx):
        import jax

        key = (
            tuple(sorted(
                (k, tuple(v.shape), str(getattr(v, "dtype", "")))
                for k, v in inputs.items() if hasattr(v, "shape")
            )),
            tuple(outputs),
        )
        cached = self._shape_cache.get(key)
        if cached is not None:
            return cached
        rec: Dict[str, tuple] = {}
        ctx2 = {**ctx, "_record_shapes": rec}
        abstract = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            if hasattr(v, "shape") else v
            for k, v in inputs.items()
        }
        jax.eval_shape(
            lambda ins: Executor.run(self, ins, outputs, ctx2), abstract
        )
        self._shape_cache[key] = rec
        return rec

    def run(self, inputs, outputs, ctx=None):
        from . import layout as L

        ctx = {**self.ctx, **ctx} if ctx else dict(self.ctx)
        shapes = self._blob_shapes(inputs, outputs, ctx)
        needed = self.graph.required_nodes(outputs, list(inputs.keys()))
        planar_out = ctx.get("planar_outputs") or ()
        plan = L.plan_layouts(
            self.graph, needed, shapes, ctx, outputs,
            {b: L.NCHW for b in planar_out},
        )

        blobs: Dict[str, Any] = dict(inputs)
        cur: Dict[str, str] = {k: L.NHWC for k in inputs}
        alt: Dict[str, Any] = {}  # converted copies, one per blob max

        def get(b, want):
            if cur[b] == want:
                return blobs[b]
            hit = alt.get(b)
            if hit is None:
                v = blobs[b]
                if getattr(v, "ndim", 0) == 4:
                    # NHWC (B,H,W,C) <-> planar BHCW (B,H,C,W): swap the
                    # last two dims (both directions are the same permute)
                    v = v.transpose(0, 1, 3, 2)
                alt[b] = v
                hit = v
            return hit

        for idx in needed:
            node = self.graph.nodes[idx]
            if node.type == "Input":
                if node.tops[0] not in blobs:
                    raise KeyError(f"graph input {node.tops[0]!r} not provided")
                continue
            if all(t in blobs for t in node.tops):
                continue
            if node.type == "Split":
                # layout-transparent: copy in whatever layout the source is
                # stored — consumers convert lazily (and XLA CSE dedupes
                # identical transposes of the same value)
                src = node.bottoms[0]
                for top in node.tops:
                    if top not in blobs:
                        blobs[top] = blobs[src]
                        cur[top] = cur[src]
                continue
            lay = plan[idx]
            table = self.planar_table if lay == L.NCHW else self.op_table
            fn = table.get(node.type)
            if fn is None:
                raise NotImplementedError(f"layer type {node.type!r}")
            ins = [get(b, lay) for b in node.bottoms]
            outs = fn(node, ins, self.raw_weights.get(node.name), ctx)
            if len(outs) != len(node.tops):
                raise RuntimeError(
                    f"{node.type} {node.name}: produced {len(outs)} outputs, "
                    f"graph expects {len(node.tops)}"
                )
            for top, val in zip(node.tops, outs):
                if top not in blobs:
                    blobs[top] = val
                    cur[top] = lay
        return [
            get(b, L.NCHW if b in planar_out else L.NHWC) for b in outputs
        ]


class PlanarExecutor(Executor):
    """Executor whose blobs are carried as (B, H, C, W) planes internally.

    Callers keep the NHWC convention at the boundary: 4D inputs are
    transposed to BHCW on entry and extracted blobs back to NHWC on
    exit.  The op table must be ``planar_ops.OP_TABLE_PLANAR``.  Why: on
    TPU, XLA lane-pads feature-minor narrow-channel tensors to 128 — the
    planar table keeps W on lanes and routes narrow convs to the Pallas
    planar kernel, whose native layout is BHCW (see ops/planar_ops.py,
    ops/conv_planar.py).  Blobs named in ``ctx['planar_outputs']`` skip the
    exit conversion and come back as planes (the v4 render path hands them
    straight to frame.postprocess_planar).
    """

    planar_capable = True  # callers may request planar outputs

    def run(self, inputs, outputs, ctx=None):
        merged = {**self.ctx, **ctx} if ctx else self.ctx
        planar_out = merged.get("planar_outputs") or ()
        pin = {
            k: (v.transpose(0, 1, 3, 2) if getattr(v, "ndim", 0) == 4
                else v)
            for k, v in inputs.items()
        }
        outs = super().run(pin, outputs, ctx)
        return [
            o.transpose(0, 1, 3, 2)
            if getattr(o, "ndim", 0) == 4 and b not in planar_out else o
            for b, o in zip(outputs, outs)
        ]
