"""Exact graph rewrites for TPU execution.

The v4-family flownet warps the FULL-RESOLUTION input frames at every
pyramid level and immediately bilinear-downscales the warped images to the
level's working resolution (e.g. rife-v4.6 block1: ``rife.Warp warp_0/1``
-> ``Concat cat_3`` -> ``Interp upsample_12`` at scale 1/4,
/root/reference/models/rife-v4.6/flownet.param:55-61).  On the reference's
GPU the warp is a cheap texture gather, so the wasted full-res warp is
free; on TPU the warp is the single most expensive op in the graph, and at
scale 1/4 the downscale reads only rows/cols {4i+1, 4i+2} of it — half of
the warped pixels are never used, and the used ones are needed only in
2x2-average pairs.

``fuse_quarter_downscaled_warps`` rewrites, bit-exactly:

* R1  ``Interp(1/4, bilinear)(Concat(xs))`` -> ``Concat(Interp(1/4)(x))``
      (bilinear resize is channelwise, so this is exact) — this exposes
      per-input Interp(Warp) pairs;
* R2  ``Interp(1/4, bilinear)(rife.Warp(img, flow))`` -> a single
      ``rife.WarpDs4(img, flow)`` node; ``Interp(1/2, ...)`` pairs ->
      ``rife.WarpDs2`` (every warped pixel is still gathered, but the
      Pallas kernel accumulates the four 2x2 phases straight into the
      half-res output — no full-res HBM tensor, no separate resize).

``rife.WarpDs4`` (ops.jax_ops._op_warp_ds4) evaluates the warp only on the
compacted half-resolution tap grid rows/cols {4i+1, 4i+2} (passing the
ABSOLUTE sample positions tap+flow(tap) so the float math is bit-identical
to the full-res warp at those pixels) and then applies the same exact
half-pixel 2x downsample step the Interp path uses — the result is
bit-identical to warp-then-downscale while doing ~4x less gather work.

Both rewrites only fire when the rewritten blob has exactly one consumer
and is not a graph output that callers can extract (the executor treats
any blob as extractable, so callers of the rewritten graph must only
extract blobs that still exist — the v4 pipelines extract flow taps and
out0, which are untouched).  R1 deletes the dead original Concat (keeping
it would keep counting it as a consumer of the warp blobs and block R2's
single-consumer guard); dead Warp producers are left in the node list —
the executor's demand-driven traversal never runs them.
"""

from __future__ import annotations

from typing import Dict, List

from .ir import Graph, LayerNode


def _rebuild(nodes: List[LayerNode], input_blobs: List[str]) -> Graph:
    producer = {}
    for idx, node in enumerate(nodes):
        for slot, top in enumerate(node.tops):
            producer[top] = (idx, slot)
    return Graph(nodes=nodes, producer=producer, input_blobs=input_blobs)


def _consumer_counts(nodes: List[LayerNode]) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for node in nodes:
        for b in node.bottoms:
            counts[b] = counts.get(b, 0) + 1
    return counts


def _downscale_bilinear(node: LayerNode):
    """Scale factor (0.25 or 0.5) for a plain bilinear downscale Interp,
    else None."""
    if (
        node.type == "Interp"
        and int(node.p(0, 0)) == 2
        and int(node.p(3, 0)) == 0
        and int(node.p(4, 0)) == 0
        and len(node.bottoms) == 1
        and float(node.p(1, 0.0)) == float(node.p(2, 0.0))
    ):
        s = float(node.p(1, 0.0))
        if s in (0.25, 0.5):
            return s
    return None


def fuse_prelu_activations(
    graph: Graph, raw_weights, protected: frozenset = frozenset()
):
    """Fold single-consumer PReLU nodes into their producing Convolution/
    Deconvolution as fused activation ``ACT_PRELU_CH`` (params[9] = 100),
    the slope riding the conv's LayerWeights.

    The zoo's v1/v2/v3/v4.0 graphs express every conv activation as a
    separate PReLU node (e.g. /root/reference/models/rife-v2.3/
    flownet.param — 32 of them), i.e. one full read+write round trip over
    the activation tensor per conv; v4.6 already fuses its leaky relus into
    the conv line (flownet.param:11 ``9=2``).  On the Pallas planar conv
    path the fused form also applies the activation on the f32 accumulator
    before the storage-dtype cast (one rounding instead of two).

    Returns ``(graph, weights)``; both are new objects sharing unmodified
    entries.  Pairs whose intermediate blob is ``protected`` (extractable
    by pipelines) or has more than one consumer are left alone.
    """
    import dataclasses

    counts = _consumer_counts(graph.nodes)
    producer_idx = {}
    for idx, node in enumerate(graph.nodes):
        for top in node.tops:
            producer_idx[top] = idx
    nodes = list(graph.nodes)
    weights = dict(raw_weights)
    dead: set = set()
    for i, node in enumerate(nodes):
        if node.type != "PReLU":
            continue
        src = node.bottoms[0]
        if counts.get(src, 0) != 1 or src in protected:
            continue
        pidx = producer_idx.get(src)
        if pidx is None:
            continue
        p = nodes[pidx]
        if p.type not in ("Convolution", "Deconvolution"):
            continue
        if int(p.p(9, 0)) != 0:
            continue  # already has a fused activation
        lw = weights.get(node.name)
        plw = weights.get(p.name)
        if lw is None or lw.slope is None or plw is None:
            continue
        nodes[pidx] = LayerNode(
            p.type, p.name, list(p.bottoms), list(node.tops),
            {**p.params, 9: 100},
        )
        weights[p.name] = dataclasses.replace(plw, slope=lw.slope)
        dead.add(i)
    if not dead:
        return graph, raw_weights
    nodes = [n for i, n in enumerate(nodes) if i not in dead]
    return _rebuild(nodes, list(graph.input_blobs)), weights


def fuse_concat_into_convs(
    graph: Graph, protected: frozenset = frozenset()
) -> Graph:
    """Replace ``Convolution(Concat(parts...))`` (channel-axis concat with
    a single consumer, 3x3 stride-2 conv) with one ``ConvolutionCat`` node
    whose bottoms are the parts.

    Every pyramid block of the zoo's flownets starts exactly this way —
    e.g. the v4 IFBlock encoders consume concat(warped0, warped1, timestep,
    mask, flow) (/root/reference/models/rife-v4.6/flownet.param:166) and
    the v2 blocks concat(img0, img1, flow) — and on TPU the materialized
    narrow concat is pure HBM traffic (42.7 ms of the B=24 v4.6 NHWC step
    for the 12ch one).  The planar op table feeds the parts straight into
    the direct stride-2 kernel's band slots; the NHWC table concatenates
    and delegates (identical semantics, so the rewrite is always safe).
    """
    counts = _consumer_counts(graph.nodes)
    producer_idx = {}
    for idx, node in enumerate(graph.nodes):
        for top in node.tops:
            producer_idx[top] = idx
    nodes = list(graph.nodes)
    dead: set = set()
    changed = False
    for i, node in enumerate(nodes):
        if node.type != "Convolution":
            continue
        _, k, dilation, stride, pad, _ = (
            int(node.p(0)), int(node.p(1)), int(node.p(2, 1)),
            int(node.p(3, 1)), int(node.p(4, 0)), int(node.p(5, 0)),
        )
        if (k, dilation, stride, pad) != (3, 1, 2, 1):
            continue
        src = node.bottoms[0]
        if counts.get(src, 0) != 1 or src in protected:
            continue
        pidx = producer_idx.get(src)
        if pidx is None:
            continue
        p = nodes[pidx]
        if p.type != "Concat" or int(p.p(0, 0)) != 0 or len(p.bottoms) < 2:
            continue
        nodes[i] = LayerNode(
            "ConvolutionCat", node.name, list(p.bottoms), list(node.tops),
            dict(node.params),
        )
        dead.add(pidx)
        changed = True
    if not changed:
        return graph
    nodes = [n for i, n in enumerate(nodes) if i not in dead]
    return _rebuild(nodes, list(graph.input_blobs))


def fuse_pixelshuffle_into_convs(
    graph: Graph, protected: frozenset = frozenset()
) -> Graph:
    """Replace ``PixelShuffle(r=2)(Convolution|Deconvolution)`` with a single
    ``rife.ConvPS`` / ``rife.DeconvPS`` node (conv params preserved; the
    shuffle factor rides param key 25, unused by ncnn conv layers).

    Every zoo graph ends its decoder this way — the v4 block tails
    ``Deconvolution(4x4 s2, 24ch) -> PixelShuffle(2) -> flow``
    (/root/reference/models/rife-v4.6/flownet.param:45-46) and the v1-family
    ``Convolution(3x3, 8-16ch) -> PixelShuffle(2)``
    (/root/reference/models/rife/flownet.param:77-78).  On the NHWC table the
    fused node just composes the two ops (identical semantics, so the rewrite
    is always safe); on the planar table the shuffle's channel regrouping is
    baked into the conv's OUTPUT-CHANNEL ORDER (a weight permutation, done
    once), which turns the H interleave into a free BHCW reshape and
    collapses the deconv phase interleave + full-res PixelShuffle relayout
    into one lane interleave (ops/conv_planar.py deconv_ps_planar).
    """
    counts = _consumer_counts(graph.nodes)
    producer_idx = {}
    for idx, node in enumerate(graph.nodes):
        for top in node.tops:
            producer_idx[top] = idx
    nodes = list(graph.nodes)
    dead: set = set()
    changed = False
    for i, node in enumerate(nodes):
        if node.type != "PixelShuffle" or int(node.p(0, 1)) != 2:
            continue
        src = node.bottoms[0]
        if counts.get(src, 0) != 1 or src in protected:
            continue
        pidx = producer_idx.get(src)
        if pidx is None:
            continue
        p = nodes[pidx]
        if p.type == "Convolution":
            fused = "rife.ConvPS"
        elif p.type == "Deconvolution":
            _, k, _, stride, pad, _ = (
                int(p.p(0)), int(p.p(1)), int(p.p(2, 1)),
                int(p.p(3, 1)), int(p.p(4, 0)), int(p.p(5, 0)),
            )
            if (k, stride, pad) != (4, 2, 1):
                continue  # planar phase decomposition assumes this geometry
            fused = "rife.DeconvPS"
        else:
            continue
        if int(p.p(0, 0)) % 4:
            continue  # out channels must split into r*r groups
        nodes[pidx] = LayerNode(
            fused, p.name, list(p.bottoms), list(node.tops),
            {**p.params, 25: 2},
        )
        dead.add(i)
        changed = True
    if not changed:
        return graph
    nodes = [n for i, n in enumerate(nodes) if i not in dead]
    return _rebuild(nodes, list(graph.input_blobs))


def fuse_quarter_downscaled_warps(
    graph: Graph, protected: frozenset = frozenset(),
    fuse_half: bool = True,
) -> Graph:
    """Apply R1 + R2 until fixpoint.  Returns a new Graph (shares nodes that
    were not rewritten); no weighted layer is added or removed.

    ``protected`` is the set of blob names callers may extract from the
    rewritten graph (flow taps, net outputs): a rewrite that would consume
    one of those blobs is skipped, so extraction stays safe by construction
    instead of by the convention that pipelines only pull taps/outputs."""
    nodes = list(graph.nodes)
    changed = True
    n_rewrites = 0
    while changed:
        changed = False
        counts = _consumer_counts(nodes)
        producer = {}
        for idx, node in enumerate(nodes):
            for top in node.tops:
                producer[top] = idx
        for i, node in enumerate(nodes):
            scale = _downscale_bilinear(node)
            if scale is None:
                continue
            src = node.bottoms[0]
            if src not in producer or counts.get(src, 0) != 1:
                continue
            if src in protected:
                continue
            p = nodes[producer[src]]
            if p.type == "Concat" and len(p.tops) == 1 and int(
                p.p(0, 0)
            ) == 0 and any(  # channel-axis concat only: resize is channelwise
                b in producer
                and nodes[producer[b]].type == "rife.Warp"
                and counts.get(b, 0) == 1
                for b in p.bottoms
            ):
                # R1: split the downscale across the concat inputs
                new: List[LayerNode] = []
                parts = []
                for k, x in enumerate(p.bottoms):
                    blob = f"{node.tops[0]}__part{k}"
                    new.append(LayerNode(
                        "Interp", f"{node.name}__part{k}", [x], [blob],
                        dict(node.params),
                    ))
                    parts.append(blob)
                new.append(LayerNode(
                    "Concat", f"{node.name}__cat", parts, [node.tops[0]],
                    dict(p.params),
                ))
                nodes[i : i + 1] = new
                # drop the now-dead original Concat: leaving it in would keep
                # counting it as a consumer of the warp blobs and block R2's
                # single-consumer guard forever.  Its top (``src``) loses its
                # producer — legal because this rewrite only fired when that
                # blob had exactly one consumer (the Interp just replaced).
                idx_p = producer[src]
                assert idx_p < i  # param files are topological
                del nodes[idx_p]
                n_rewrites += 1
                changed = True
                break
            if (p.type == "rife.Warp" and len(p.bottoms) == 2
                    and (scale == 0.25 or (scale == 0.5 and fuse_half))):
                # R2: 1/4 -> compacted tap-grid warp (rife.WarpDs4 — the
                # downsample reads only rows/cols {4i+1,4i+2}, so half the
                # gathers disappear); 1/2 -> phase-accumulated warp
                # (rife.WarpDs2 — every pixel is read, but the full-res
                # warped tensor never materializes in HBM and the separate
                # resize pass disappears)
                ttype = "rife.WarpDs4" if scale == 0.25 else "rife.WarpDs2"
                nodes[i] = LayerNode(
                    ttype, f"{node.name}__fused",
                    list(p.bottoms), list(node.tops), {},
                )
                n_rewrites += 1
                changed = True
                break
    if n_rewrites == 0:
        return graph
    return _rebuild(nodes, list(graph.input_blobs))
