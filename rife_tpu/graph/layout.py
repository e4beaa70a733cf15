"""Region-level layout planning over the graph IR.

Why this pass exists: XLA:TPU stores conv-adjacent tensors feature-minor and
lane-pads the channel dimension to 128.  For the zoo's narrow-channel layers
(3-32 channels at up to 1088x1920) that is 4-40x HBM bloat, and it dominated
the measured v4.6 step (BASELINE.md "Conv/layout floor analysis": the 12ch
concats alone were ~43+46 ms of a 519 ms B=24 step).  Round-2 tried two
integration modes and both lost: whole-net planar execution pays boundary
transposes at every net edge, and per-op escape pays them at every op edge,
because the NEIGHBORING XLA ops still anchor feature-minor layouts.

The fix is planning whole REGIONS: every node gets a layout ('nhwc' or
'nchw' planes), chosen so that chains of narrow ops run planar end-to-end
and layout conversions only happen at region boundaries (entry into wide
convs, exit from narrow decoders).  Anchors constrain the plan; everything
else follows its consumers:

* ``rife.Warp``/``rife.WarpDs4`` with the Pallas kernel -> 'nchw' (the
  kernels operate plane-wise natively; NHWC in/out was pure transpose tax);
* Convolution/Deconvolution -> 'nchw' where the planar Pallas conv is
  measured faster than the XLA conv (narrow channels at big resolutions,
  gates shared with ops.planar_ops), else 'nhwc' (XLA's MXU conv);
* flexible ops (elementwise, concat/slice/crop, resize, pixelshuffle...)
  adopt the layout of their consumers (reverse-topological vote, majority
  on mixed consumers) so no conversion happens inside a region.

The reference counterpart of the regions this pass targets: the v4 block
encoders and final render (/root/reference/models/rife-v4.6/flownet.param:
166-217) and the v2 full-resolution fusionnet U-Net
(/root/reference/models/rife-v2.3/fusionnet.param:62-74).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

from .ir import Graph

NHWC = "nhwc"
NCHW = "nchw"


def _conv_constraint(node, shapes, ctx) -> str:
    """Convs are anchors: they run either on the planar Pallas kernel
    ('nchw') or the XLA NHWC conv — both sides materialize their operands,
    so the layout is a hard requirement, not a preference."""
    from ..ops import planar_ops as P

    if not ctx.get("use_pallas_warp"):
        return NHWC
    xs = shapes.get(node.bottoms[0])
    ys = shapes.get(node.tops[0])
    if xs is None or ys is None or len(xs) != 4:
        return NHWC
    h, w, cin = xs[1], xs[2], xs[3]
    cout = ys[3]
    # Which convs anchor planar, learned from the round-4 per-op traces
    # (BASELINE.md): a planar conv only wins IN-PROGRAM when it ABSORBS a
    # materialization its NHWC form would pay anyway — the block-entry
    # concat relayout (ConvolutionCat: 15.9 ms planar vs 33.2 ms NHWC
    # copy+conv at B=24 1080p) or the PixelShuffle interleave copy chain
    # (rife.DeconvPS: kills ~20 ms of pure data-formatting copies).  Plain
    # convs measured NET-NEGATIVE as planar anchors (37.5 ms of planar
    # convs replacing ~26 ms of XLA convs — the round-3 'anchor inversion',
    # now understood): they pay the operand pads and lose the MXU conv
    # stream without absorbing anything.  Hence the split defaults:
    # absorbers anchor by default, plain convs only with
    # RIFE_TPU_LAYOUT_CONV/_DECONV=1.
    if node.type in ("rife.ConvPS", "rife.DeconvPS"):
        # ys is the POST-shuffle shape; the gate needs the conv's own cout
        cout = cout * int(node.p(25, 2)) ** 2
        gate = (P.deconv_wants_planar if node.type == "rife.DeconvPS"
                else P.conv_wants_planar)
        ok = ctx.get("layout_planar_ps_conv", True) and gate(
            node, h, w, cin, cout, ctx)
    elif node.type == "ConvolutionCat":
        # parts concat on channels: the gate needs the TOTAL cin
        cs = [shapes.get(b) for b in node.bottoms]
        if any(s is None or len(s) != 4 for s in cs):
            return NHWC
        cin = sum(s[3] for s in cs)
        ok = ctx.get("layout_planar_cat", True) and P.conv_wants_planar(
            node, h, w, cin, cout, ctx)
    elif node.type == "Convolution":
        ok = ctx.get("layout_planar_conv", False) and P.conv_wants_planar(
            node, h, w, cin, cout, ctx)
    else:
        ok = ctx.get("layout_planar_deconv", False) and P.deconv_wants_planar(
            node, h, w, cin, cout, ctx)
    return NCHW if ok else NHWC


def _warp_constraint(node, shapes, ctx) -> str | None:
    """Pallas-eligible warps prefer planes (the kernels pack/emit per-channel
    planes either way; planar just skips the boundary transposes)."""
    if not ctx.get("use_pallas_warp"):
        return None  # XLA gather fallback: flexible
    from ..ops.warp_pallas import fits_vmem

    xs = shapes.get(node.bottoms[0])
    if xs is None or len(xs) != 4:
        return None
    u8 = (
        not ctx.get("no_u8_warp")
        and xs[3] <= 4
        and node.bottoms[0] in ctx.get("u8_image_blobs", ())
    )
    if u8 or fits_vmem(xs[1], xs[2]):
        return NCHW
    return None


# ops whose results MATERIALIZE in HBM (multi-op phase decompositions,
# interleaves, concatenations) as opposed to elementwise ops XLA fuses into
# their neighbours.  For these, a narrow-channel big-resolution result in
# NHWC is a guaranteed lane-padded buffer, so they intrinsically prefer
# planes regardless of what their consumers do.
_MATERIALIZING = ("Interp", "PixelShuffle", "Concat", "Eltwise")


def _narrow_big(node, shapes, thresh: int) -> bool:
    for b in (*node.bottoms, *node.tops):
        s = shapes.get(b)
        if s is not None and len(s) == 4 and s[3] <= 8 \
                and s[1] * s[2] >= thresh:
            return True
    return False


def plan_layouts(
    graph: Graph,
    needed: Sequence[int],
    shapes: Mapping[str, Tuple[int, ...]],
    ctx: Mapping,
    outputs: Sequence[str],
    out_layouts: Mapping[str, str] | None = None,
) -> Dict[int, str]:
    """Assign a layout to every node in ``needed``.

    ``shapes`` maps blob name -> NHWC-convention shape tuple (recorded by an
    abstract forward pass).  ``out_layouts`` overrides the boundary layout of
    requested ``outputs`` (default 'nhwc').

    Rules, in priority order:
    1. anchors (convs/deconvs/Pallas warps) are constrained (see above);
    2. Split is transparent: it copies whatever layout its input has; for
       voting it takes its consumers' majority, and the executor never
       converts for it;
    3. materializing ops touching a narrow-big tensor (C<=8 at >=400k px)
       intrinsically prefer planes — their NHWC form lane-pads 16-42x;
    4. everything else follows its consumers + constrained producers
       (strict majority for planes, ties resolve NHWC: the fusion-friendly
       status quo).
    """
    nodes = graph.nodes
    consumers: Dict[str, List[int]] = {}
    for i in needed:
        for b in nodes[i].bottoms:
            consumers.setdefault(b, []).append(i)
    out_map = {b: NHWC for b in outputs}
    if out_layouts:
        out_map.update(out_layouts)
    thresh = int(ctx.get("layout_narrow_min_hw", 400_000))
    producer = graph.producer

    layout: Dict[int, str] = {}

    def consumer_votes(node) -> List[str]:
        votes: List[str] = []
        for t in node.tops:
            if t in out_map:
                votes.append(out_map[t])
            for cidx in consumers.get(t, ()):
                votes.append(layout.get(cidx, NHWC))
        return votes

    for i in reversed(list(needed)):
        node = nodes[i]
        if node.type == "Input":
            layout[i] = NHWC
            continue
        if node.type in ("Convolution", "ConvolutionCat", "Deconvolution",
                         "rife.ConvPS", "rife.DeconvPS"):
            layout[i] = _conv_constraint(node, shapes, ctx)
            continue
        if node.type in ("rife.Warp", "rife.WarpDs4", "rife.WarpDs2",
                         "rife.WarpPair", "rife.WarpDs4Pair",
                         "rife.RenderBlend"):
            req = _warp_constraint(node, shapes, ctx)
            if req is not None:
                layout[i] = req
                continue
        if node.type == "Split":
            votes = consumer_votes(node)
            n_p = votes.count(NCHW)
            layout[i] = NCHW if n_p * 2 > len(votes) else NHWC
            continue
        if node.type in _MATERIALIZING and _narrow_big(node, shapes, thresh):
            # PixelShuffle's planar interleave measured SLOWER than its
            # lane-padded NHWC form (14.2 vs 8.3 ms on the v4.6 step,
            # BASELINE.md round-3 region-leak attribution) — overridable
            # while the planar interleave is unfixed
            if node.type == "PixelShuffle" and not ctx.get(
                    "layout_planar_ps", True):
                pass
            else:
                layout[i] = NCHW
                continue
        votes = consumer_votes(node)
        # constrained producers pull too: converting INTO a chain that a
        # wide conv feeds rips the conv-epilogue fusion (the round-2
        # whole-net trap); their vote keeps single elementwise ops home
        for b in node.bottoms:
            p = producer.get(b)
            if p is not None:
                pnode = nodes[p[0]]
                if pnode.type in ("Convolution", "ConvolutionCat",
                                  "Deconvolution", "rife.ConvPS",
                                  "rife.DeconvPS"):
                    votes.append(_conv_constraint(pnode, shapes, ctx))
        n_p = votes.count(NCHW)
        layout[i] = NCHW if n_p * 2 > len(votes) else NHWC
    return layout
