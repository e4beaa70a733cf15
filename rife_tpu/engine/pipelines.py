"""End-to-end forward pipelines for all model families and TTA modes.

These are pure JAX functions (traced once per static shape under jit); each
mirrors one control-flow variant of the reference engine:

* v1/v2/v3:  /root/reference/src/rife.cpp:381-1212 (GPU ``RIFE::process``)
* v4:        /root/reference/src/rife.cpp:2462-3202 (``RIFE::process_v4``)

Structural divergences from the reference (all TPU-first, all
output-equivalent):

* the 8 spatial-TTA views ride a batch axis (two groups: canonical and
  transposed geometry) instead of 8 separate graph executions;
* the v4 TTA pyramid is unrolled via blob pinning, so XLA sees one fused
  program and the reference's ~4x prefix re-execution disappears;
* frame pairs are batched (leading B axis) — the TPU replacement for the
  reference's multiple proc threads per GPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..graph.executor import Executor
from ..ops import frame
from ..ops.jax_ops import resize2d


@dataclass(frozen=True)
class PipelineConfig:
    family: str  # "v1" | "v2" | "v4"
    tta_mode: bool = False
    tta_temporal_mode: bool = False
    uhd_mode: bool = False
    dtype: str = "float32"  # "float32" | "bfloat16"
    # extra executor-context overrides as (key, value) pairs (hashable so
    # the config stays a valid static jit argument); e.g. disabling the
    # Pallas warp for GSPMD spatial sharding
    extra_ctx: tuple = ()

    @property
    def jdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def _mkctx(cfg: "PipelineConfig", W, net: str):
    return {"w": W[net], **dict(cfg.extra_ctx)}


def _flatten_views(g):
    b, v, h, w, c = g.shape
    return g.reshape(b * v, h, w, c)


def _unflatten_views(x, b):
    bv, h, w, c = x.shape
    return x.reshape(b, bv // b, h, w, c)


# ---------------------------------------------------------------------------
# v1 / v2 / v3
# ---------------------------------------------------------------------------

def _run_flownet(ex: Executor, cfg, W, img0, img1, uhd: bool):
    """flow extraction incl. UHD mode: flow estimated at 0.5x and rescaled
    (/root/reference/src/rife.cpp:928-945)."""
    ctx = _mkctx(cfg, W, "flownet")
    if uhd:
        # resized frames are no longer u8-exact -> disable the u8 warp path
        ctx["no_u8_warp"] = True
        h, w = img0.shape[1], img0.shape[2]
        i0 = resize2d(img0, h // 2, w // 2)
        i1 = resize2d(img1, h // 2, w // 2)
        flow_ds = ex.run({"input0": i0, "input1": i1}, ["flow"], ctx)[0]
        flow_half = resize2d(flow_ds, flow_ds.shape[1] * 2, flow_ds.shape[2] * 2)
        return flow_half * jnp.asarray(2.0, flow_half.dtype)
    return ex.run({"input0": img0, "input1": img1}, ["flow"], ctx)[0]


def _run_contextnet(ex: Executor, cfg, W, img, flow_in, slot: int, v2: bool):
    """ctx features for one image; v2 feeds the sliced 2ch flow as flow.0,
    v1 feeds the full flow as flow.0 (slot 0) / flow.1 (slot 1)
    (/root/reference/src/rife.cpp:1018-1060)."""
    ctx = _mkctx(cfg, W, "contextnet")
    flow_name = "flow.0" if (v2 or slot == 0) else "flow.1"
    return ex.run(
        {"input.1": img, flow_name: flow_in}, ["f1", "f2", "f3", "f4"], ctx
    )


def _run_fusionnet(ex: Executor, cfg, W, img0, img1, flow, ctx0, ctx1):
    ctx = _mkctx(cfg, W, "fusionnet")
    inputs = {"img0": img0, "img1": img1, "flow": flow}
    for i, f in enumerate(list(ctx0) + list(ctx1)):
        inputs[str(3 + i)] = f
    return ex.run(inputs, ["output"], ctx)[0]


def _v1v2_core(nets, cfg: PipelineConfig, W, img0, img1):
    """Padded normalised frames -> padded output frame (one geometry)."""
    v2 = cfg.family == "v2"
    flow = _run_flownet(nets["flownet"], cfg, W, img0, img1, cfg.uhd_mode)
    flow_rev = None
    if cfg.tta_temporal_mode:
        flow_rev = _run_flownet(nets["flownet"], cfg, W, img1, img0, cfg.uhd_mode)
        if v2:
            flow, flow_rev = frame.flow_temporal_avg_v2(flow, flow_rev)
        else:
            flow, flow_rev = frame.flow_temporal_avg_v1(flow, flow_rev)
    return _v1v2_render(nets, cfg, W, img0, img1, flow, flow_rev)


def _v1v2_render(nets, cfg, W, img0, img1, flow, flow_rev):
    v2 = cfg.family == "v2"
    f0_in = flow[..., 0:2] if v2 else flow
    f1_in = flow[..., 2:4] if v2 else flow
    if v2:
        # both v2 context extractions feed the SAME input slot (flow.0) and
        # traverse the identical subgraph, so they ride one batched run —
        # half the kernel launches, per-sample math unchanged
        # (/root/reference/src/rife.cpp:1018-1060 runs them sequentially)
        b = img0.shape[0]
        ctx_b = _run_contextnet(
            nets["contextnet"], cfg, W,
            jnp.concatenate([img0, img1], axis=0),
            jnp.concatenate([f0_in, f1_in], axis=0), 0, v2,
        )
        ctx0 = [f[:b] for f in ctx_b]
        ctx1 = [f[b:] for f in ctx_b]
    else:
        ctx0 = _run_contextnet(nets["contextnet"], cfg, W, img0, f0_in, 0, v2)
        ctx1 = _run_contextnet(nets["contextnet"], cfg, W, img1, f1_in, 1, v2)
    out = _run_fusionnet(nets["fusionnet"], cfg, W, img0, img1, flow, ctx0, ctx1)
    if cfg.tta_temporal_mode:
        out_rev = _run_fusionnet(
            nets["fusionnet"], cfg, W, img1, img0, flow_rev, ctx1, ctx0
        )
        out = frame.out_temporal_avg(out, out_rev)
    return out


def forward_v1v2(nets, cfg: PipelineConfig, W, in0_u8, in1_u8, pad_h, pad_w):
    """u8 frames -> u8 interpolated midpoint frame (v1/v2/v3 families)."""
    h, w = in0_u8.shape[1], in0_u8.shape[2]
    img0 = frame.preprocess(in0_u8, pad_h, pad_w, cfg.jdtype)
    img1 = frame.preprocess(in1_u8, pad_h, pad_w, cfg.jdtype)

    if not cfg.tta_mode:
        out = _v1v2_core(nets, cfg, W, img0, img1)
        return frame.postprocess(out, h, w)

    # spatial TTA: views 0-3 canonical geometry, 4-7 transposed; each group
    # is one batched execution (rife.cpp:459-877 runs 8 separate graphs)
    b = img0.shape[0]
    g0a, g0b = frame.expand_views8(img0)
    g1a, g1b = frame.expand_views8(img1)

    def flow_of(ga_img0, ga_img1):
        return _unflatten_views(
            _run_flownet(
                nets["flownet"], cfg, W,
                _flatten_views(ga_img0), _flatten_views(ga_img1), cfg.uhd_mode,
            ),
            b,
        )

    flow_a, flow_b = flow_of(g0a, g1a), flow_of(g0b, g1b)
    flow_rev_a = flow_rev_b = None
    if cfg.tta_temporal_mode:
        flow_rev_a, flow_rev_b = flow_of(g1a, g0a), flow_of(g1b, g0b)
        merge = (
            frame.flow_temporal_avg_v2
            if cfg.family == "v2"
            else frame.flow_temporal_avg_v1
        )
        flow_a, flow_rev_a = merge(flow_a, flow_rev_a)
        flow_b, flow_rev_b = merge(flow_b, flow_rev_b)

    n_pairs = 2 if cfg.family == "v2" else 1
    flow_a, flow_b = frame.flow_views_avg(flow_a, flow_b, n_pairs, has_mask=False)
    if cfg.tta_temporal_mode:
        flow_rev_a, flow_rev_b = frame.flow_views_avg(
            flow_rev_a, flow_rev_b, n_pairs, has_mask=False
        )

    def render(i0g, i1g, fg, frg):
        out = _v1v2_render(
            nets, cfg, W,
            _flatten_views(i0g), _flatten_views(i1g),
            _flatten_views(fg),
            None if frg is None else _flatten_views(frg),
        )
        return _unflatten_views(out, b)

    out_a = render(g0a, g1a, flow_a, flow_rev_a)
    out_b = render(g0b, g1b, flow_b, flow_rev_b)
    merged = frame.merge_views8_mean(out_a, out_b)
    return frame.postprocess(merged, h, w)


# ---------------------------------------------------------------------------
# v4
# ---------------------------------------------------------------------------

V4_TAPS = ("flow0", "flow1", "flow2", "flow3")


def _v4_flow_pyramid(ex, cfg, W, i0, i1, tplane, pinned_prev):
    """Extract tap fi given pinned flow0..flow_{fi-1}
    (ncnn-Extractor re-injection, /root/reference/src/rife.cpp:2657-2669;
    here pinning means XLA never re-executes the prefix)."""
    ctx = _mkctx(cfg, W, "flownet")
    inputs = {"in0": i0, "in1": i1, "in2": tplane}
    inputs.update(pinned_prev)
    fi = len(pinned_prev)
    return ex.run(inputs, [V4_TAPS[fi]], ctx)[0]


def _v4_out(ex, cfg, W, i0, i1, tplane, pinned, planar_out=False):
    ctx = _mkctx(cfg, W, "flownet")
    if planar_out:
        # region-planar executor: keep the final render chain (warps, mask
        # blend — all 1-6 channels at full res) as planes and convert only
        # the u8 result (frame.postprocess_nchw)
        ctx["planar_outputs"] = frozenset(("out0",))
    inputs = {"in0": i0, "in1": i1, "in2": tplane}
    inputs.update(pinned)
    return ex.run(inputs, ["out0"], ctx)[0]


def forward_v4(nets, cfg: PipelineConfig, W, in0_u8, in1_u8, timestep, pad_h, pad_w):
    """u8 frames + per-item timestep (B,) -> u8 frame (v4 family)."""
    ex = nets["flownet"]
    h, w = in0_u8.shape[1], in0_u8.shape[2]
    b = in0_u8.shape[0]
    img0 = frame.preprocess(in0_u8, pad_h, pad_w, cfg.jdtype)
    img1 = frame.preprocess(in1_u8, pad_h, pad_w, cfg.jdtype)
    t = frame.timestep_plane(timestep, b, pad_h, pad_w, cfg.jdtype)

    if not cfg.tta_mode and not cfg.tta_temporal_mode:
        # plane-form out0 (ctx['planar_outputs']) whenever the executor can
        # honor it: region/planar executors natively, the flat executor via
        # the fused render node (graph/rewrite.py fuse_render_blend)
        planar = (getattr(ex, "planar_capable", False)
                  or getattr(ex, "render_planar", False))
        out = _v4_out(ex, cfg, W, img0, img1, t, {}, planar_out=planar)
        if planar:
            return frame.postprocess_planar(out, h, w)
        return frame.postprocess(out, h, w)

    if not cfg.tta_mode:
        # temporal only: level-wise fwd/rev extraction with per-level merge
        # (/root/reference/src/rife.cpp:3005-3132)
        t_rev = frame.timestep_plane(1.0 - timestep, b, pad_h, pad_w, cfg.jdtype)
        pinned, pinned_rev = {}, {}
        for fi, tap in enumerate(V4_TAPS):
            f = _v4_flow_pyramid(ex, cfg, W, img0, img1, t, pinned)
            fr = _v4_flow_pyramid(ex, cfg, W, img1, img0, t_rev, pinned_rev)
            f, fr = frame.flow_temporal_avg_v4(f, fr)
            pinned[tap] = f
            pinned_rev[tap] = fr
        out = _v4_out(ex, cfg, W, img0, img1, t, pinned)
        out_rev = _v4_out(ex, cfg, W, img1, img0, t_rev, pinned_rev)
        out = frame.out_temporal_avg(out, out_rev)
        return frame.postprocess(out, h, w)

    # spatial TTA (with optional temporal): views as batch groups
    g0a, g0b = frame.expand_views8(img0)
    g1a, g1b = frame.expand_views8(img1)
    ta = frame.timestep_plane(
        jnp.repeat(jnp.asarray(timestep).reshape(b), 4), b * 4, pad_h, pad_w, cfg.jdtype
    )
    tb = frame.timestep_plane(
        jnp.repeat(jnp.asarray(timestep).reshape(b), 4), b * 4, pad_w, pad_h, cfg.jdtype
    )

    def pyramid(i0g, i1g, tg, pinned_flat):
        return _v4_flow_pyramid(
            ex, cfg, W, _flatten_views(i0g), _flatten_views(i1g), tg, pinned_flat
        )

    pins_a, pins_b = {}, {}
    pins_rev_a, pins_rev_b = {}, {}
    if cfg.tta_temporal_mode:
        tra = frame.timestep_plane(
            jnp.repeat(1.0 - jnp.asarray(timestep).reshape(b), 4),
            b * 4, pad_h, pad_w, cfg.jdtype,
        )
        trb = frame.timestep_plane(
            jnp.repeat(1.0 - jnp.asarray(timestep).reshape(b), 4),
            b * 4, pad_w, pad_h, cfg.jdtype,
        )

    for fi, tap in enumerate(V4_TAPS):
        fa = _unflatten_views(pyramid(g0a, g1a, ta, pins_a), b)
        fb = _unflatten_views(pyramid(g0b, g1b, tb, pins_b), b)
        if cfg.tta_temporal_mode:
            fra = _unflatten_views(pyramid(g1a, g0a, tra, pins_rev_a), b)
            frb = _unflatten_views(pyramid(g1b, g0b, trb, pins_rev_b), b)
            fa, fra = frame.flow_temporal_avg_v4(fa, fra)
            fb, frb = frame.flow_temporal_avg_v4(fb, frb)
        fa, fb = frame.flow_views_avg(fa, fb, n_pairs=2, has_mask=True)
        pins_a[tap] = _flatten_views(fa)
        pins_b[tap] = _flatten_views(fb)
        if cfg.tta_temporal_mode:
            fra, frb = frame.flow_views_avg(fra, frb, n_pairs=2, has_mask=True)
            pins_rev_a[tap] = _flatten_views(fra)
            pins_rev_b[tap] = _flatten_views(frb)

    out_a = _v4_out(ex, cfg, W, _flatten_views(g0a), _flatten_views(g1a), ta, pins_a)
    out_b = _v4_out(ex, cfg, W, _flatten_views(g0b), _flatten_views(g1b), tb, pins_b)
    if cfg.tta_temporal_mode:
        out_rev_a = _v4_out(
            ex, cfg, W, _flatten_views(g1a), _flatten_views(g0a), tra, pins_rev_a
        )
        out_rev_b = _v4_out(
            ex, cfg, W, _flatten_views(g1b), _flatten_views(g0b), trb, pins_rev_b
        )
        out_a = frame.out_temporal_avg(out_a, out_rev_a)
        out_b = frame.out_temporal_avg(out_b, out_rev_b)
    merged = frame.merge_views8_mean(
        _unflatten_views(out_a, b), _unflatten_views(out_b, b)
    )
    return frame.postprocess(merged, h, w)
