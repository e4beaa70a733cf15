"""RIFE session — the engine object (reference: class RIFE,
/root/reference/src/rife.h:11-52).

One session owns a loaded model (graphs + weights on device) and a cache of
jitted end-to-end step functions keyed by static shape.  The hot path is
``process_batch``: a batch of frame pairs goes in as uint8, one fused XLA
program runs the whole pipeline on device (preproc -> nets -> TTA -> postproc),
and uint8 frames come out — no host round-trips mid-frame, mirroring the
reference's single command buffer per frame (/root/reference/src/rife.cpp:1196).

Differences from the reference, by TPU design:
* batching across frame pairs is first-class (replaces `-j` proc threads);
* ``timestep`` is a traced argument, so sweeping `-s` values never recompiles;
* devices are selected via jax; multi-chip scaling lives in
  ``rife_tpu.parallel`` (data-parallel sharding of the batch axis).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..graph.executor import Executor
from ..graph.rewrite import (
    fuse_concat_into_convs,
    fuse_pixelshuffle_into_convs,
    fuse_prelu_activations,
    fuse_quarter_downscaled_warps,
    fuse_render_blend,
    fuse_sibling_warps,
    fuse_warps_into_cat_conv,
    push_concat_through_interp,
)
from ..models.zoo import LoadedModel, load_model
from ..ops import frame, jax_ops
from . import pipelines
from .pipelines import PipelineConfig

PAD_ALIGN = 32  # reference pads frames to 32px multiples (rife.cpp:424-425)

_cache_ready = False


def _enable_compile_cache(device) -> None:
    """Persistent XLA compile cache (the reference compiles GLSL->SPIR-V at
    runtime and caches in-process, rife.cpp:178-187; TPU compiles are far
    slower, so ours persists across runs).  TPU-only: XLA:CPU AOT artifacts
    are machine-feature-pinned and warn/SIGILL when reloaded elsewhere.
    Opt out: RIFE_TPU_COMPILE_CACHE=0, or set it to a directory."""
    global _cache_ready
    if _cache_ready or device.platform != "tpu":
        return
    _cache_ready = True
    import os

    loc = os.environ.get("RIFE_TPU_COMPILE_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "rife_tpu", "xla",
        )
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def pad_to(v: int, align: int = PAD_ALIGN) -> int:
    return (v + align - 1) // align * align


class RIFE:
    """Frame-interpolation session.

    Parameters mirror the reference ctor (gpuid is replaced by ``device``):
    ``tta_mode`` (-x), ``tta_temporal_mode`` (-z), ``uhd_mode`` (-u).
    """

    def __init__(
        self,
        model: str = "rife-v2.3",
        *,
        tta_mode: bool = False,
        tta_temporal_mode: bool = False,
        uhd_mode: bool = False,
        dtype: str = "float32",
        device: Optional[jax.Device] = None,
        model_root=None,
    ):
        self.model: LoadedModel = load_model(model, model_root)
        self.cfg = PipelineConfig(
            family=self.model.family,
            tta_mode=tta_mode,
            tta_temporal_mode=tta_temporal_mode,
            uhd_mode=False if self.model.family == "v4" else uhd_mode,
            dtype=dtype,
        )
        self.device = device or jax.devices()[0]
        _enable_compile_cache(self.device)
        wdtype = self.cfg.jdtype
        # Pallas warp kernel only lowers on real TPUs (Mosaic dynamic_gather)
        use_pallas = self.device.platform == "tpu"
        self._use_pallas = use_pallas
        # resolved lazily by the first step when RIFE_TPU_WARP_VARIANT is
        # "auto": a one-time flow-roughness probe routes spatially-rough
        # flows to the flow-width-insensitive band kernel (see
        # _resolve_warp_variant)
        self._auto_warp_variant: Optional[str] = None
        # blobs that are exact value-copies of the u8-origin input frames:
        # warps on those take the lossless u8-quad Pallas kernel
        _IMG_SEEDS = {
            "flownet": ("in0", "in1", "input0", "input1"),
            "fusionnet": ("img0", "img1"),
        }
        self.executors: Dict[str, Executor] = {}
        weights = {}
        import os

        fuse_ds = os.environ.get("RIFE_TPU_FUSE_DS", "1") != "0"
        # planar (BHCW) execution for narrow-channel nets: on TPU XLA
        # lane-pads feature-minor layouts to 128 channels, which dominates
        # those families' cost (BASELINE.md layout analysis).  Env value:
        # "0" off, "1" all non-v4 nets, or a comma list of net names.
        # Default ON for non-v4 families: the BHCW executors measured
        # 16.22 vs 15.57 fps on v2.3 1080p B=4 (BASELINE.md round-3);
        # v4 stays NHWC (its narrow layers run at 1/4 resolution where
        # lane padding costs less than the boundary transposes).
        planar_env = os.environ.get("RIFE_TPU_PLANAR", "1")
        if planar_env == "1":
            planar_nets = None if self.model.family == "v4" else set(
                self.model.nets
            )
        elif planar_env and planar_env != "0":
            planar_nets = set(planar_env.split(","))
            unknown = planar_nets - set(self.model.nets)
            if unknown:
                raise ValueError(
                    f"RIFE_TPU_PLANAR names unknown nets {sorted(unknown)}; "
                    f"model {self.model.name} has {sorted(self.model.nets)}"
                )
        else:
            planar_nets = None
        planar_nets = planar_nets if use_pallas else None
        # blobs each pipeline may extract from a net (engine/pipelines.py);
        # the rewrite must never consume these
        _EXTRACTABLE = {
            "flownet": ("flow", "flow0", "flow1", "flow2", "flow3", "out0"),
            "contextnet": ("f1", "f2", "f3", "f4"),
            "fusionnet": ("output",),
        }
        fuse_prelu = os.environ.get("RIFE_TPU_FUSE_PRELU", "1") != "0"
        for name, net in self.model.nets.items():
            graph = net.graph
            net_weights = net.weights
            if fuse_ds:
                # exact rewrite: warp-then-downscale pairs become fused
                # warp nodes (1/4: compacted tap grid; 1/2: phase-
                # accumulated half-res output — graph/rewrite.py)
                # fuse_half default OFF: the 4-phase ds2 kernel is bit-exact
                # but ~5x slower than warp+resize (253 vs 52 ms standalone,
                # block2 135 -> 525 ms in-program at B=24) — the phase
                # decomposition halves the one-hot gather density in both
                # axes.  Kept behind the flag as a measured dead end.
                graph = fuse_quarter_downscaled_warps(
                    graph, frozenset(_EXTRACTABLE.get(name, ())),
                    fuse_half=os.environ.get(
                        "RIFE_TPU_FUSE_DS2", "0") != "0",
                )
            if fuse_prelu:
                # fold standalone PReLU nodes into their conv (one fused
                # activation instead of a full tensor round trip per conv)
                graph, net_weights = fuse_prelu_activations(
                    graph, net_weights, frozenset(_EXTRACTABLE.get(name, ()))
                )
            region_mode = (os.environ.get("RIFE_TPU_LAYOUT", "nhwc")
                           == "region" and use_pallas)
            flat_nhwc = not region_mode and not (
                planar_nets and name in planar_nets)
            if os.environ.get("RIFE_TPU_FUSE_CAT", "1") != "0":
                # feed block-entry concats straight into the stride-2 conv
                # (the planar kernel DMAs parts into band slots; the NHWC
                # table re-concatenates — identical semantics either way).
                # Nested concats flatten only for planar/region executors:
                # the flat 5-part NHWC concat measured slower (rewrite.py)
                graph = fuse_concat_into_convs(
                    graph, frozenset(_EXTRACTABLE.get(name, ())),
                    flatten_nested=not flat_nhwc,
                )
            if (self.model.family != "v4"
                    and os.environ.get("RIFE_TPU_CAT_INTERP", "1") != "0"):
                # per-channel resize commutes with channel concat.  The
                # v3.x block entries DOWNSCALE a full-res 6-10ch concat
                # (Concat_133 -> Resize_135); XLA lane-pads that concat's
                # channel axis 12.8-128x at small batch — the v3.1 1080p
                # B=4 step exceeded HBM by ~9.8 GB of pure padding before
                # this rewrite (BASELINE.md round-5).  Bit-identical on
                # every non-v4 family (tests); v4 is excluded: its sites
                # drift 1 u8 LSB on 0.01% of pixels (XLA re-contracts the
                # lerp FMAs across the changed fusion boundary) and its
                # program is the heavily-measured headline
                graph = push_concat_through_interp(
                    graph, frozenset(_EXTRACTABLE.get(name, ()))
                )
            if os.environ.get("RIFE_TPU_FUSE_PS", "1") != "0":
                # bake PixelShuffle channel regrouping into the producing
                # conv/deconv (NHWC: plain composition; planar: weight
                # permutation — one lane interleave instead of two + a
                # full-res relayout)
                graph = fuse_pixelshuffle_into_convs(
                    graph, frozenset(_EXTRACTABLE.get(name, ()))
                )
            if os.environ.get("RIFE_TPU_FUSE_RENDER", "1") != "0":
                # fuse the final warp-pair + mask blend into one node so the
                # render runs on per-channel planes end-to-end (no C=3
                # full-res lane-padded NHWC tensor; graph/rewrite.py)
                graph = fuse_render_blend(
                    graph, frozenset(_EXTRACTABLE.get(name, ()))
                )
            if os.environ.get("RIFE_TPU_FUSE_WARPPAIR", "1") != "0":
                # pair the two frame warps of each refinement scale into
                # one node -> one pallas_call (halves the Mosaic per-cell
                # fixed cost; graph/rewrite.py fuse_sibling_warps).  Runs
                # after fuse_render_blend so the dead render warps are
                # not resurrected into a live pair.
                graph = fuse_sibling_warps(graph)
            if flat_nhwc and os.environ.get(
                    "RIFE_TPU_FUSE_WARPCAT", "0") != "0":
                # measured NET-NEGATIVE on the flat path (49.2 -> 47.0 fps
                # at B=24 1080p): the planar block-entry conv wins its own
                # battle but the BHCW->NHWC output relayout + downstream
                # layout churn eat more than the concat it absorbs.  Kept
                # behind RIFE_TPU_FUSE_WARPCAT=1 as a measured dead end;
                # requires flatten_nested concats to expose the warp parts.
                graph = fuse_concat_into_convs(
                    graph, frozenset(_EXTRACTABLE.get(name, ())),
                    flatten_nested=True,
                )
                graph = fuse_warps_into_cat_conv(
                    graph, frozenset(_EXTRACTABLE.get(name, ()))
                )
            u8_blobs = graph.value_copies_of(_IMG_SEEDS.get(name, ()))
            ctx = {
                "use_pallas_warp": use_pallas,
                "u8_image_blobs": frozenset(u8_blobs),
                "planar_escape": os.environ.get(
                    "RIFE_TPU_PLANAR_ESCAPE", "0") != "0",
                # region-layout measurement knobs (graph/layout.py).
                # Plain-conv anchors measured NET-NEGATIVE in-program (the
                # round-3 "anchor inversion", understood in round 4: a
                # planar conv only wins when it absorbs a materialization
                # — see layout._conv_constraint); absorbers (ConvolutionCat,
                # fused-PS convs) anchor by default, plain convs opt in.
                "layout_planar_conv": os.environ.get(
                    "RIFE_TPU_LAYOUT_CONV", "0") != "0",
                "layout_planar_deconv": os.environ.get(
                    "RIFE_TPU_LAYOUT_DECONV", "0") != "0",
                "layout_planar_cat": os.environ.get(
                    "RIFE_TPU_LAYOUT_CAT", "1") != "0",
                "layout_planar_ps_conv": os.environ.get(
                    "RIFE_TPU_LAYOUT_PS_CONV", "1") != "0",
                "layout_planar_ps": os.environ.get(
                    "RIFE_TPU_LAYOUT_PS", "1") != "0",
                "layout_narrow_min_hw": int(os.environ.get(
                    "RIFE_TPU_LAYOUT_NARROW_HW", "400000")),
            }
            # region-level layout planning (graph/layout.py): narrow-channel
            # regions execute as planes end-to-end, wide convs stay NHWC on
            # the XLA MXU path.  Default is the flat NHWC executor — the
            # region pass with no planar anchors measured 45.0 vs 47.8 fps
            # on the v4.6 headline (BASELINE.md round-3 A/B); set
            # RIFE_TPU_LAYOUT=region to enable planning.
            layout_mode = os.environ.get("RIFE_TPU_LAYOUT", "nhwc")
            if planar_nets and name in planar_nets:
                from ..graph.executor import PlanarExecutor
                from ..ops.planar_ops import OP_TABLE_PLANAR

                self.executors[name] = PlanarExecutor(
                    graph, OP_TABLE_PLANAR, net_weights, ctx=ctx
                )
            elif layout_mode == "region" and use_pallas:
                from ..graph.executor import RegionExecutor
                from ..ops.planar_ops import OP_TABLE_PLANAR

                self.executors[name] = RegionExecutor(
                    graph, jax_ops.OP_TABLE, OP_TABLE_PLANAR, net_weights,
                    ctx=ctx,
                )
            else:
                self.executors[name] = Executor(
                    graph, jax_ops.OP_TABLE, net_weights, ctx=ctx
                )
            # fused render present -> pipelines may request plane-form out0
            # and finish with frame.postprocess_planar (the op honors
            # ctx['planar_outputs'] on every path, Pallas or fallback)
            self.executors[name].render_planar = any(
                n.type == "rife.RenderBlend" for n in graph.nodes
            )
            weights[name] = jax_ops.prepare_weights(graph, net_weights, wdtype)
        self.weights = jax.device_put(weights, self.device)
        self._step_cache: Dict[Tuple, callable] = {}

    # -- jitted step construction ------------------------------------------

    def build_step_fn(self, pad_h: int, pad_w: int, *,
                      use_pallas: Optional[bool] = None,
                      warp_variant: Optional[str] = None,
                      spatial_warp: Optional[tuple] = None):
        """The raw (unjitted) end-to-end step ``(W, in0, in1, t) -> u8``;
        sharded wrappers in ``rife_tpu.parallel`` re-jit this with mesh
        shardings.  ``use_pallas=False`` forces the XLA warp (GSPMD can
        auto-partition a gather but not a Pallas custom call).
        ``spatial_warp=(mesh, height_axis, batch_axis)`` routes every warp
        through the height-sharded shard_map path (per-shard Pallas slab
        kernel over an all-gathered source frame, jax_ops.warp_spatial) —
        the giant-frame mode where frame height is split across chips.
        ``warp_variant`` pins the u8 warp kernel choice into the traced
        step (the auto-probe's resolution; overrides the env default)."""
        cfg = self.cfg
        extra = cfg.extra_ctx
        if use_pallas is False:
            extra = extra + (("use_pallas_warp", False),)
        if spatial_warp is not None:
            extra = extra + (("spatial_warp", spatial_warp),)
        if warp_variant is not None:
            extra = extra + (("warp_variant", warp_variant),)
        if extra is not cfg.extra_ctx:
            import dataclasses

            cfg = dataclasses.replace(cfg, extra_ctx=extra)
        nets = self.executors

        if cfg.family == "v4":
            def step(W, in0, in1, timestep):
                return pipelines.forward_v4(
                    nets, cfg, W, in0, in1, timestep, pad_h, pad_w
                )
        else:
            def step(W, in0, in1, timestep):
                del timestep  # v1/v2 interpolate the midpoint only
                return pipelines.forward_v1v2(nets, cfg, W, in0, in1, pad_h, pad_w)

        return step

    def _get_step(self, b: int, h: int, w: int):
        ph, pw = pad_to(h), pad_to(w)

        def stepper(W, in0, in1, ts):
            variant = self._resolve_warp_variant(in0, in1, ts, ph, pw)
            key = (b, ph, pw, variant)
            fn = self._step_cache.get(key)
            if fn is None:
                if variant == "xla":
                    # flow-independent XLA gather warp everywhere: every
                    # fused warp op has an exact unfused/XLA fallback, so
                    # the step loses the Pallas kernels but none of the
                    # graph rewrites' semantics (worst-case hedge; see
                    # _resolve_warp_variant)
                    fn = jax.jit(self.build_step_fn(
                        ph, pw, use_pallas=False))
                else:
                    fn = jax.jit(self.build_step_fn(
                        ph, pw, warp_variant=variant))
                self._step_cache[key] = fn
            return fn(W, in0, in1, ts)

        return stepper

    def _resolve_warp_variant(self, in0, in1, ts, ph: int, pw: int):
        """Pick the u8 warp kernel for this session's workload, once.

        The flow-adaptive kernels (slab/delta) are the fastest on the
        smooth flows trained RIFE weights produce, but degrade on
        spatially-rough fields, where the row-band kernel's cost is
        bounded (BASELINE.md adversarial `iid` row; the reference's warp
        cost is flow-independent, /root/reference/src/warp.comp:42-63).
        With RIFE_TPU_WARP_VARIANT=auto (the default) the first batch runs
        a one-time probe: extract the coarsest flow tap, measure the mean
        per-(8x128)-stripe y-spread in full-res pixel units, and pin
        'band' into the step when it exceeds ROUGH_SPREAD_ROWS (measured
        separation: calibrated smooth synthesis ~2-3 rows, iid ~30-80).
        An explicit env value always wins; non-TPU backends skip the probe
        (the Pallas kernels don't run there)."""
        env = os.environ.get("RIFE_TPU_WARP_VARIANT", "auto")
        if env != "auto":
            return env
        if self._auto_warp_variant is not None:
            return self._auto_warp_variant
        if (not self._use_pallas or self.cfg.family != "v4"
                or os.environ.get("RIFE_TPU_WARP_AUTOPROBE", "1") == "0"):
            # v1/v2 warps ride the multi-channel/planar kernels whose
            # variants aren't flow-adaptive in the same way; keep the
            # static default there
            self._auto_warp_variant = "auto"
            return "auto"
        b = int(in0.shape[0])

        def probe(W, i0, i1, t):
            img0 = frame.preprocess(i0, ph, pw, self.cfg.jdtype)
            img1 = frame.preprocess(i1, ph, pw, self.cfg.jdtype)
            tp = frame.timestep_plane(t, b, ph, pw, self.cfg.jdtype)
            return pipelines._v4_flow_pyramid(
                self.executors["flownet"], self.cfg, W, img0, img1, tp, {}
            )

        tap = np.asarray(jax.jit(probe)(self.weights, in0, in1, ts)[:1],
                         np.float32)
        h0 = tap.shape[1]
        # y-flow of direction 0 in full-res pixel units (each pyramid
        # upsample doubles the flow magnitude on the way to full res)
        fy = tap[0, :, :, 1] * (ph / h0)
        th, lane = 8, 128
        hp = (fy.shape[0] + th - 1) // th * th
        wp2 = (fy.shape[1] + lane - 1) // lane * lane
        fy = np.pad(fy, ((0, hp - fy.shape[0]), (0, wp2 - fy.shape[1])),
                    mode="edge")
        s = fy.reshape(hp // th, th, wp2 // lane, lane)
        spread = (s.max(axis=(1, 3)) - s.min(axis=(1, 3))).mean()
        rough = float(spread) > float(os.environ.get(
            "RIFE_TPU_ROUGH_SPREAD_ROWS", "8.0"))
        self._auto_warp_variant = "band" if rough else "auto"
        if os.environ.get("RIFE_TPU_WARP_DEBUG", "0") != "0":
            print(f"[warp] auto-probe: stripe y-spread {spread:.2f} rows "
                  f"-> variant {self._auto_warp_variant}", flush=True)
        return self._auto_warp_variant

    # -- public API ---------------------------------------------------------

    def process_batch(
        self,
        in0: np.ndarray,
        in1: np.ndarray,
        timesteps: np.ndarray,
    ) -> np.ndarray:
        """Interpolate a batch: (B,H,W,3) u8 pairs + (B,) timesteps -> u8.

        v1/v2/v3 models only support t=0.5 (validated in the CLI, as in the
        reference, main.cpp:670-674); the value is ignored here for those.
        """
        return np.asarray(self.process_batch_device(in0, in1, timesteps))

    def process_batch_device(
        self,
        in0: np.ndarray,
        in1: np.ndarray,
        timesteps: np.ndarray,
    ):
        """Like ``process_batch`` but returns the on-device u8 array without
        blocking: JAX dispatch is asynchronous, so callers can overlap the
        device step with the download of the previous batch (the pipeline
        runner does exactly that — downloads through a slow link otherwise
        serialize the whole pipeline).

        v1/v2/v3 families interpolate the midpoint only: ``timesteps`` is
        ignored by the traced step, so any value other than 0.5 is rejected
        here rather than silently producing the t=0.5 frame (the reference
        validates the same way in its CLI, main.cpp:670-674).

        NB: inputs are device_put straight from the numpy buffers; wrapping
        in jnp.asarray first commits via the default backend and costs
        SECONDS through a tunneled device (measured 11.8s vs 28ms / 44MB).
        """
        if in0.shape != in1.shape:
            raise ValueError(f"frame shape mismatch: {in0.shape} vs {in1.shape}")
        if self.cfg.family != "v4":
            ts = np.asarray(timesteps, np.float32)
            if not np.all(ts == 0.5):
                raise ValueError(
                    f"{self.model.name} ({self.cfg.family}) only supports "
                    f"timestep 0.5; got {np.unique(ts)}"
                )
        b, h, w, _ = in0.shape
        step = self._get_step(b, h, w)
        return step(
            self.weights,
            jax.device_put(np.ascontiguousarray(in0), self.device),
            jax.device_put(np.ascontiguousarray(in1), self.device),
            jax.device_put(
                np.asarray(timesteps, np.float32).reshape(b), self.device
            ),
        )

    def process(self, in0: np.ndarray, in1: np.ndarray, timestep: float = 0.5) -> np.ndarray:
        """Single pair, (H,W,3) u8 -> (H,W,3) u8.  t==0/1 short-circuit on
        host exactly as the reference does (rife.cpp:395-405)."""
        if timestep == 0.0:
            return in0.copy()
        if timestep == 1.0:
            return in1.copy()
        out = self.process_batch(
            in0[None], in1[None], np.asarray([timestep], np.float32)
        )
        return out[0]

    # -- introspection -------------------------------------------------------

    def compiled_shapes(self):
        return sorted(self._step_cache.keys())
