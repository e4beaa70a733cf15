"""Three-stage load -> proc -> save pipeline runtime.

The reference runs this as producer/consumer threads over two bounded
queues with a poison-pill shutdown (/root/reference/src/main.cpp:231-436).
The TPU-native version keeps the same topology — decode pool, device stage,
encode pool, bounded queues of depth 8 — but the device stage packs tasks
into fixed-size batches per static shape, because on TPU throughput comes
from the batch axis, not from concurrent single-frame submissions.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from .image import decode_image, encode_image

QUEUE_DEPTH = 8  # reference uses 8-deep task queues (main.cpp:259)


class StageMetrics:
    """Per-stage counters + wall time (the reference has no observability at
    all, SURVEY.md §5; production serving needs at least this much)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counts: Dict[str, int] = {}
        self.seconds: Dict[str, float] = {}

    def add(self, stage: str, seconds: float, n: int = 1):
        with self._lock:
            self.counts[stage] = self.counts.get(stage, 0) + n
            self.seconds[stage] = self.seconds.get(stage, 0.0) + seconds

    def summary(self) -> str:
        parts = []
        for stage in sorted(self.counts):
            n, s = self.counts[stage], self.seconds[stage]
            rate = n / s if s > 0 else float("inf")
            parts.append(f"{stage}: {n} in {s:.2f}s ({rate:.1f}/s)")
        return "; ".join(parts)


@dataclass
class Task:
    id: int
    in0_path: str
    in1_path: str
    out_path: str
    timestep: float
    in0: Optional[np.ndarray] = None
    in1: Optional[np.ndarray] = None
    out: Optional[np.ndarray] = None


class _DecodeCache:
    """Tiny LRU so directory mode doesn't decode every frame twice
    (each frame is in1 of one task and in0 of the next)."""

    def __init__(self, maxsize: int = 16):
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.maxsize = maxsize

    def get(self, path: str) -> np.ndarray:
        with self._lock:
            if path in self._d:
                self._d.move_to_end(path)
                return self._d[path]
        img = decode_image(path)
        with self._lock:
            self._d[path] = img
            if len(self._d) > self.maxsize:
                self._d.popitem(last=False)
        return img


class PipelineRunner:
    """Drives tasks through load / proc / save stages.

    ``process_batch(in0, in1, timesteps) -> out`` is the device step (one
    per device session); multiple sessions consume the same queue — the
    reference's heterogeneous multi-device work stealing
    (/root/reference/src/main.cpp:819-866).
    """

    def __init__(
        self,
        process_batches: Sequence[Callable],
        *,
        jobs_load: int = 1,
        jobs_save: int = 2,
        batch_size=1,
        verbose: bool = False,
        on_done: Optional[Callable[[Task], None]] = None,
        device_fns: Optional[Sequence[Callable]] = None,
    ):
        """``device_fns`` (optional, one per session) are asynchronous
        variants returning on-device arrays (``RIFE.process_batch_device``);
        when given, the proc stage dispatches batch k+1 while batch k is
        still computing/downloading — upload, compute and download overlap
        instead of serializing (downloads dominate on slow links)."""
        self.process_batches = list(process_batches)
        self.device_fns = list(device_fns) if device_fns else None
        if self.device_fns and len(self.device_fns) != len(self.process_batches):
            raise ValueError("need one device_fn per process_batch")
        self.jobs_load = max(1, jobs_load)
        self.jobs_save = max(1, jobs_save)
        # per-device batch sizes (the analog of the reference's per-device
        # proc thread counts, -j l:p0,p1,...:s — main.cpp:548-551)
        if isinstance(batch_size, int):
            batch_size = [batch_size] * len(self.process_batches)
        if len(batch_size) != len(self.process_batches):
            raise ValueError("need one batch size per device session")
        self.batch_sizes = [max(1, b) for b in batch_size]
        self.verbose = verbose
        self.on_done = on_done
        self.toproc: "queue.Queue[Optional[Task]]" = queue.Queue(QUEUE_DEPTH)
        self.tosave: "queue.Queue[Optional[Task]]" = queue.Queue(QUEUE_DEPTH)
        self.errors: List[str] = []
        self._err_lock = threading.Lock()
        self.metrics = StageMetrics()

    def _record_error(self, msg: str):
        with self._err_lock:
            self.errors.append(msg)

    # -- stages --------------------------------------------------------------

    def _load(self, tasks: Sequence[Task]):
        cache = _DecodeCache()

        def decode(task: Task) -> Optional[Task]:
            t0 = time.perf_counter()
            try:
                task.in0 = cache.get(task.in0_path)
                task.in1 = cache.get(task.in1_path)
                if task.in0.shape != task.in1.shape:
                    raise ValueError(
                        f"size mismatch {task.in0.shape} vs {task.in1.shape}"
                    )
                self.metrics.add("load", time.perf_counter() - t0)
                return task
            except Exception as e:  # noqa: BLE001 - stage must not die
                self._record_error(f"decode {task.in0_path}/{task.in1_path}: {e}")
                return None

        with ThreadPoolExecutor(self.jobs_load) as pool:
            for done in pool.map(decode, tasks):
                if done is not None:
                    self.toproc.put(done)

    def _proc(self, process_batch: Callable, batch_size: int,
              device_fn: Optional[Callable]):
        pending: "OrderedDict[tuple, List[Task]]" = OrderedDict()
        # shapes for which a full batch has already been submitted: partial
        # tail batches of those shapes are padded up to batch_size (padding
        # rows replay the last pair, outputs dropped) so the shutdown flush
        # never triggers a fresh XLA compile for one leftover frame
        saw_full: set = set()
        # async path: at most 2 batches in flight (dispatch k+1 while k
        # computes/downloads), downloads drain in order on one thread
        inflight = threading.BoundedSemaphore(2)
        downloads = ThreadPoolExecutor(1) if device_fn else None

        def deliver(batch, outs):
            for t, o in zip(batch, outs):
                t.out = o
                self.tosave.put(t)

        def download(batch, dev_out, t0):
            try:
                deliver(batch, np.asarray(dev_out))
                self.metrics.add("proc", time.perf_counter() - t0, len(batch))
            except Exception as e:  # noqa: BLE001
                self._record_error(f"download batch: {e}")
            finally:
                inflight.release()

        def flush(shape_key):
            batch = pending.pop(shape_key, None)
            if not batch:
                return
            try:
                t0 = time.perf_counter()
                in0 = np.stack([t.in0 for t in batch])
                in1 = np.stack([t.in1 for t in batch])
                ts = np.asarray([t.timestep for t in batch], np.float32)
                if len(batch) >= batch_size:
                    saw_full.add(shape_key)
                elif shape_key in saw_full:
                    rep = batch_size - len(batch)
                    in0 = np.concatenate([in0, np.repeat(in0[-1:], rep, 0)])
                    in1 = np.concatenate([in1, np.repeat(in1[-1:], rep, 0)])
                    ts = np.concatenate([ts, np.repeat(ts[-1:], rep)])
                if downloads is not None:
                    inflight.acquire()
                    try:
                        dev_out = device_fn(in0, in1, ts)
                    except Exception:
                        inflight.release()
                        raise
                    downloads.submit(download, batch, dev_out, t0)
                else:
                    outs = process_batch(in0, in1, ts)
                    self.metrics.add("proc", time.perf_counter() - t0, len(batch))
                    deliver(batch, outs)
            except Exception as e:  # noqa: BLE001
                self._record_error(f"process batch: {e}")

        while True:
            task = self.toproc.get()
            if task is None:
                for key in list(pending.keys()):
                    flush(key)
                if downloads is not None:
                    downloads.shutdown(wait=True)
                self.tosave.put(None)
                return
            # t==0/1 short-circuit, as the reference engine does
            # (rife.cpp:395-405) — no device work at all
            if task.timestep == 0.0:
                task.out = task.in0
                self.tosave.put(task)
                continue
            if task.timestep == 1.0:
                task.out = task.in1
                self.tosave.put(task)
                continue
            key = task.in0.shape
            pending.setdefault(key, []).append(task)
            if len(pending[key]) >= batch_size:
                flush(key)

    def _save(self):
        # Bound in-flight encodes so the depth-8 ``tosave`` queue actually
        # exerts backpressure on proc: without this the executor's internal
        # queue is unbounded and decoded+rendered frames pile up in memory
        # whenever encode is slower than proc.  The reference's bounded
        # queues are its memory contract (/root/reference/src/main.cpp:259).
        inflight = threading.BoundedSemaphore(2 * self.jobs_save)

        def encode(task: Task):
            t0 = time.perf_counter()
            try:
                encode_image(task.out_path, task.out)
                self.metrics.add("save", time.perf_counter() - t0)
                if self.verbose:
                    print(
                        f"{task.in0_path} {task.in1_path} {task.timestep} "
                        f"-> {task.out_path} done"
                    )
                if self.on_done is not None:
                    self.on_done(task)
            except Exception as e:  # noqa: BLE001
                self._record_error(f"encode {task.out_path}: {e}")
            finally:
                task.in0 = task.in1 = task.out = None  # free pixels
                inflight.release()

        n_procs = len(self.process_batches)
        finished_procs = 0
        with ThreadPoolExecutor(self.jobs_save) as pool:
            while finished_procs < n_procs:
                task = self.tosave.get()
                if task is None:
                    finished_procs += 1
                    continue
                inflight.acquire()  # blocks -> tosave fills -> proc blocks
                pool.submit(encode, task)

    # -- driver ----------------------------------------------------------------

    def run(self, tasks: Sequence[Task]) -> List[str]:
        """Run all tasks; returns accumulated stage errors (empty = clean)."""
        loader = threading.Thread(target=self._load, args=(tasks,))
        dfns = self.device_fns or [None] * len(self.process_batches)
        procs = [
            threading.Thread(target=self._proc, args=(fn, bs, dfn))
            for fn, bs, dfn in zip(self.process_batches, self.batch_sizes, dfns)
        ]
        saver = threading.Thread(target=self._save)
        loader.start()
        for p in procs:
            p.start()
        saver.start()
        loader.join()
        for _ in procs:
            self.toproc.put(None)  # poison pills (reference id==-233)
        for p in procs:
            p.join()
        saver.join()
        if self.verbose:
            print(f"pipeline: {self.metrics.summary()}")
        return self.errors
