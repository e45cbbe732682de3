"""Latency-oriented micro-batching inference server.

The batched predictor (engine/predictor.py) maximizes throughput over a
known source list; this module serves CONCURRENT single-image requests at
low latency. Batch-1 dispatch underfills the MXU (and on this dev box pays
a ~27 ms tunnel round-trip per call), so the TPU-native serving shape is:

- **micro-batching**: requests arriving within `max_wait_ms` of each other
  coalesce into one static-shape jitted forward+NMS dispatch, padded up to
  the fixed `batch` so XLA compiles exactly one program;
- **dispatch overlap**: a bounded two-deep in-flight queue lets the host
  preprocess + upload batch i+1 while the device computes batch i (the
  reference's CUDA streams get this implicitly; under jax async dispatch
  it falls out of not blocking on the result).

The reference has no serving component — its latency harness is per-image
torch calls (reference nn/standard_cal_inference_time.py:9-70). This is the
TPU-native answer to that protocol for deployment.

Usage::

    server = YOLO("yolov8n.yaml").serve(batch=8, max_wait_ms=2.0)
    fut = server.submit(bgr_image)          # returns concurrent Future
    result = fut.result()                   # engine.results.Results
    server.stop()
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import jax
import numpy as np

from ..ops.nms import non_max_suppression
from ..utils import LOGGER
from .predictor import det_to_original, letterbox_batch
from .results import Results


def _safe_resolve(fut: Future, result=None, exc: Optional[Exception] = None):
    """Resolve a request future without ever raising: callers may legally
    cancel() a pending future (these are never set_running_or_notify_cancel'd),
    and set_result/set_exception on a cancelled future raises
    InvalidStateError — which must not kill a worker loop."""
    try:
        if fut.done():
            return
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:
        pass  # cancelled between the done() check and the set


class InferenceServer:
    """Coalesce concurrent single-image requests into micro-batches.

    Two worker threads: a *collector* that gathers up to `batch` requests
    (waiting at most `max_wait_ms` for stragglers after the first), prepares
    the padded static batch and dispatches the jitted program; and a
    *drainer* that blocks on `jax.device_get` for the oldest in-flight batch
    and resolves the request futures. The in-flight queue is bounded at 2:
    enough to overlap host work with device compute, small enough that a
    request never waits behind more than one foreign batch.
    """

    def __init__(self, model_holder, batch: int = 8, max_wait_ms: float = 2.0,
                 imgsz: int = 640, conf: float = 0.25, iou: float = 0.7,
                 max_det: int = 300, agnostic: bool = False):
        self.model_holder = model_holder
        self.variables = model_holder.variables
        self.batch = int(batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.imgsz = int(imgsz)
        self.names = getattr(model_holder, "names", {})

        from functools import partial

        from ..utils.compile_opts import tpu_compiler_options

        @partial(jax.jit, compiler_options=tpu_compiler_options())
        def infer(vs, img):
            import jax.numpy as jnp
            x = img.astype(jnp.float32) / 255.0
            decoded, _ = model_holder.model.apply(vs, x, train=False)
            return non_max_suppression(decoded, conf_thres=conf, iou_thres=iou,
                                       max_det=max_det, agnostic=agnostic)
        self._infer = infer

        # SPMD serving: with >1 local device the one compiled batch shape is
        # rounded up to a mesh-divisible size and sharded along the batch
        # axis (params replicated) — micro-batches then spread over all
        # chips. MGDT_PREDICT_NO_SHARD=1 restores single-device execution.
        from ..parallel.mesh import data_sharding_setup
        self._mesh_ndev, self._batch_sharding, self.variables = \
            data_sharding_setup(self.variables, "MGDT_PREDICT_NO_SHARD")
        self._device_batch = (-(-self.batch // self._mesh_ndev)
                              * self._mesh_ndev if self._mesh_ndev
                              else self.batch)

        self._requests: "queue.SimpleQueue" = queue.SimpleQueue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self._stop = object()  # sentinel
        self._started = False
        self._lock = threading.Lock()
        self.stats: Dict[str, float] = {"requests": 0, "batches": 0,
                                        "occupancy_sum": 0}
        self._latencies: List[float] = []

    # ---- public surface ----------------------------------------------------
    def start(self) -> "InferenceServer":
        if self._started:
            return self
        self._started = True
        self._collector = threading.Thread(target=self._collect_loop,
                                           name="mgdt-serve-collect", daemon=True)
        self._drainer = threading.Thread(target=self._drain_loop,
                                         name="mgdt-serve-drain", daemon=True)
        self._collector.start()
        self._drainer.start()
        return self

    def submit(self, img_bgr: np.ndarray) -> Future:
        """Enqueue one BGR HWC uint8 image; resolves to a Results object."""
        # check+put under the same lock stop() takes to flip _started:
        # otherwise a submit can pass the check, lose the CPU while stop()
        # drains and returns, then enqueue into a queue no worker reads.
        with self._lock:
            if not self._started:
                raise RuntimeError(
                    "InferenceServer not started (call .start())")
            fut: Future = Future()
            self._requests.put((img_bgr, fut, time.monotonic()))
        return fut

    def predict(self, img_bgr: np.ndarray) -> Results:
        """Synchronous convenience wrapper around submit()."""
        return self.submit(img_bgr).result()

    def stop(self):
        """Drain in-flight work and join the worker threads."""
        with self._lock:
            if not self._started:
                return
            self._started = False  # new submit() calls fail fast from here
        self._requests.put(self._stop)
        self._collector.join()
        # A submit() that passed the _started check concurrently with stop()
        # may have enqueued BEHIND the sentinel; fail those futures instead
        # of leaving their callers blocked in fut.result() forever.
        while True:
            try:
                item = self._requests.get_nowait()
            except queue.Empty:
                break
            if item is self._stop:
                continue
            _img, fut, _t = item
            _safe_resolve(fut, exc=RuntimeError("InferenceServer stopped"))
        self._inflight.put(self._stop)
        self._drainer.join()

    def __enter__(self) -> "InferenceServer":
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def latency_ms(self) -> Dict[str, float]:
        """Observed submit→result latency percentiles (served requests)."""
        with self._lock:
            lat = np.asarray(self._latencies, dtype=np.float64) * 1e3
        if lat.size == 0:
            return {"n": 0}
        return {"n": int(lat.size), "mean": float(lat.mean()),
                "p50": float(np.percentile(lat, 50)),
                "p90": float(np.percentile(lat, 90)),
                "max": float(lat.max())}

    @property
    def mean_occupancy(self) -> float:
        b = self.stats["batches"]
        return self.stats["occupancy_sum"] / b if b else 0.0

    # ---- worker loops --------------------------------------------------------
    def _collect_loop(self):
        while True:
            item = self._requests.get()
            if item is self._stop:
                return
            reqs = [item]
            deadline = time.monotonic() + self.max_wait_s
            # coalesce up to the COMPILED batch (device_batch >= batch when
            # sharded over more devices than the requested batch size)
            while len(reqs) < self._device_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._requests.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._stop:
                    self._dispatch(reqs)
                    return
                reqs.append(nxt)
            self._dispatch(reqs)

    def _dispatch(self, reqs):
        try:
            self._dispatch_inner(reqs)
        except Exception as e:  # fail the batch, keep the server alive
            LOGGER.warning(f"serve: batch dispatch failed: {e}")
            for _img, fut, _t in reqs:
                _safe_resolve(fut, exc=e)

    def _dispatch_inner(self, reqs):
        x, metas = letterbox_batch([img for img, _fut, _t in reqs],
                                   self.imgsz)
        if len(reqs) < self._device_batch:  # pad to the one compiled shape
            pad_rows = np.zeros((self._device_batch - len(reqs),
                                 *x.shape[1:]), x.dtype)
            x = np.concatenate([x, pad_rows], axis=0)
        if self._mesh_ndev:
            x = jax.device_put(x, self._batch_sharding)
        out = self._infer(self.variables, x)  # async dispatch — do not block
        self.stats["batches"] += 1
        self.stats["requests"] += len(reqs)
        self.stats["occupancy_sum"] += len(reqs)
        self._inflight.put((reqs, metas, out))  # blocks at depth 2

    def _drain_loop(self):
        while True:
            item = self._inflight.get()
            if item is self._stop:
                return
            reqs, metas, out = item
            try:
                dets, counts = jax.device_get(out)
            except Exception as e:  # resolve futures instead of hanging callers
                for _img, fut, _t in reqs:
                    _safe_resolve(fut, exc=e)
                continue
            t_done = time.monotonic()
            for j, (img, fut, t_sub) in enumerate(reqs):
                try:
                    n = int(counts[j])
                    det = det_to_original(np.asarray(dets[j][:n]).copy(),
                                          self.imgsz, metas[j])
                    lat = t_done - t_sub
                    with self._lock:
                        self._latencies.append(lat)
                        if len(self._latencies) > 10000:
                            del self._latencies[:5000]
                    speed = {"preprocess": 0.0, "inference": lat * 1e3,
                             "postprocess": 0.0}
                    _safe_resolve(fut, Results(img, "", self.names, det,
                                               speed=speed))
                except Exception as e:  # one bad request must not kill the
                    _safe_resolve(fut, exc=e)  # drainer for the whole server
                    LOGGER.warning(f"serve: request postprocess failed: {e}")


def serve(model_holder, **kwargs) -> InferenceServer:
    """Build and start an InferenceServer on a model holder."""
    srv = InferenceServer(model_holder, **kwargs)
    return srv.start()
