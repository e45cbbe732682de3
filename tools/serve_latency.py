"""Measure the micro-batching InferenceServer on the real TPU.

Protocol: a Poisson-ish open-loop client submits `n_req` single images from
`n_client` threads; we report end-to-end submit->result latency percentiles
and delivered throughput, against the batch-1 closed-loop baseline the
reference's latency harness would measure (nn/standard_cal_inference_time.py
protocol: mean per-image ms, 640px).

Usage: python tools/serve_latency.py [batch] [n_req] [imgsz]
"""
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=8, n_req=128, imgsz=640):
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.engine.serve import InferenceServer
    from mgdt_yolo_tpu.nn.tasks import DetectionModel

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml",
                        dtype=jnp.bfloat16).fuse()
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
            for _ in range(16)]

    srv = InferenceServer(mh, batch=batch, max_wait_ms=2.0, imgsz=imgsz,
                          conf=0.25).start()
    try:
        srv.predict(imgs[0])  # compile + settle
        t0 = time.perf_counter()
        futs = []
        lock = threading.Lock()

        def client(k):
            for i in range(n_req // 4):
                f = srv.submit(imgs[(k * 31 + i) % len(imgs)])
                with lock:
                    futs.append(f)
        threads = [threading.Thread(target=client, args=(k,)) for k in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in futs:
            f.result(timeout=600)
        wall = time.perf_counter() - t0
        lat = srv.latency_ms()
        print(f"served {len(futs)} reqs in {wall:.2f}s "
              f"({len(futs) / wall:.1f} req/s), "
              f"batches {srv.stats['batches']}, "
              f"mean occupancy {srv.mean_occupancy:.2f}")
        print(f"latency ms: p50 {lat['p50']:.1f} p90 {lat['p90']:.1f} "
              f"mean {lat['mean']:.1f} max {lat['max']:.1f}")
    finally:
        srv.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
