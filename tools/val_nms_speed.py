"""Val-protocol NMS cost on the real TPU: monolithic 4096² fixpoint vs the
two-stage blocked walk (ops/nms.py _blocked_keep), plus output equality.

Usage: python tools/val_nms_speed.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=16, A=6400, nc=2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(0)
    # dense val-like prediction tensor: (B, 4+nc, A), xywh + scores
    cxy = rng.uniform(0, 640, (batch, 2, A))
    wh = rng.uniform(10, 120, (batch, 2, A))
    scores = (rng.uniform(0, 1, (batch, nc, A)) ** 4)  # low-conf flood
    pred = jnp.asarray(np.concatenate([cxy, wh, scores], 1), jnp.float32)

    kw = dict(conf_thres=0.001, iou_thres=0.7, max_det=300, pre_topk=4096,
              multi_label=True, nc=nc)
    mono = jax.jit(lambda p: non_max_suppression(p, **kw))
    blk = jax.jit(lambda p: non_max_suppression(p, block=1024, **kw))

    def run(fn, tag):
        t0 = time.perf_counter()
        out = fn(pred)
        jax.device_get(out[1].ravel()[:1])
        print(f"{tag} compile: {time.perf_counter() - t0:.1f} s", flush=True)
        n = 40
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(pred)
        jax.device_get(out[1].ravel()[:1])
        # dispatches pipeline on-device; one ~27 ms tunnel sync at the end
        dt = (time.perf_counter() - t0 - 0.027) / n * 1e3
        print(f"{tag}: {dt:.2f} ms/batch ({dt / batch:.3f} ms/img)",
              flush=True)
        return out

    da, na = run(mono, "monolithic 4096^2")
    db, nb = run(blk, "blocked 4x(1024)")
    assert (np.asarray(na) == np.asarray(nb)).all(), "counts diverge"
    np.testing.assert_allclose(np.asarray(db), np.asarray(da), atol=1e-4)
    print("outputs identical OK")


if __name__ == "__main__":
    main(*(int(v) for v in sys.argv[1:]))
