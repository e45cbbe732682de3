"""Profile the inference pipeline on the real TPU: forward vs forward+NMS
at several pre_topk values and batch sizes.

Timing protocol (CLAUDE.md): block_until_ready lies through the axon tunnel;
dispatch N calls back-to-back, then force one jax.device_get on the last
output — total/N amortizes the ~27 ms tunnel round-trip.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, args, n=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    mh = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml", dtype=jnp.bfloat16).fuse()
    variables = jax.device_put(mh.variables)  # pin on device once
    rng = np.random.default_rng(0)

    for batch in (64, 128, 256):
        x = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)).astype(np.float32),
                        dtype=jnp.bfloat16)

        @jax.jit
        def fwd(vs, img):
            decoded, _ = mh.model.apply(vs, img, train=False)
            return decoded

        t = timeit(fwd, (variables, x))
        print(f"b{batch} fwd-only: {t*1e3:.1f} ms  {batch/t:.1f} img/s", flush=True)

        for ptk in (1024, 256):
            @jax.jit
            def full(vs, img, _ptk=ptk):
                decoded, _ = mh.model.apply(vs, img, train=False)
                return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7,
                                           max_det=300, pre_topk=_ptk)

            t = timeit(full, (variables, x))
            print(f"b{batch} fwd+nms ptk={ptk}: {t*1e3:.1f} ms  {batch/t:.1f} img/s",
                  flush=True)
