"""Default XLA compiler options for the package's TPU compiles.

The l-scale C2f bottleneck 128->128 convs stall on async scoped-memory
copies under XLA's default 16 MiB scoped-VMEM budget: two of the three
identical convs run at 30% of their standalone SOL while the third hits
91% (README two-resource accounting row; the stall is scheduling, not an
emitter ceiling). XLA_FLAGS cannot carry TPU-only knobs through the axon
tunnel (the LOCAL flag parser aborts on them before the remote compile),
but per-compile `compiler_options` serialize into the PJRT compile
request. The sweep in tools/c2f_sweep_inproc.py (runs/c2f_sweep_l.json)
measured `xla_tpu_scoped_vmem_limit_kib=24576` worth +8% end-to-end on
the l-scale serving program (948 -> 1026 img/s at b128/640px) with
latency-hiding-scheduler toggles neutral, so 24 MiB is the package
default for TPU compiles. Measured per-program before adoption (see
README "scoped-VMEM default" row): l +8%, n/s/m and the train step
neutral-to-positive.

Override with MGDT_SCOPED_VMEM_KIB=<int> (0 disables entirely); options
are only attached when the backend is a real TPU — CPU/GPU compiles and
the 8-virtual-device CPU test mesh see `None`.

No reference analog: the reference's CUDA path has no scoped-memory
scheduler to budget (closest in spirit to its cudnn.benchmark toggle,
/root/reference/yolo/engine/trainer.py:228).
"""
from __future__ import annotations

import os
from typing import Optional

_DEFAULT_KIB = 24576


def tpu_compiler_options(backend: Optional[str] = None) -> Optional[dict]:
    """Compiler options for `jax.jit(..., compiler_options=...)`.

    Returns None (jit's default) unless the resolved backend is TPU, so
    call sites can pass the result unconditionally.
    """
    import jax

    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # no backend at all (docs builds etc.)
            return None
    if backend != "tpu":
        return None
    kib = int(os.environ.get("MGDT_SCOPED_VMEM_KIB", _DEFAULT_KIB))
    if kib <= 0:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
