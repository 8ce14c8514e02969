"""Worker thread hygiene.

Every executor Python worker imports this package (UDF closures); without
limits, each of up to 32 workers spawns its own full-width pyarrow CPU pool
and BLAS pool — 1000+ spin-waiting threads per host, measured as 64% system
CPU and a 4-10x slowdown at local[32]. One line per library fixes it:
kernels here are whole-array numpy inside already-parallel Spark tasks, so
intra-op parallelism is pure oversubscription.
"""

from __future__ import annotations

import os


def limit_worker_threads() -> None:
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "ARROW_IO_THREADS",
    ):
        os.environ.setdefault(var, "1")
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:  # pragma: no cover - arrow optional at import time
        pass
