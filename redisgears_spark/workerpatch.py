"""Per-task Python-worker overhead fix: skip redundant zipimport rescans.

Why: every PySpark task begins with `worker_util.setup_spark_files`, which
unconditionally calls `importlib.invalidate_caches()` (pyspark 4.1.2,
worker_util.py:144). On a worker whose `sys.path` contains zip archives
(pyspark.zip, py4j-src.zip, the spark-core jar — always, in any stock
deployment), each call makes every cached `zipimporter` re-read its whole
archive central directory. Measured on this engine's bench shapes: ~130 ms
of pure worker CPU per task, before user code runs — 60-80% of the entire
python-callback micro-batch cost, and the dominant term in the
trigger-vs-passthrough overhead ratio (a profiled task spends 0.51 s in
`zipimport._read_directory` out of 0.72 s total).

The invalidation exists so files shipped mid-session (SparkContext.addPyFile)
become importable. `worker_util.add_path` only mutates `sys.path` when a NEW
path arrives, so "something new was shipped" is observable as a `sys.path`
change — this patch makes the invalidation conditional on exactly that,
preserving the addPyFile contract while making the steady-state task
preamble O(len(sys.path)) instead of O(total zip entries).

Known (accepted) semantic narrowing: re-shipping a DIFFERENT archive under
an ALREADY-KNOWN path mid-session no longer invalidates zipimporter caches.
Directory-based imports are unaffected (FileFinder auto-invalidates via
directory mtime). This engine never re-ships archives; set
RG_NO_WORKER_PATCH=1 to disable the patch entirely.

`ensure()` is called at the top of every Arrow kernel this engine ships
(trigger processors, stateful reducers, similarity/multimodal/BPE kernels).
Each reused worker pays the stock preamble once — its first task — and is
patched from its second task on. Importing this module on the DRIVER is
harmless: the driver never runs `setup_spark_files`.
"""

from __future__ import annotations

import importlib
import os
import sys

_done = False


class _LazyInvalidator:
    """importlib facade whose invalidate_caches() only fires when sys.path
    has changed since the last call (the only signal setup_spark_files
    acts on — add_path inserts iff the path is new)."""

    def __init__(self, real):
        self._real = real
        self._last_path = list(sys.path)

    def invalidate_caches(self) -> None:
        if sys.path != self._last_path:
            self._real.invalidate_caches()
            self._last_path = list(sys.path)

    def __getattr__(self, attr):
        return getattr(self._real, attr)


def ensure() -> None:
    """Idempotent; ~100 ns after the first call. Safe on driver and worker."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("RG_NO_WORKER_PATCH"):
        return
    try:
        import pyspark.worker_util as wu

        if not isinstance(getattr(wu, "importlib", None), _LazyInvalidator):
            wu.importlib = _LazyInvalidator(importlib)  # type: ignore[assignment]
    except Exception:
        # never let an internal-layout change in pyspark break user jobs;
        # the patch is a perf fix, not a correctness dependency
        pass


def arrow_kernel(fn):
    """Wrap a mapInPandas/applyInPandas kernel so every worker that runs
    it installs the lazy-invalidation patch first. Use at the call site:
    `.mapInPandas(arrow_kernel(score), schema)` — the wrapper is what
    gets pickled, so ensure() runs worker-side before the kernel body."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        ensure()
        return fn(*args, **kwargs)

    return wrapper
