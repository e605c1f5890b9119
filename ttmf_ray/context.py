"""Execution-context helpers shared by every pipeline.

Nothing here calls ``ray.init()`` — the driver / bench / test fixture owns
the Ray session.  These are thin utilities around DataContext tuning and
broadcasting small lookup structures through the object store (the
``ray.put`` once / read-per-actor pattern that replaces the reference's
copy-the-dict-into-every-worker-process approach, cf.
/root/reference/SearchPaths2.py:224-230).
"""

from __future__ import annotations

import os
from typing import Any

import ray


def tune_data_context(
    *,
    target_max_block_size: int | None = None,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    """Apply our default DataContext knobs (idempotent)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass


def num_cpus() -> int:
    """Logical CPUs of the current Ray session (fallback: os.cpu_count)."""
    if ray.is_initialized():
        try:
            return int(ray.cluster_resources().get("CPU", os.cpu_count() or 4))
        except Exception:
            pass
    return os.cpu_count() or 4


def auto_pool(frac: float = 1.0, lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the CURRENT cluster:
    (lo, max(2, num_cpus * frac)).  Fixed small maxima silently cap
    parallelism when the cluster grows (measured: (1, 8) pools pinned the
    32-CPU run to 8 actors → 0.6 scaling efficiency)."""
    return (lo, max(2, int(num_cpus() * frac)))


class Broadcast:
    """A small object shipped once to the object store and fetched lazily.

    Usage::

        bc = Broadcast(big_numpy_matrix)      # driver: ray.put once
        ds.map_batches(Stage, fn_constructor_kwargs={"emb": bc}, ...)
        # inside Stage.__init__:  self.emb = emb.get()   (zero-copy for numpy)

    Serializing a ``Broadcast`` only ships the ObjectRef, never the value,
    so an actor pool of size N fetches the value from the local object
    store (shared memory) instead of receiving N pickled copies.
    """

    def __init__(self, value: Any):
        self._ref = ray.put(value)

    def get(self) -> Any:
        return ray.get(self._ref)

    @property
    def ref(self):
        return self._ref
