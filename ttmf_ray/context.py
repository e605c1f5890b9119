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

import numpy as np
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


def auto_pool(frac: float = 1.0, lo: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the CURRENT cluster:
    (hi/4, hi) with hi = max(2, num_cpus * frac).  Fixed small maxima
    silently cap parallelism when the cluster grows (measured: (1, 8)
    pools pinned the 32-CPU run to 8 actors → 0.6 scaling efficiency);
    a min of hi/4 pre-starts a quarter of the pool so short stages do not
    spend their whole wall ramping one actor at a time."""
    hi = max(2, int(num_cpus() * frac))
    if lo is None:
        lo = max(1, hi // 4)
    return (lo, hi)


def pool_resources(num_gpus: float | None = None,
                   num_cpus_per_actor: float | None = None) -> dict:
    """kwargs for ``map_batches`` actor pools carrying per-actor resource
    requests (the north-star GPU knob: extraction/scoring pools take
    ``num_gpus=g`` per actor and Ray schedules them onto GPU nodes; on
    this CPU-only sandbox the knob must simply be absent/0)."""
    out: dict = {}
    if num_gpus:
        out["num_gpus"] = num_gpus
    if num_cpus_per_actor:
        out["num_cpus"] = num_cpus_per_actor
    return out


def spread(ds, blocks_per_cpu: int = 4):
    """Split a small in-memory Dataset into enough blocks to feed a pool.

    ``rd.from_pandas`` yields ONE block; a downstream actor-pool
    map_batches then runs effectively serial regardless of pool size
    (measured: a 21.5k-row single-block input pinned a 32-actor stage to
    ~1 task at a time).  Order-preserving split (no shuffle)."""
    return ds.repartition(max(2, num_cpus() * blocks_per_cpu))


def half_up(x, dp: int):
    """Deterministic half-UP rounding shared with the SQL mirrors.

    ``np.round`` is half-to-even while DuckDB ``ROUND`` is
    half-away-from-zero: a non-negative dyadic ratio that lands exactly
    on the rounding grid's half (e.g. jaccard 25/32 = 0.78125 at 4 dp)
    rounds DIFFERENTLY in the two engines.  Both sides therefore use
    the one rule ``floor(x·10^dp + 0.5) / 10^dp`` (SQL spells it the
    same way).  Only valid for x ≥ 0 — for signed values floor() is
    half-up toward +inf on negatives, so the SQL twin must use the
    identical floor expression, not ROUND."""
    f = 10.0 ** dp
    return np.floor(np.asarray(x, dtype=np.float64) * f + 0.5) / f


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

    @classmethod
    def from_ref(cls, ref) -> "Broadcast":
        """Wrap an EXISTING ObjectRef (e.g. produced by a remote assembler
        task) without round-tripping the value through the driver."""
        bc = cls.__new__(cls)
        bc._ref = ref
        return bc

    def get(self) -> Any:
        return ray.get(self._ref)

    @property
    def ref(self):
        return self._ref
