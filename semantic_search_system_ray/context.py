"""Execution-context tuning.

Ray Data's defaults (min_parallelism=200, hash-shuffle parallelism=200)
are sized for big multi-node clusters; on an N-CPU node they fragment
small shuffles into hundreds of micro-tasks whose fixed cost dominates.
``tune(num_cpus)`` scales those knobs to the session — call it from the
process that owns ``ray.init`` (bench.py, CLIs, test fixture). Library
code never mutates the context: the driver owns it.

At real cluster scale the same function applies: pass total cluster CPUs
and the shuffle fan-out grows back to hundreds of partitions.
"""

from __future__ import annotations


def tune(num_cpus: int) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    par = max(8, 2 * num_cpus)
    ctx.min_parallelism = par
    ctx.default_hash_shuffle_parallelism = par
    # Per-operator CPU reservation splits the session's CPUs across every
    # operator in the DAG; with a multi-stage plan the hot map stage ends
    # up with a fraction of the cores (measured: ~12 of 32 running).
    # Disable it — backpressure still bounds memory via block budgets.
    ctx.op_resource_reservation_enabled = False
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
