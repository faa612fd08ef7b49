"""Materialization barrier shared by every operator that must pin ONE
evaluation of a nondeterministic subplan (range-partition sampling,
sort ties, sampled signatures) before multiple readers consume it.

Two physical forms, chosen by session configuration:

- ``SparkContext.setCheckpointDir`` configured → **reliable
  checkpoint**: the pinned data is written to the checkpoint dir
  (HDFS/object store on a real cluster), so executor loss — dynamic
  allocation, spot preemption, node failure — is survivable: lost
  partitions re-read from storage instead of failing the job.
  This is the 100 TB posture.
- no checkpoint dir (local runs, tests, the sandbox) → **executor-local
  checkpoint**: fast, no external storage needed, with the documented
  caveat that checkpoint blocks die with their executor
  (scripts/demo_fault_tolerance.py pins this behavior).

Eager by default, deliberately: a lazy barrier leaves a window where
two branches of the same action can recompute the subplan and observe
DIFFERENT data (exactly the silent-wrong-answer mode the barrier
exists to close). Eager materialization closes the window before any
consumer runs; the cost is one up-front job, which every call site
accepts as the price of determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Pin one evaluation of ``df``: reliable ``checkpoint`` when the
    session has a checkpoint dir configured, else ``localCheckpoint``.
    See the module docstring for the fault-tolerance trade."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
