"""Small Ray helpers shared by stages/pipelines."""

from __future__ import annotations


def shuffle_partitions(factor: int = 1, lo: int = 2, hi: int = 64) -> int:
    """Partition count for hash-shuffle groupbys/joins: ~`factor` per CPU.

    Hash-shuffle aggregators are actors; the default parallelism can
    exceed small clusters' CPUs and deadlock scheduling, so every
    groupby/join in this engine sizes its exchange explicitly.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, factor * cpus))
