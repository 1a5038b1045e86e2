"""Small Ray helpers shared by stages/pipelines."""

from __future__ import annotations


def _tune_aggregator_pool(cpus: int) -> None:
    """Cap the hash-shuffle aggregator-actor pool at ~cpus/4 (floor 8).

    Aggregators mostly concatenate received partitions; one actor can
    serve several partitions (Ray scales its CPU share by the ratio).
    Fewer actors = fewer worker-process startups per exchange — measured
    interleaved at 32 cpus / 400k pages: pair exchange 33.2/38.1 s with
    64 aggregators vs 31.5/34.7 s with 8 (both rounds favor fewer). The
    cap scales with cluster CPUs, so a multi-node cluster still gets
    enough SPREAD aggregators to use every node's memory bandwidth."""
    try:
        from ray.data.context import DataContext

        DataContext.get_current().max_hash_shuffle_aggregators = max(
            8, cpus // 4
        )
    except Exception:  # pragma: no cover — older ray
        pass


def shuffle_partitions(factor: int = 1, lo: int = 2, hi: int = 64) -> int:
    """Partition count for hash-shuffle groupbys/joins: ~`factor` per CPU.

    Hash-shuffle aggregators are actors; the default parallelism can
    exceed small clusters' CPUs and deadlock scheduling, so every
    groupby/join in this engine sizes its exchange explicitly. As a
    side effect (deliberate: this runs after ray.init, when cluster
    CPUs are knowable, unlike the import-time config in __init__.py)
    the aggregator pool cap is tuned to the cluster size."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    _tune_aggregator_pool(cpus)
    return max(lo, min(hi, factor * cpus))


def sized_partitions(
    n_rows: int, rows_per_part: int = 200_000, lo: int = 2, hi: int | None = None
) -> int:
    """Data-aware partition count for hash exchanges whose input row
    count is already known (e.g. from a materialized upstream): fixed
    per-aggregator-actor overhead dominates small exchanges, so size
    partitions to ~``rows_per_part`` rows each instead of always paying
    for one actor per CPU. Clamped to [lo, shuffle_partitions()]."""
    cap = shuffle_partitions() if hi is None else hi
    import math

    return max(lo, min(cap, math.ceil(max(1, n_rows) / rows_per_part)))


def join_partitions(lo: int = 2, hi: int = 64) -> int:
    """Partition count for ``Dataset.join``: ~cpus/2. Join aggregators
    are heavier actors than groupby's — measured on a 32-cpu node, a
    150k x 150k join runs 4.2s at 8 partitions vs 7.7s at 32 (actor
    startup dominates); cpus/2 balances that against per-partition
    memory at scale."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus // 2))
