"""Scale-adaptive input spreading for CPU-dense pipelines.

The fixture tables are single-row-group parquet, so their scans are
one task regardless of core count — and any compute-dense map work
fused into the scan stage (shingling, per-token md5, regex profiling)
runs serially while the rest of the machine idles. ``spread_cpu``
repartitions ONLY when the input has fewer partitions than the
session's parallelism: at production split counts (every real table at
scale is many files/row groups) the condition is false and no shuffle
is added, so this is the "derive partitioning from the input" rule,
not a local-mode constant.

Only use it in front of per-row CPU-heavy work whose results are
partition-order independent (hash/agg/join shapes — everything in the
dedup/text tiers); the round-robin spread changes row placement, never
row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_cpu(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the default parallelism iff the plan
    currently has fewer partitions; identity otherwise.

    RESTRICTION: only apply to SCAN-ROOTED inputs (a table read plus
    narrow projections/filters). The partition probe converts the plan
    to an RDD, which (a) forces full physical planning of the subtree
    on the driver per call, and (b) for inputs downstream of a shuffle
    reports the static pre-AQE partition count
    (``spark.sql.shuffle.partitions``), not the AQE-coalesced runtime
    count — so after a shuffle the guard can silently mis-decide (skip
    spreading a plan AQE will coalesce to one partition). Every current
    call site is scan-rooted; keep it that way.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# Cap on the row count of a FORCED broadcast vector. A (long, long)
# node vector is ~16 B of data per row but several times that as the
# built HashedRelation, so 8M rows keeps the relation in the
# few-hundred-MB range — far under Spark's hard 8 GB / 512M-row
# broadcast cap and a sane share of driver/executor heap.
BROADCAST_MAX_ROWS = 8_000_000


def broadcast_if_small(
    df: DataFrame, n_rows: int, max_rows: int = BROADCAST_MAX_ROWS
) -> DataFrame:
    """Size-guarded broadcast hint for per-round node-vector joins.

    The iterative graph loops join a checkpointed edge table against a
    per-round O(|nodes|) vector. The explicit hint is required locally
    because checkpointed (RDD-scan) frames carry no runtime stats, so
    AQE never auto-broadcasts against them — but a hint FORCES the
    broadcast (AQE will not demote it), and node cardinality grows
    linearly with scale: at TPC-H-proportioned 100 TB (SF ~ 1e5),
    suppliers ~ 1e9 and the rank vector is a ~16 GB relation, over
    Spark's hard 8 GB / 512M-row broadcast limit and any sane driver
    heap — a hard query failure where a shuffle join merely degrades.

    ``n_rows`` is an upper bound on the vector's row count the caller
    already has (an exact node count, or the checkpointed edge count
    that bounds it — one no-shuffle count on an already-materialized
    RDD, amortized over every round of the loop). Above ``max_rows``
    the frame is returned unhinted and the planner's sort-merge /
    shuffled-hash join degrades gracefully.
    """
    if n_rows <= max_rows:
        return F.broadcast(df)
    return df


def full_width(spark) -> int:
    """Partition count for an EXPLICIT repartition of a compute-dense
    shuffle: the session's shuffle-partition setting, floored at the
    core count. Locally both are the core count; on a cluster profile
    shuffle.partitions is the tuned (large) value, so a fixed-width
    exchange derived from this never drops below either knob. Use where
    AQE's byte-based advisory sizing is the wrong objective — a small-
    byte exchange carrying superlinear compute (pair fan-out joins,
    wedge enumeration) that coalescing would serialize (guide §2.5)."""
    return max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
