"""Custom STREAMING Python DataSource (Spark 4
`pyspark.sql.datasource` API): a deterministic synthetic event-tick
source — the streaming complement of the batch tile source in
`rastergen.py`.

The reference has no event streams (its "streaming" is bounded
sequential I/O, SURVEY §1.4); this source exists for the §2.8
extension surface: it demonstrates how an external feed (a queue, a
sensor bus, a commit log) is exposed to Structured Streaming
Spark-natively. The contracts that matter at scale, all expressed
here:

- **Offsets are the replay log.** `initialOffset`/`latestOffset`
  bound each micro-batch as a [start, end) tick range; a restart from
  checkpoint re-reads the same range and MUST see the same rows.
  Rows are a pure integer function of (tick, partition, seq), so
  replay determinism holds by construction — the same property
  `rastergen` uses for task retries.
- **partitions() shards each batch.** Every micro-batch fans out as
  one `InputPartition` per (tick, shard): executors read only their
  shard, no driver-side row funnel, scan parallelism = shard count.
- **Arrow batches cross the boundary.** Each partition yields one
  RecordBatch, not per-row pickled tuples.

`latestOffset` reports a fixed MAX_TICKS head so availableNow drains
to a bounded, reproducible table in tests; a production adapter would
instead report the external feed's live head each trigger.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

N_SHARDS = 4
EVENTS_PER_SHARD_TICK = 25
MAX_TICKS = 8


def event_row(tick: int, shard: int, seq: int) -> tuple[int, int, int, float]:
    """Pure function of the coordinates — the replay-determinism
    contract. user_id/value mimic the events fixture's shape."""
    uid = (tick * 131 + shard * 17 + seq * 7) % 50
    value = float((tick * 31 + shard * 13 + seq) % 997) / 10.0
    return tick, shard, uid, value


class EventGenStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.max_ticks = int(options.get("max_ticks", MAX_TICKS))

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        # the feed's current head. availableNow snapshots this ONCE at
        # query start and drains [start, head), so a bounded source
        # must report its full extent here — a production adapter
        # returns the external feed's real head and the stream simply
        # keeps following it trigger by trigger.
        return {"tick": self.max_ticks}

    def partitions(self, start, end):
        return [
            InputPartition((t, s))
            for t in range(start["tick"], end["tick"])
            for s in range(N_SHARDS)
        ]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        tick, shard = partition.value
        seq = np.arange(EVENTS_PER_SHARD_TICK)
        uid = (tick * 131 + shard * 17 + seq * 7) % 50
        value = ((tick * 31 + shard * 13 + seq) % 997) / 10.0
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(len(seq), tick, dtype=np.int64)),
                pa.array(np.full(len(seq), shard, dtype=np.int32)),
                pa.array(uid.astype(np.int64)),
                pa.array(value.astype(np.float64)),
            ],
            names=["tick", "shard", "user_id", "value"],
        )

    def commit(self, end):
        pass  # nothing to clean up: the source is synthetic


class EventGenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "tick long, shard int, user_id long, value double"

    def streamReader(self, schema) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventGenSource)
