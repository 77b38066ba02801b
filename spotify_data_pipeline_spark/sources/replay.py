"""Spark 4 Python STREAMING DataSource: deterministic event replay.

``spark.readStream.format("events_replay")`` turns a parquet events
fixture into a Structured Streaming source that replays rows in
(ts, event_id) order, ``batch_rows`` per micro-batch — the standard
harness for testing/backfilling streaming pipelines against recorded
data (watermark calibration, stateful-operator regression, the
stream≡batch twin checks this repo leans on) without wiring Kafka.

Scope stated honestly: this is the SIMPLE stream-reader API — rows are
produced driver-side, which is exactly right for a test/replay source
over a bounded recording and exactly wrong for a production firehose
(that is what the partition-based reader API and real brokers are
for). Offsets are plain row indexes into the time-sorted recording,
so restarts resume exactly and every micro-batch is reproducible
byte-for-byte (same recording + same batch_rows => same batches —
determinism the streaming tests can pin).

Options:
    path        parquet file/dir of events (required)
    batch_rows  rows per micro-batch (default 500)

Cites: reference ingestion is batch-only daily pulls
(spotify_etl_v2.py:405-435); this source adds the streaming-replay
axis the reference lacks, mapping its raw-zone recordings onto
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

__all__ = ["EventReplayDataSource", "register_replay_source"]

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("events_replay requires the 'path' option")
        self._batch = int(options.get("batch_rows", "500"))
        if self._batch <= 0:
            raise ValueError("batch_rows must be positive")
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        rows = []
        data = {c: tbl.column(c).to_pylist() for c in cols}
        for i in range(tbl.num_rows):
            rows.append(tuple(data[c][i] for c in cols))
        # deterministic replay order: event time, then id
        rows.sort(key=lambda r: (r[1], r[0]))
        self._rows = rows

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        i = start["idx"]
        chunk = self._rows[i : i + self._batch]
        return iter(chunk), {"idx": i + len(chunk)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows[start["idx"] : end["idx"]])

    def commit(self, end: dict) -> None:  # replay keeps everything
        pass


class EventReplayDataSource(DataSource):
    """``format("events_replay")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema) -> _ReplayStreamReader:
        return _ReplayStreamReader(dict(self.options))


def register_replay_source(spark) -> None:
    spark.dataSource.register(EventReplayDataSource)
