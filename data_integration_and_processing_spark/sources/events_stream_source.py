"""Custom Python STREAMING data source (Spark 4): deterministic replay of
the events fixture as an offset-tracked stream.

The streaming pipelines elsewhere stage micro-batches as parquet chunk
files; this source exercises Spark's actual streaming-source contract
instead — ``initialOffset`` / ``read(start) -> (rows, nextOffset)`` /
``readBetweenOffsets`` for retry replay / ``commit`` — so exactly-once
semantics come from offset bookkeeping, not file ordering. Offsets are
``{"next_id": N}`` over the total event_id order; a replay between two
committed offsets is bit-identical by construction, which is the property
checkpoint recovery needs.

The Simple reader variant routes data through the driver (the API's
prototyping tier, matching this fixture's size); the partition-based
``DataSourceStreamReader`` is the executor-parallel upgrade with the same
offset algebra.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        import pyarrow.parquet as pq  # noqa: PLC0415

        path = options.get("path")
        if not path:
            raise ValueError("events-replay source requires .option('path', ...)")
        self._batch_rows = int(options.get("batchrows", 2000))
        t = pq.read_table(path, columns=["event_id", "user_id", "event_type", "value"])
        rows = sorted(
            zip(
                t.column("event_id").to_pylist(),
                t.column("user_id").to_pylist(),
                t.column("event_type").to_pylist(),
                t.column("value").to_pylist(),
            )
        )
        self._rows = rows
        self._max_id = rows[-1][0] if rows else -1

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def _slice(self, start_id: int, end_id: int):
        return [r for r in self._rows if start_id <= r[0] < end_id]

    def read(self, start: dict):
        lo = int(start["next_id"])
        if lo > self._max_id:
            return iter([]), start
        batch = self._rows_from(lo)
        hi = (batch[-1][0] + 1) if batch else lo
        return iter(batch), {"next_id": hi}

    def _rows_from(self, lo: int):
        out = []
        for r in self._rows:
            if r[0] >= lo:
                out.append(r)
                if len(out) >= self._batch_rows:
                    break
        return out

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._slice(int(start["next_id"]), int(end["next_id"])))

    def commit(self, end: dict) -> None:
        pass  # offsets are positions into an immutable fixture; nothing to release


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def simpleStreamReader(self, schema) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)
