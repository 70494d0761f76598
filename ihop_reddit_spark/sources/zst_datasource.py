"""`zstjsonl` — a Spark 4 Python Data Source for zstd-compressed
JSON-lines (the Pushshift dump format the reference pre-decompresses in a
shell stage, ``dvc.yaml:3-9``).

This is the engine-native surface for what ``sources/reddit.read_jsonl_zst``
does with binaryFile + ``mapInPandas``::

    spark.dataSource.register(ZstJsonlDataSource)
    df = (spark.read.format("zstjsonl").schema(ddl)
          .option("path", "dumps/RC_2023-01.zst").load())

Why a Data Source and not the mapInPandas bridge: the planner sees a real
scan with one task per ``.zst`` file (single-frame zstd is not splittable
— one file per task IS the parallelism ceiling, the reference's
one-dump-per-month unit), files enumerate at planning time instead of
through a binaryFile scan, and the reader composes with everything a scan
supports (select/filter pushdown happens after parse, as with Spark's own
JSON source).

Corrupt handling: a line that fails to parse yields NULL for every data
field; when the schema carries ``_corrupt_record`` the raw line lands
there (PERMISSIVE semantics, same contract as ``read_jsonl``).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CORRUPT_COL = "_corrupt_record"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ZstJsonlReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        path = options.get("path")
        if not path:
            raise ValueError("zstjsonl requires a path")
        if os.path.isdir(path):
            self.files = sorted(
                glob.glob(os.path.join(path, "**", "*.zst"), recursive=True)
            )
        else:
            self.files = sorted(glob.glob(path)) or [path]

    def partitions(self) -> Sequence[InputPartition]:
        # one task per file: single-frame zstd is not splittable
        return [_FilePartition(f) for f in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow as pa  # executor-side import

        names = [f.name for f in self.schema.fields]
        data_names = [n for n in names if n != CORRUPT_COL]
        has_corrupt = CORRUPT_COL in names
        with pa.input_stream(partition.path, compression="zstd") as stream:
            buf = b""
            while True:
                chunk = stream.read(1 << 20)
                if not chunk:
                    break
                buf += chunk
                *lines, buf = buf.split(b"\n")
                yield from self._parse(lines, names, data_names, has_corrupt)
            if buf.strip():
                yield from self._parse([buf], names, data_names, has_corrupt)

    @staticmethod
    def _parse(lines, names, data_names, has_corrupt):
        for raw in lines:
            if not raw.strip():
                continue
            try:
                obj = json.loads(raw)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
                row = {n: obj.get(n) for n in data_names}
                if has_corrupt:
                    row[CORRUPT_COL] = None
            except (ValueError, json.JSONDecodeError):
                row = {n: None for n in data_names}
                if has_corrupt:
                    row[CORRUPT_COL] = raw.decode("utf-8", "replace")
            yield tuple(row[n] for n in names)


class ZstJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "zstjsonl"

    def schema(self):
        raise ValueError(
            "zstjsonl is schema-on-read: pass .schema(...) explicitly "
            "(the engine's fixed-schema contract, sources/reddit.py)"
        )

    def reader(self, schema: T.StructType) -> ZstJsonlReader:
        return ZstJsonlReader(schema, self.options)


# ---------------------------------------------------------------------------
# `eventgen` — a Spark 4 Python STREAMING data source: a deterministic,
# replayable synthetic event stream (the testing/demo twin of a Kafka
# topic). Offsets are plain row counters, every field is a pure function
# of the row index (md5-free integer mixing), so any (start, end) range
# replays bit-identically — exactly-once semantics fall out of
# determinism + offset tracking, and tests can assert exact batch
# contents. Usage:
#
#     spark.dataSource.register(EventGenDataSource)
#     (spark.readStream.format("eventgen")
#           .option("rowsPerBatch", 100).load())
#
# Schema mirrors the events table: event_id, user_id, event_type, value.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("view", "click", "purchase", "refund", "error")


def _gen_rows(start: int, end: int):
    for i in range(start, end):
        mixed = (i * 2654435761) % (1 << 32)  # Knuth multiplicative hash
        yield (
            i,
            mixed % 1000,
            _EVENT_TYPES[mixed % len(_EVENT_TYPES)],
            round((mixed % 10_000) / 100.0, 2),
        )


class EventGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 0))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        begin = start["offset"]
        end = begin + self.rows_per_batch
        if self.max_rows:
            end = min(end, self.max_rows)
        # a list-backed ITERATOR: the runtime drives it with next() AND
        # pickles it into the prefetch cache (a plain generator fails the
        # pickle, a bare list fails the next())
        return iter(list(_gen_rows(begin, end))), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay — the recovery path after a failure
        return iter(list(_gen_rows(start["offset"], end["offset"])))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator has no retained state


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self):
        return (
            "event_id long, user_id long, event_type string, value double"
        )

    def simpleStreamReader(self, schema) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)
