"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic changefeed with partition-parallel reads and
native filter pushdown.

The reference's extract operators wrap engine-external sources behind
Airflow operators (`gcloud sql export` op A, the paged
`MySqlToGoogleCloudStorageOperator` op G — reference
`dags/cloudsql_to_bigquery.py:100-127`,
`dags/copy_cloudsql_to_bigquery_v2.py:82-95`).  The Spark-native
equivalent of "a paged API/changefeed extract" is a DataSource V2
implementation: `partitions()` declares the page split so every
executor pulls its own page in parallel (the reference serializes its
exports globally, `cloudsql_to_bigquery.py:284-287`), and
`pushFilters` lets the engine hand predicates to the source — the
`export_query` pushdown hook (op J) expressed through the real
Catalyst contract instead of string templating.

Rows are a pure function of ``event_id`` (md5-derived), so any reader
at any parallelism produces the identical table — the property the
tests pin.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _row(i: int) -> tuple[int, int, str, float]:
    """Deterministic row i: every field md5-derived from the id."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    user = int(h[:8], 16) % 1000
    etype = _EVENT_TYPES[int(h[8:10], 16) % len(_EVENT_TYPES)]
    value = round(int(h[10:16], 16) / 0xFFFFFF * 100.0, 6)
    return (i, user, etype, value)


class SyntheticChangefeedSource(DataSource):
    """``spark.read.format("synthetic_changefeed")`` after
    ``spark.dataSource.register(SyntheticChangefeedSource)``.

    Options: ``rows`` (total, default 1000), ``pages`` (parallel read
    partitions, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_changefeed"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticChangefeedReader":
        return SyntheticChangefeedReader(self.options)

    def simpleStreamReader(  # noqa: N802 (API name)
        self, schema
    ) -> "SyntheticChangefeedStreamReader":
        return SyntheticChangefeedStreamReader(self.options)


class SyntheticChangefeedReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_pages = int(options.get("pages", "8"))
        self.eq_type: str | None = None  # pushed event_type = 'x'
        self.min_id: int | None = None  # pushed event_id > n

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.eq_type = f.value
            elif isinstance(f, GreaterThan) and f.attribute == ("event_id",):
                # fully handled: generation simply starts past the bound
                self.min_id = int(f.value)
            else:
                yield f

    def partitions(self):
        lo = self.min_id + 1 if self.min_id is not None else 0
        total = max(self.n_rows - lo, 0)
        pages = max(self.n_pages, 1)
        per = -(-total // pages) if total else 0
        out = []
        for p in range(pages):
            start = lo + p * per
            end = min(lo + (p + 1) * per, self.n_rows)
            if start < end:
                out.append(InputPartition((start, end)))
        return out or [InputPartition((0, 0))]

    def read(self, partition) -> Iterator[tuple]:
        start, end = partition.value
        for i in range(start, end):
            row = _row(i)
            if self.eq_type is not None and row[2] != self.eq_type:
                continue
            yield row


class SyntheticChangefeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the changefeed: each micro-batch drains up to
    ``batch_rows`` new ids from the same deterministic row function, so
    stream and batch reads of the feed agree row-for-row (the
    batch-equivalence property the reference's daily full-copy sync
    assumes and never checks).

    Offsets are ``{"index": n}`` — a cursor into the feed.
    ``readBetweenOffsets`` REGENERATES any offset range on demand:
    replay after failure is exact because rows are a pure function of
    the id, which is precisely the contract a production changefeed
    source gets from a server-side log position."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "100"))

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"index": 0}

    def read(self, start: dict):
        lo = int(start["index"])
        hi = min(lo + self.batch_rows, self.n_rows)
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator, which generators don't support
        return (iter([_row(i) for i in range(lo, hi)]), {"index": hi})

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter([_row(i) for i in range(int(start["index"]), int(end["index"]))])
