"""S8 in-engine: a Spark 4 Python DataSource for batched HTTP-API
ingest — the reference pulls remote metadata with a standalone fetch
script before Spark ever sees a file (ref: src/utils/utils.py:97-145,
src/utils/api.py:139-180); this connector makes the fetch a real scan
node instead, so remote ingest gets partitioned parallelism, column
pruning, and id-range FILTER PUSHDOWN from the engine for free.

Shape: the source reads an integer id keyspace [0, total) from a
JSON-POST endpoint ({"ids": [...]}  → {id: {field: value}}), split into
`partitions` contiguous ranges — one Spark task per range, each task
batching its ids through the shared rate-limited transport
(`operators/http_enrich.make_json_post_fetcher`: bounded retries,
Retry-After honoring). `pushFilters` (Spark 4.1) accepts >,>=,<,<=,=
predicates on `id` and narrows the requested ranges BEFORE any HTTP
call — the scan-time predicate discipline (S3) applied to a remote
API.

Scale: total request parallelism = partition count (the operational
rate knob, same as http_enrich's repartition contract); ranges are
contiguous so a deployment maps them onto API cursor/offset paging.
The deterministic fixture server in tests/test_sources.py drives the
whole path over real sockets.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = "id bigint, title string, year string"


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class HttpJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options["url"]
        self.total = int(options.get("total", "0"))
        self.n_partitions = int(options.get("partitions", "4"))
        self.batch_size = int(options.get("batchsize", "100"))
        # pushed id bounds, refined by pushFilters
        self.lo = 0
        self.hi = self.total

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Narrow [lo, hi) from id comparisons; everything else stays
        with Spark. Interpreted as the AND of all pushed filters."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("id",) or not hasattr(f, "value"):
                yield f
                continue
            v = f.value
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(v))
                self.hi = min(self.hi, int(v) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(v) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(v))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(v))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(v) + 1)
            else:
                yield f

    def partitions(self) -> Sequence[_IdRange]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_partitions)
        span = max(1, -(-(hi - lo) // n)) if hi > lo else 1
        out = []
        s = lo
        while s < hi:
            out.append(_IdRange(s, min(s + span, hi)))
            s += span
        return out or [_IdRange(0, 0)]

    def read(self, part: _IdRange) -> Iterator[tuple]:
        # import here: the reader ships to executor python workers
        from ..operators.http_enrich import make_json_post_fetcher

        fetch = make_json_post_fetcher(self.url)
        fields = [f.name for f in self.schema.fields if f.name != "id"]
        ids = [str(i) for i in range(part.start, part.end)]
        for off in range(0, len(ids), self.batch_size):
            chunk = ids[off : off + self.batch_size]
            hits = fetch(chunk)
            for k in chunk:
                meta = hits.get(k)
                if meta is not None:
                    yield (int(k), *[meta.get(f) for f in fields])


class HttpJsonDataSource(DataSource):
    """``spark.read.format("httpjson")`` — options: url (JSON POST
    endpoint), total (id keyspace size), partitions, batchsize."""

    @classmethod
    def name(cls) -> str:
        return "httpjson"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> HttpJsonReader:
        return HttpJsonReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "HttpJsonStreamReader":
        return HttpJsonStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpJsonDataSource)


class HttpJsonStreamReader(SimpleDataSourceStreamReader):
    """Cursor-paged streaming ingest from the same endpoint: the offset
    is the next unread id; each microbatch reads at most
    ``rows_per_batch`` ids and advances the cursor — the API-polling
    pattern (CrossRef-style cursor paging) as a first-class
    Structured Streaming source, checkpointable because the offset is
    a plain dict. Simple reader by design: API paging is driver-paced
    and rate-limited anyway (the batched fetch itself is the
    bottleneck, not partitioning); the batch reader above is the
    high-throughput path."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options["url"]
        self.total = int(options.get("total", "0"))
        self.rows_per_batch = int(options.get("rowsperbatch", "100"))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict) -> tuple:
        from ..operators.http_enrich import make_json_post_fetcher

        lo = int(start["next_id"])
        hi = min(lo + self.rows_per_batch, self.total)
        if hi <= lo:
            return iter([]), {"next_id": lo}
        fetch = make_json_post_fetcher(self.url)
        fields = [f.name for f in self.schema.fields if f.name != "id"]
        hits = fetch([str(i) for i in range(lo, hi)])
        rows = [
            (i, *[hits[str(i)].get(f) for f in fields])
            for i in range(lo, hi)
            if hits.get(str(i)) is not None
        ]
        return iter(rows), {"next_id": hi}
