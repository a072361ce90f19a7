"""Live HTTP enrichment seam (SURVEY §2.7): the reference's CrossRef /
Semantic Scholar fetchers (``/root/reference/src/utils/api.py``) as
rate-limited, Arrow-batched ``mapInPandas`` stages — the one surface
where Python-in-the-loop is legitimate, because the work is IO, not
compute.

Deterministic by default: the transport is injectable, and the offline
default raises unless a fetcher is supplied — tests plug a fake; a
deployment plugs requests/httpx. The *join semantics* (key priority,
fallback, drop-on-miss) live in plans/arxiv_enrich.py and are identical
whether the lookup table came from this live path or from a staged file.

Scale design mirrors the reference's operational knobs (BASELINE.md):
batched POSTs (100 ids/request), a token-bucket rate limit per
*partition* (the reference's 1 rps / 10 rps limits were process-global;
here each task gets budget/num_partitions), bounded retries with
Retry-After honoring. Partition count therefore controls total request
parallelism — repartition(n) IS the rate knob.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# fetcher: (list of keys) -> {key: json-ish dict} — injected transport
Fetcher = Callable[[list[str]], dict[str, dict]]

BATCH_SIZE = 100  # ref: api.py:95 S2_PAPERS_BATCH_SIZE
DEFAULT_RPS = 1.0  # ref: api.py:139-140 @limits(calls=1, period=1)


class TokenBucket:
    """Minimal per-task rate limiter (monotonic clock, blocking)."""

    def __init__(self, rps: float):
        self.min_interval = 1.0 / rps if rps > 0 else 0.0
        self._next = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        if now < self._next:
            time.sleep(self._next - now)
        self._next = max(now, self._next) + self.min_interval


def enrich_by_key(
    df: DataFrame,
    key_col: str,
    fetcher: Fetcher,
    out_fields: list[str],
    rps: float = DEFAULT_RPS,
    batch_size: int = BATCH_SIZE,
) -> DataFrame:
    """Fetch per-key metadata over HTTP in batches; returns the input
    keys + fetched fields (null row on miss → caller applies J9
    drop/fallback logic relationally).

    mapInPandas keeps Arrow batching; within a partition, keys are
    chunked to ``batch_size`` per request and the token bucket paces
    requests. Misses come back as nulls, never exceptions — transient
    HTTP failure must not kill a 10-hour job (retry/backoff belongs in
    the fetcher transport).
    """
    schema = StructType(
        [StructField(key_col, StringType())]
        + [StructField(f, StringType()) for f in out_fields]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rps)
        for pdf in batches:
            keys = [k for k in pdf[key_col].dropna().unique().tolist()]
            hits: dict[str, dict] = {}
            for i in range(0, len(keys), batch_size):
                bucket.acquire()
                try:
                    hits.update(fetcher(keys[i : i + batch_size]))
                except Exception:
                    # transient batch failure = all-miss for this chunk
                    pass
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    **{
                        f: pdf[key_col].map(
                            lambda k: (hits.get(k) or {}).get(f)
                        )
                        for f in out_fields
                    },
                }
            )

    return df.select(key_col).mapInPandas(run, schema=schema)


def make_json_post_fetcher(
    url: str,
    timeout: float = 10.0,
    max_retries: int = 3,
    backoff: float = 0.2,
) -> Fetcher:
    """Real-socket transport over stdlib urllib — the deployment
    counterpart of the injectable test fakes, mirroring the reference
    fetchers' operational semantics (ref: src/utils/api.py:139-180):
    one batched POST per chunk ({"ids": [...]}), bounded retries with
    exponential backoff, and 429/503 honoring ``Retry-After`` before
    the generic backoff. The returned closure captures only plain
    constants, so it ships cleanly to executor Python workers.

    Response contract: a JSON object {key: {field: value, ...}, ...};
    null entries are treated as misses (dropped so the caller's
    fallback logic sees a plain miss)."""

    def fetch(keys: list[str]) -> dict[str, dict]:
        import json
        import urllib.error
        import urllib.request

        body = json.dumps({"ids": keys}).encode()
        delay = backoff
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(
                    url,
                    data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                    return {k: v for k, v in payload.items() if v is not None}
            except urllib.error.HTTPError as e:
                if e.code in (429, 503) and attempt < max_retries:
                    retry_after = e.headers.get("Retry-After")
                    time.sleep(
                        float(retry_after) if retry_after else delay
                    )
                    delay *= 2
                    continue
                raise
            except (urllib.error.URLError, TimeoutError):
                if attempt < max_retries:
                    time.sleep(delay)
                    delay *= 2
                    continue
                raise
        raise RuntimeError("unreachable")  # pragma: no cover

    return fetch
