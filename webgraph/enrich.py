"""Enrichment pass — the observer/event-handler subsystem as a batch stage.

The reference's extension point is GraphObserver: on every page mutation an
event fans out over a bounded queue to handler threads that call external
APIs and write properties back (GraphObserver.java:96-119,
FacebookAndTwitterEventHandler.java:52-66, SURVEY §2.9 E4-E5). In batch
dataflow this collapses to:

    to_do   = pages WHERE facebook_total_count IS NULL      (shouldIgnore)
    fetched = mapInPandas(to_do, client)                    (updatePage)
    pages'  = pages LEFT JOIN fetched, coalesce             (write-back)

Idempotency is structural: re-running enriches only still-null rows,
exactly the shouldIgnore semantics (FacebookAndTwitterEventHandler.java:52-58).
The retry-with-backoff policy (<=10 retries on ServiceUnavailable, 1s sleep,
AbstractSocialMediaClient.java:31-69) lives inside the Arrow batch function
— per-batch, not per-row. JSON payload parsing replicates the clients'
garbage tolerance (FacebookClient.java:42-70: malformed -> uninitialized,
i.e. null).

The network client itself is stubbed (DeterministicSocialClient) because
this engine's job is the dataflow, not HTTP; a real client drops in with
the same batch signature (executor-side connection pooling, SURVEY §4).
"""

from __future__ import annotations

import time
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Facebook returns a JSON *array* of objects; Twitter a single object
# (FacebookClient.java:44, TwitterClient.java:40).
FACEBOOK_SCHEMA = "array<struct<url:string, total_count:int>>"
TWITTER_SCHEMA = "struct<count:int, url:string>"

ENRICH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("facebook_total_count", T.IntegerType()),
        T.StructField("twitter_count", T.IntegerType()),
    ]
)


class ServiceUnavailableError(RuntimeError):
    """Transient failure; the batch is retried (AbstractSocialMediaClient)."""


def parse_facebook_total_count(json_col: Column) -> Column:
    """Gson-equivalent tolerant parse: malformed JSON -> null (PERMISSIVE),
    matching FacebookClientTest.java:16-47 'garbage => uninitialized'."""
    arr = F.from_json(json_col, FACEBOOK_SCHEMA)
    # F.get (not getItem): ANSI mode throws on out-of-bounds for the
    # empty-array payload; the client treats it as uninitialized -> null.
    return F.get(arr, 0).getField("total_count")


def parse_twitter_count(json_col: Column) -> Column:
    obj = F.from_json(json_col, TWITTER_SCHEMA)
    return obj.getField("count")


class DeterministicSocialClient:
    """Test/bench stub (SocialMediaClientStub.java:3-19 analog): counts are
    a pure function of the URL; optional transient failures for the first
    `fail_first` batches exercise the retry path."""

    def __init__(self, fail_first: int = 0):
        self.fail_first = fail_first

    def __call__(self, urls: pd.Series, attempt_state: dict) -> pd.DataFrame:
        if attempt_state.setdefault("failures", 0) < self.fail_first:
            attempt_state["failures"] += 1
            raise ServiceUnavailableError("Service temporarily unavailable")
        # crc32, not hash(): Python string hashing is salted per process
        # and would differ across executors/runs.
        h = urls.map(lambda u: zlib.crc32(u.encode("utf-8")) & 0x7FFFFFFF)
        return pd.DataFrame(
            {
                "url": urls,
                "facebook_total_count": (h % 10000).astype("int32"),
                "twitter_count": (h % 3000).astype("int32"),
            }
        )


class EnrichmentStats:
    """Observer statistics (GraphObserver.java:28-85 analog): per-pass
    counters kept as Spark accumulators — received / updated / retried /
    failed batches. Read after an action has materialized the pass."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.received = sc.accumulator(0)
        self.updated = sc.accumulator(0)
        self.retried = sc.accumulator(0)
        self.failed = sc.accumulator(0)

    def as_dict(self) -> dict[str, int]:
        return {
            "received": self.received.value,
            "updated": self.updated.value,
            "retried": self.retried.value,
            "failed": self.failed.value,
        }


def enrich_pages(
    pages: DataFrame,
    client: Callable[[pd.Series, dict], pd.DataFrame] | None = None,
    max_retries: int = 10,
    retry_sleep_sec: float = 0.0,
    stats: EnrichmentStats | None = None,
) -> DataFrame:
    """One enrichment pass over un-annotated pages; returns updated pages.

    Vectorized: the client receives whole Arrow batches of URLs. Failed
    batches retry up to `max_retries` (ServiceUnavailable only — generic
    exceptions propagate immediately, GraphTransactionTemplateTest.java:55-87
    semantics); rows still failing keep null counts and remain eligible for
    the next pass.
    """
    client = client or DeterministicSocialClient()

    todo = pages.filter(
        F.col("facebook_total_count").isNull() | F.col("twitter_count").isNull()
    ).select("url")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if stats:
                stats.received.add(len(pdf))
            for attempt in range(max_retries + 1):
                try:
                    yield client(pdf["url"], state)
                    if stats:
                        stats.updated.add(len(pdf))
                    break
                except ServiceUnavailableError:
                    if attempt == max_retries:
                        # exhausted: leave these rows un-enriched
                        if stats:
                            stats.failed.add(len(pdf))
                        break
                    if stats:
                        stats.retried.add(1)
                    if retry_sleep_sec:
                        time.sleep(retry_sleep_sec)

    fetched = todo.mapInPandas(fetch, schema=ENRICH_RESULT_SCHEMA)

    f = fetched.select(
        "url",
        F.col("facebook_total_count").alias("_fb"),
        F.col("twitter_count").alias("_tw"),
    )
    return (
        pages.join(f, "url", "left")
        .withColumn(
            "facebook_total_count", F.coalesce(F.col("facebook_total_count"), F.col("_fb"))
        )
        .withColumn("twitter_count", F.coalesce(F.col("twitter_count"), F.col("_tw")))
        .drop("_fb", "_tw")
    )
