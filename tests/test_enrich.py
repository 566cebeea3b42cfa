"""Enrichment pass vs the handler/client spec
(FacebookAndTwitterEventHandlerTest.java:32-90, FacebookClientTest.java:16-47,
GraphTransactionTemplateTest.java:55-87)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webgraph.build import build_graph
from webgraph.corpus import fixture_docs
from webgraph.enrich import (
    DeterministicSocialClient,
    ServiceUnavailableError,
    enrich_pages,
    parse_facebook_total_count,
    parse_twitter_count,
)

DOMAINS = ["alpha.example.com", "beta.example.com"]


@pytest.fixture(scope="module")
def pages(spark):
    return build_graph(fixture_docs(spark, "star_in"), DOMAINS).pages


def test_enrich_fills_all_null_counts(pages):
    out = enrich_pages(pages, DeterministicSocialClient())
    assert out.filter(F.col("facebook_total_count").isNull()).count() == 0
    assert out.filter(F.col("twitter_count").isNull()).count() == 0
    # deterministic: same client -> same counts
    a = {r["url"]: r["facebook_total_count"] for r in out.collect()}
    b = {
        r["url"]: r["facebook_total_count"]
        for r in enrich_pages(pages, DeterministicSocialClient()).collect()
    }
    assert a == b


def test_enrich_is_idempotent_should_ignore(pages):
    """Second pass must not touch already-annotated pages
    (shouldIgnore, FacebookAndTwitterEventHandler.java:52-58). Observable
    test: a second pass with a client returning different values must
    change nothing."""

    def overwriting_client(urls: pd.Series, state: dict) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": urls,
                "facebook_total_count": 999999,
                "twitter_count": 999999,
            }
        )

    once = enrich_pages(pages, DeterministicSocialClient())
    want = {r["url"]: r["facebook_total_count"] for r in once.collect()}
    twice = enrich_pages(once, overwriting_client)
    got = {r["url"]: r["facebook_total_count"] for r in twice.collect()}
    assert got == want  # no 999999 anywhere: already-annotated rows ignored


def test_retry_on_service_unavailable(pages):
    """Transient failures retried (<=10, AbstractSocialMediaClient.java:31-69);
    success after retries yields full enrichment."""
    out = enrich_pages(pages, DeterministicSocialClient(fail_first=2), max_retries=10)
    assert out.filter(F.col("facebook_total_count").isNull()).count() == 0


def test_retries_exhausted_leaves_rows_null(pages):
    out = enrich_pages(pages, DeterministicSocialClient(fail_first=99), max_retries=2)
    assert out.filter(F.col("facebook_total_count").isNull()).count() == pages.count()


def test_generic_exception_not_retried(pages):
    """Generic exceptions propagate immediately — only ServiceUnavailable
    retries (GraphTransactionTemplateTest.java:55-87 semantics)."""
    def broken(urls, state):
        raise ValueError("boom")

    with pytest.raises(Exception, match="boom"):
        enrich_pages(pages, broken, max_retries=10).collect()


def test_json_parsing_matches_client_tolerance(spark):
    """C7: array payload (Facebook), object payload (Twitter), garbage ->
    null (FacebookClientTest 'garbage => uninitialized')."""
    df = spark.createDataFrame(
        [
            ('[{"url":"u","total_count":8626}]', '{"count":3115,"url":"u"}'),
            ("garbage", "garbage"),
            (None, None),
            ("[]", "{}"),
        ],
        "fb string, tw string",
    )
    rows = df.select(
        parse_facebook_total_count(F.col("fb")).alias("fb_count"),
        parse_twitter_count(F.col("tw")).alias("tw_count"),
    ).collect()
    assert [r["fb_count"] for r in rows] == [8626, None, None, None]
    assert [r["tw_count"] for r in rows] == [3115, None, None, None]
