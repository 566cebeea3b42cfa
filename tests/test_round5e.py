"""Round-5e operators: batch gap sessionization and the politeness-
batched crawl schedule."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, *hms), u) for i, (u, hms) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )


def test_sessionize_gap_boundaries(spark):
    from webgraph.asof import sessionize

    # user 1: 10:00:00, 10:04:59 (same, gap<300), 10:09:59 (EXACTLY 300s
    # after -> same session: boundary is strict >), 10:15:00 (301s -> new)
    # user 2: single event
    ev = _events(
        spark,
        [
            (1, (10, 0, 0)),
            (1, (10, 4, 59)),
            (1, (10, 9, 59)),
            (1, (10, 15, 0)),
            (2, (3, 0, 0)),
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["start_ts"].minute,
            r["end_ts"].minute,
        )
        for r in sessionize(
            ev, "user_id", "ts", 300, order_cols=["event_id"]
        ).collect()
    }
    assert got == {
        (1, 1): (3, 0, 9),
        (1, 2): (1, 15, 15),
        (2, 1): (1, 0, 0),
    }


def test_sessionize_subsecond_gap_not_truncated(spark):
    from webgraph.asof import sessionize

    # 1.5s gap with gap_seconds=1 must SPLIT (a seconds-truncating
    # implementation would see gap=1 and merge)
    ev = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 0, 0, 0, 0), 1),
            (1, datetime(2024, 1, 1, 0, 0, 1, 500000), 1),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    out = sessionize(ev, "user_id", "ts", 1, order_cols=["event_id"])
    assert out.count() == 2


def test_sessionize_rejects_bad_gap(spark):
    from webgraph.asof import sessionize

    ev = _events(spark, [(1, (0, 0, 0))])
    with pytest.raises(ValueError):
        sessionize(ev, "user_id", "ts", 0)


def test_crawl_schedule_batches(spark):
    from webgraph.filters import crawl_schedule

    df = spark.createDataFrame(
        [
            ("u1", "a.com", 90),
            ("u2", "a.com", 80),
            ("u3", "a.com", 70),
            ("u4", "a.com", 60),
            ("u5", "b.com", 10),
        ],
        "url string, host string, prio long",
    )
    got = {
        r["url"]: (r["rank_in_host"], r["batch"])
        for r in crawl_schedule(df, "host", "prio", per_host_batch=2).collect()
    }
    assert got == {
        "u1": (1, 0), "u2": (2, 0), "u3": (3, 1), "u4": (4, 1), "u5": (1, 0)
    }


def test_crawl_schedule_tie_breaks_by_url(spark):
    from webgraph.filters import crawl_schedule

    df = spark.createDataFrame(
        [("b", "h", 5), ("a", "h", 5)], "url string, host string, prio long"
    )
    got = {r["url"]: r["rank_in_host"] for r in
           crawl_schedule(df, "host", "prio", 1).collect()}
    assert got == {"a": 1, "b": 2}
    with pytest.raises(ValueError):
        crawl_schedule(df, "host", "prio", 0)
