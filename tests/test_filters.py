"""shouldVisit filter chain vs HtmlOnlyCrawlerTest.java:30-156 — the exact
case table from the reference test, exhaustive over media extensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph import filters

DOMAINS = ["my.company.com", "mycomp.com", "my.comp.com", "my-compmany.com"]
IGNORE = ["shopping.my.company.com"]

VISIT_TRUE = [
    "https://my.company.com/",
    "https://mycomp.com/",
    "https://my.company.com/somepage.html",
    "https://my.company.com/somepage.htm",
    "https://my.company.com/somepage.aspx",
    "https://sub1.my.company.com/",
    "https://sub2.my.company.com/",
    "https://sub3.my.company.com/",
]

MEDIA_EXTS = (
    "css js bmp gif jpg jpeg png ico tif tiff mid mp2 mp3 mp4 wav avi mov "
    "mpeg ram m4v pdf rm smil wmv swf wma zip rar gz"
).split()

VISIT_FALSE = (
    ["https://shopping.my.company.com/"]
    + [f"https://my.company.com/somepage.{e}" for e in MEDIA_EXTS]
    + [
        "https://my.company.com/img/somepic.gif?v=2",
        "https://my.company.com/css/somecss.css?v=2",
        "https://my.company.com/some.jpg/",
        "https://my.company.com/some.jpeg/",
        "https://my.company.com/some.gif/",
        "https://my.company.com/path1/path2/some.jpg/",
        "https://my.company.com/path1\\path2\\some.jpg/",
        "https://unrelated.org/page",
    ]
)


def test_should_visit_case_table(spark):
    cases = [(u, True) for u in VISIT_TRUE] + [(u, False) for u in VISIT_FALSE]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["ok"]
        for r in df.select(
            "url",
            filters.should_visit(F.col("url"), DOMAINS, IGNORE).alias("ok"),
        ).collect()
    }
    for u, want in cases:
        assert got[u] is want, u


def test_split_crawlable_quarantines_excluded_domains(spark):
    df = spark.createDataFrame(
        [
            ("https://my.company.com/ok.html",),
            ("https://evil.other.org/page",),
            ("https://my.company.com/x.png",),  # media: silently dropped
        ],
        "url string",
    )
    kept, errors = filters.split_crawlable(df, "url", DOMAINS, IGNORE)
    assert [r["url"] for r in kept.collect()] == ["https://my.company.com/ok.html"]
    errs = errors.collect()
    assert len(errs) == 1
    assert errs[0]["error_type"] == "ExcludedDomain"
    assert errs[0]["url"] == "evil.other.org"  # host recorded, not full url


def test_status_errors(spark):
    df = spark.createDataFrame(
        [("u1", 200), ("u2", 404), ("u3", 307), ("u4", 500)],
        "url string, status int",
    )
    got = {
        r["url"]: r["error_type"]
        for r in filters.status_errors(df, "url", "status").collect()
    }
    assert got == {"u2": "FailedRequest", "u3": "TemporaryRedirect", "u4": "FailedRequest"}
