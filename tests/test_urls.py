"""URL scalar functions vs the reference's UrlUtilTest (UrlUtilTest.java:10-45).

Every assertion here is a documented reference behavior; the case table is
the Java test translated to data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph import urls

HOST_CASES = [
    ("http://mydomain.com", "mydomain.com"),
    ("http://www.mydomain.com", "mydomain.com"),
    ("http://subdomain.mydomain.com", "subdomain.mydomain.com"),
    ("http://www.subdomain.mydomain.com", "subdomain.mydomain.com"),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg/", "subdomain.mydomain.com"),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg", "subdomain.mydomain.com"),
]

DOMAIN_CASES = [
    ("http://mydomain.com", "mydomain"),
    ("http://www.mydomain.com", "mydomain"),
    ("http://subdomain.mydomain.com", "subdomain"),
    ("http://www.subdomain.mydomain.com", "subdomain"),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg/", "subdomain"),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg", "subdomain"),
]

HOME_CASES = [
    ("http://mydomain.com", True),
    ("http://mydomain.com/", True),
    ("http://mydomain.com\\\\", True),  # trailing backslashes stripped
    ("http://mydomain.com//", False),
    ("http://mydomain.com/bla", False),
    ("http://mydomain.com/?bla=1", False),
    ("http://mydomain.com/bla#ref1", False),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg/", False),
    ("http://subdomain.mydomain.com\\img\\someimage.jpg", False),
]


def _run(spark, cases, fn):
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["out"]
        for r in df.select("url", fn(F.col("url")).alias("out")).collect()
    }
    return got


def test_extract_host(spark):
    got = _run(spark, HOST_CASES, urls.extract_host)
    for u, want in HOST_CASES:
        assert got[u] == want, u


def test_extract_domain(spark):
    got = _run(spark, DOMAIN_CASES, urls.extract_domain)
    for u, want in DOMAIN_CASES:
        assert got[u] == want, u


def test_is_home_page(spark):
    got = _run(spark, HOME_CASES, urls.is_home_page)
    for u, want in HOME_CASES:
        assert got[u] is want, u


def test_page_type_enum(spark):
    got = _run(spark, HOME_CASES, urls.page_type)
    for u, want in HOME_CASES:
        assert got[u] == ("home" if want else "page"), u
