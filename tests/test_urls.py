"""URL scalar functions vs the reference's UrlUtilTest (UrlUtilTest.java:10-45).

Every assertion here is a documented reference behavior; the case table is
the Java test translated to data.
"""

from __future__ import annotations

import pytest
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


# ---- property-based invariants (hypothesis drives the inputs; the Spark
# ---- column functions are evaluated in one batch per example set) ----

def _eval(spark, urls, col_fn):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["v"] for r in df.select(col_fn(F.col("url")).alias("v")).collect()]


@pytest.mark.slow
def test_url_function_properties(spark):
    from hypothesis import given, settings, strategies as st

    from webgraph import urls as U

    url_st = st.builds(
        lambda scheme, host, path, bs: scheme + host + path.replace("/", bs),
        st.sampled_from(["http://", "https://"]),
        st.from_regex(r"(www\.)?[a-z]{1,8}(\.[a-z]{1,6}){1,3}", fullmatch=True),
        st.from_regex(r"(/[a-zA-Z0-9._-]{0,10}){0,4}/?", fullmatch=True),
        st.sampled_from(["/", "\\"]),
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(url_st, min_size=1, max_size=30, unique=True))
    def check(urls):
        cleaned = _eval(spark, urls, U.clean_url)
        # clean_url is idempotent and leaves no backslashes
        assert _eval(spark, cleaned, U.clean_url) == cleaned
        assert all("\\" not in c for c in cleaned)

        hosts = _eval(spark, urls, U.extract_host)
        domains = _eval(spark, urls, U.extract_domain)
        for u, h, d in zip(urls, hosts, domains):
            assert not h.startswith("www.")  # UrlUtil.java:17-34
            assert d == h.split(".")[0]      # UrlUtil.java:43-51
            # host function is insensitive to the backslash pathology
            assert h == u.replace("\\", "/").split("://")[1].split("/")[0].removeprefix("www.")

        types = _eval(spark, urls, U.page_type)
        homes = _eval(spark, urls, U.is_home_page)
        for u, t, hm in zip(urls, types, homes):
            assert t == ("home" if hm else "page")
            if hm:  # home iff no interior backslash and bare path
                stripped = u.rstrip("\\")
                assert "\\" not in stripped
                after = stripped.split("://")[1]
                assert "/" not in after or after.rstrip("/").count("/") == 0

    check()
