"""URL scalar functions — Column-in/Column-out, fully JVM-side.

Re-derives the reference's UrlUtil semantics (UrlUtil.java:16-81) and the
crawler's URL normalization (HtmlOnlyCrawler.java:82) as built-in Spark SQL
expressions: no UDFs, so every one of these stays inside whole-stage codegen
and pushes through Catalyst untouched.

Reference behaviors replicated exactly (verified by tests mirroring
UrlUtilTest.java:10-45):
- cleanUp: '\\' -> '/' before parsing (UrlUtil.java:21-23)
- extractHost: host of cleaned URL, leading 'www.' stripped (UrlUtil.java:17-34)
- extractDomain: host up to the first '.' (UrlUtil.java:43-51)
- isHomePage: operates on the RAW url — strip trailing backslashes; any
  remaining backslash means leaf page; else home iff path in {'', '/'} and
  no query and no fragment (UrlUtil.java:61-81)
- page type: 'home' / 'page' (PageNode.java:22-23, BatchGraphImporter.java:164)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TYPE_HOME = "home"
TYPE_PAGE = "page"


def clean_url(url: Column) -> Column:
    """Backslash-tolerant cleanup: '\\' -> '/' (UrlUtil.java:21-23)."""
    return F.translate(url, "\\", "/")


def extract_host(url: Column) -> Column:
    """Host of the cleaned URL with a leading 'www.' stripped.

    UrlUtil.java:17-34: parse after cleanUp, strip 'www.' prefix only.
    """
    host = F.parse_url(clean_url(url), F.lit("HOST"))
    return F.regexp_replace(host, r"^www\.", "")


def extract_domain(url: Column) -> Column:
    """Host label up to the first '.' (UrlUtil.java:43-51)."""
    return F.split(extract_host(url), r"\.").getItem(0)


def is_home_page(url: Column) -> Column:
    """Boolean home-page test on the RAW URL string (UrlUtil.java:61-81).

    Trailing backslashes are stripped first; any backslash still present
    marks a leaf page regardless of what the parsed path looks like.
    """
    stripped = F.regexp_replace(url, r"\\+$", "")
    has_backslash = F.instr(stripped, "\\") > 0
    path = F.parse_url(stripped, F.lit("PATH"))
    query = F.parse_url(stripped, F.lit("QUERY"))
    ref = F.parse_url(stripped, F.lit("REF"))
    clean_home = (
        (F.coalesce(F.trim(path), F.lit("")).isin("", "/"))
        & query.isNull()
        & ref.isNull()
    )
    return F.when(has_backslash, F.lit(False)).otherwise(clean_home)


def page_type(url: Column) -> Column:
    """'home' / 'page' enum column (PageNode.java:22-23)."""
    return F.when(is_home_page(url), F.lit(TYPE_HOME)).otherwise(F.lit(TYPE_PAGE))


def normalize_url(url: Column) -> Column:
    """Crawler-side normalization before filtering: lowercase + cleanup
    (HtmlOnlyCrawler.java:82 lowercases before media/domain checks)."""
    return F.lower(clean_url(url))
