"""Link extraction — the crawl/parse stage (S1/S2) as a scan + explode.

The reference fetches pages with crawler4j and consumes
``HtmlParseData.getOutgoingUrls()`` per page (HtmlOnlyCrawler.java:169-176).
Here the corpus is already materialized (BASELINE.json input_hint: an
Iceberg/parquet table of source-code repositories), so "crawl" becomes a
columnar scan and "parse" becomes ``regexp_extract_all`` + ``explode`` —
built-in JVM expressions inside whole-stage codegen. A pandas-UDF parser is
deliberately NOT used: href extraction is regular, and the built-in regex
runs 10-100x faster than an Arrow round-trip.

Scale notes: the explode multiplies rows by avg out-degree but stays
pipeline-local (no shuffle); downstream dedup/aggregation shuffles on url
keys. Column pruning means only (repo, path, content) bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.corpus import page_url

HREF_RE = r'href="([^"]+)"'

# Markup languages whose content is parsed for links (SURVEY §1.2; the
# reference only ever parses HTML, HtmlOnlyCrawler.java:161-165).
MARKUP_LANGS = ("html", "htm", "xhtml", "md", "markdown")


def with_url(docs: DataFrame) -> DataFrame:
    """Attach the synthesized page URL (FIXTURES.md §1 rule)."""
    return docs.withColumn("url", page_url(F.col("repo"), F.col("path")))


def extract_raw_links(docs: DataFrame) -> DataFrame:
    """documents -> (src, dst_raw): one row per href occurrence.

    Mirrors HtmlParseData.getOutgoingUrls() (HtmlOnlyCrawler.java:169-176)
    minus crawler4j's URL canonicalization, which our normalize/filter
    stage performs instead. Non-markup rows produce no links but still
    become pages. If `docs` already carries a `url` column it is reused
    (build_graph computes it once for the whole pipeline).
    """
    markup = F.lower(F.col("lang")).isin(*MARKUP_LANGS)
    links = F.when(
        markup, F.regexp_extract_all(F.col("content"), F.lit(HREF_RE), 1)
    ).otherwise(F.array().cast("array<string>"))
    base = docs if "url" in docs.columns else with_url(docs)
    return base.select(F.col("url").alias("src"), F.explode(links).alias("dst_raw"))


# --------------------------------------------- anchor-text extraction ----

# href AND the anchor's inner text in one pattern (two capture groups,
# extracted as two aligned arrays — Spark's regexp_extract_all returns
# one group per call, and both calls walk the same match positions).
# RE2-portable: no backreferences, inline (?is) flags only, so the
# DuckDB contract oracle replays it verbatim.
ANCHOR_RE = r'(?is)<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>'


def extract_anchor_texts(docs: DataFrame) -> DataFrame:
    """documents -> (src, dst_raw, anchor): one row per <a href>text</a>
    occurrence, anchor whitespace-collapsed and case-folded. The classic
    companion signal to in-degree: what the REST of the web calls a page
    is a stronger label than the page's own title (anchor-text ranking,
    TREC web tracks onward).

    Same economics as extract_raw_links: regexp in whole-stage codegen,
    explode stays pipeline-local, only (url, lang, content) columns read.
    """
    markup = F.lower(F.col("lang")).isin(*MARKUP_LANGS)
    hrefs = F.regexp_extract_all(F.col("content"), F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(F.col("content"), F.lit(ANCHOR_RE), 2)
    pairs = F.when(
        markup, F.arrays_zip(hrefs.alias("h"), texts.alias("t"))
    ).otherwise(F.array().cast("array<struct<h:string,t:string>>"))
    base = docs if "url" in docs.columns else with_url(docs)
    return base.select(
        F.col("url").alias("src"), F.explode(pairs).alias("p")
    ).select(
        "src",
        F.col("p.h").alias("dst_raw"),
        F.lower(
            F.trim(F.regexp_replace(F.col("p.t"), r"\s+", " "))
        ).alias("anchor"),
    )


def anchor_summary(
    anchors: DataFrame,
    top_k: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Per-target anchor-text profile: (dst_raw, anchor, n, rank) for the
    top_k most frequent normalized anchors per target, empty anchors
    dropped, ties broken alphabetically (deterministic under any
    partitioning).

    Two-stage shape: one (dst, anchor)-keyed count (map-side partial agg
    absorbs hub skew — a million inlinks saying "home" collapse per
    partition before the shuffle), then one rank over the ALREADY
    aggregated (dst, anchor) table, which is orders of magnitude smaller
    than the link table. That second Exchange is on dst with a bounded
    sort — the same plan shape as the reference's per-domain top-N
    reports."""
    from pyspark.sql import Window

    counts = (
        anchors.filter(F.col("anchor") != "")
        .groupBy("dst_raw", "anchor")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= int(min_count))
    )
    w = Window.partitionBy("dst_raw").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select("dst_raw", "anchor", "n", F.col("rank").cast("long").alias("rank"))
    )
