"""URL filtering predicates — the `shouldVisit` pipeline as Columns.

Replicates HtmlOnlyCrawler's filter chain (HtmlOnlyCrawler.java:76-120) and
ApplicationConfiguration.isCrawlableUrl (ApplicationConfiguration.java:397-424)
as pure Column predicates so Catalyst can push them into the scan. Filter
order and the quarantine categories ("ExcludedDomain", "FailedRequest",
"TemporaryRedirect") match FailedUrls.java:30-33.

All predicates expect a raw URL column; they lowercase internally exactly as
the crawler does (HtmlOnlyCrawler.java:82).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webgraph.urls import extract_host, normalize_url

# MEDIA_EXTENSION_REGEX, HtmlOnlyCrawler.java:22 — Java Matcher.matches() is
# whole-string anchored; rlike is substring search, so anchor explicitly.
MEDIA_EXTENSIONS = (
    "css|js|bmp|gif|jpe?g|png|ico|tiff?|mid|mp2|mp3|mp4|wav|avi|mov|mpeg"
    "|ram|m4v|pdf|rm|smil|wmv|swf|wma|zip|rar|gz"
)
MEDIA_FILE_RE = rf"^.*\.({MEDIA_EXTENSIONS})$"
INCORRECT_MEDIA_RE = rf"^.*\.({MEDIA_EXTENSIONS})/$"

ERR_EXCLUDED_DOMAIN = "ExcludedDomain"
ERR_FAILED_REQUEST = "FailedRequest"
ERR_TEMPORARY_REDIRECT = "TemporaryRedirect"

HTTP_BAD_REQUEST = 400
HTTP_TEMPORARY_REDIRECT = 307


def is_media_url(url: Column) -> Column:
    """Media/CSS/JS URLs are never crawled (HtmlOnlyCrawler.java:117-120:
    extension match OR path contains /img/ or /css/)."""
    u = normalize_url(url)
    return (
        u.rlike(MEDIA_FILE_RE)
        | (F.instr(u, "/img/") > 0)
        | (F.instr(u, "/css/") > 0)
    )


def is_incorrect_media_url(url: Column) -> Column:
    """Media extension followed by '/' — malformed link artifacts
    (HtmlOnlyCrawler.java:89-93)."""
    return normalize_url(url).rlike(INCORRECT_MEDIA_RE)


def matches_any_domain(url: Column, domains: Sequence[str]) -> Column:
    """host-of(url) contains any of `domains` (substring semantics,
    ApplicationConfiguration.java:411-424). Domain lists are config-sized
    (a handful of literals), so this folds into codegen'd predicates —
    no join needed."""
    if not domains:
        return F.lit(False)
    host = F.coalesce(extract_host(normalize_url(url)), F.lit(""))
    pred = F.lit(False)
    for d in domains:
        pred = pred | (F.instr(host, d.lower()) > 0)
    return pred


def is_crawlable_url(
    url: Column,
    domains_to_crawl: Sequence[str],
    subdomains_to_ignore: Sequence[str] = (),
) -> Column:
    """isCrawlableDomain AND NOT isExcludedSubdomain
    (ApplicationConfiguration.java:397-409)."""
    return matches_any_domain(url, domains_to_crawl) & ~matches_any_domain(
        url, subdomains_to_ignore
    )


def should_visit(
    url: Column,
    domains_to_crawl: Sequence[str],
    subdomains_to_ignore: Sequence[str] = (),
) -> Column:
    """The full shouldVisit chain (HtmlOnlyCrawler.java:83-114)."""
    return (
        ~is_media_url(url)
        & ~is_incorrect_media_url(url)
        & is_crawlable_url(url, domains_to_crawl, subdomains_to_ignore)
    )


def split_crawlable(
    df: DataFrame,
    url_col: str,
    domains_to_crawl: Sequence[str],
    subdomains_to_ignore: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """Partition rows into (kept, quarantined-with-error_type).

    The quarantine frame mirrors FailedUrls (FailedUrls.java:30-33,52-93):
    columns (error_type, url, message, ts). Media URLs are silently dropped
    by the reference (trace-level log only, HtmlOnlyCrawler.java:85-93), so
    only domain exclusions land in the errors table, matching
    addExcludedDomainToFailedUrls (HtmlOnlyCrawler.java:98-110).
    """
    u = F.col(url_col)
    keep = should_visit(u, domains_to_crawl, subdomains_to_ignore)
    excluded_domain = (
        ~is_media_url(u)
        & ~is_incorrect_media_url(u)
        & ~is_crawlable_url(u, domains_to_crawl, subdomains_to_ignore)
    )
    kept = df.filter(keep)
    errors = (
        df.filter(excluded_domain)
        .select(
            F.lit(ERR_EXCLUDED_DOMAIN).alias("error_type"),
            F.coalesce(
                extract_host(normalize_url(u)), normalize_url(u)
            ).alias("url"),
            F.lit("This domain is not configured for crawling").alias("message"),
            F.current_timestamp().alias("ts"),
        )
        .dropDuplicates(["url"])
    )
    return kept, errors


def status_errors(df: DataFrame, url_col: str, status_col: str) -> DataFrame:
    """HTTP status quarantine rows (HtmlOnlyCrawler.java:127-139): status
    >= 400 -> FailedRequest, status == 307 -> TemporaryRedirect."""
    s = F.col(status_col)
    return df.filter((s >= HTTP_BAD_REQUEST) | (s == HTTP_TEMPORARY_REDIRECT)).select(
        F.when(s >= HTTP_BAD_REQUEST, F.lit(ERR_FAILED_REQUEST))
        .otherwise(F.lit(ERR_TEMPORARY_REDIRECT))
        .alias("error_type"),
        F.col(url_col).alias("url"),
        F.format_string("(%d)", s).alias("message"),
        F.current_timestamp().alias("ts"),
    )


def crawl_schedule(
    df: DataFrame,
    host_col: str,
    priority_col: str,
    per_host_batch: int,
    url_col: str = "url",
) -> DataFrame:
    """Politeness-batched crawl schedule: rank each host's candidate URLs
    by (priority desc, url asc) and cut the ranking into batches of
    ``per_host_batch`` — batch b is the set a crawler honoring a
    per-host concurrency/rate cap may fetch in round b. The batch analog
    of the reference crawler's per-host politeness knobs
    (reference App.java:285-329 — live-crawl delays have no meaning over
    a corpus table, but WHICH url waits for WHICH round does).

    Returns (url, host, rank_in_host, batch) with batch 0-based. One
    Exchange on host + per-partition sort (the ranking window); a skewed
    mega-host ranks inside its own partitions under AQE, and the output
    is deterministic under any partitioning because the order key
    (priority, url) is total.
    """
    if per_host_batch < 1:
        raise ValueError(
            f"crawl_schedule: per_host_batch must be >= 1, got {per_host_batch}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    return df.select(
        F.col(url_col),
        F.col(host_col),
        F.row_number().over(w).cast("long").alias("rank_in_host"),
    ).withColumn(
        "batch", ((F.col("rank_in_host") - 1) / per_host_batch).cast("long")
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    key_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Robots-exclusion decision per page (the REP longest-match rule,
    RFC 9309 §2.2.2): among the rules whose host matches and whose
    ``prefix`` is a prefix of the page path, the LONGEST prefix wins;
    a length tie resolves to allow (the least-restrictive rule, §2.2.2);
    no matching rule means allowed. The reference crawler leaves robots
    handling to the live-fetch layer (App.java's crawler config) — over a
    corpus table the decision becomes this joinable column.

    ``rules`` is (host, prefix, allow boolean) — robots.txt files are
    tiny, so the rule table broadcasts; the per-page argmax is
    MAX(struct(prefix_len, allow)), a map-side-combining aggregate, so
    the shuffle carries one row per page no matter how many rules match.
    Returns pages' (key, host, path) plus an ``allowed`` column —
    projection, not filter, so callers can quarantine the denies the way
    split_crawlable does.
    """
    matched = (
        pages.select(key_col, host_col, path_col)
        .join(
            F.broadcast(rules.select(
                F.col("host").alias("_rh"),
                F.col("prefix").alias("_rp"),
                F.col("allow").alias("_ra"),
            )),
            (F.col(host_col) == F.col("_rh"))
            & F.col(path_col).startswith(F.col("_rp")),
        )
        .groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.length("_rp").alias("plen"),
                    F.col("_ra").cast("int").alias("a"),
                )
            ).alias("_best")
        )
        .select(key_col, (F.col("_best.a") == 1).alias("_allow"))
    )
    return (
        pages.select(key_col, host_col, path_col)
        .join(matched, key_col, "left")
        .select(
            key_col,
            host_col,
            path_col,
            F.coalesce("_allow", F.lit(True)).alias("allowed"),
        )
    )
