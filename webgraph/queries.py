"""The README Cypher query catalog as DataFrame queries (README.md:55-166).

Every query the reference documents against the exported Neo4j store,
re-expressed over the ``pages``/``edges`` tables. All pure built-ins: point
filters prune via pushdown (the Lucene-index analog, SURVEY §2.1 S5), top-k
compiles to TakeOrderedAndProject (no global sort), joins are equi joins
that Catalyst plans as broadcast/SMJ with AQE skew splitting.

Column aliases are stable and explicit so oracle comparison (driver
contract) hashes identical names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

UNKNOWN_CONTENT = "Page not yet fetched. Content unknown."  # PageNode.java:25


def page_by_url(pages: DataFrame, url: str) -> DataFrame:
    """Point lookup (README.md:81-84; GraphImporter.getPage,
    BatchGraphImporter.java:326-339)."""
    return pages.filter(F.col("url") == F.lit(url)).select(
        "url", "in_degree", "out_degree", "facebook_total_count", "twitter_count"
    )


def page_by_id(vertices: DataFrame, vid: int, pages: DataFrame | None = None) -> DataFrame:
    """Node-by-id point lookup — `start p=node(3) return p.url`
    (README.md:65-72). `vertices` is the (vid, url) dictionary from
    encode_graph; pass `pages` to return full page properties."""
    return pages_by_ids(vertices, [vid], pages)


def pages_by_ids(
    vertices: DataFrame, vids: list[int], pages: DataFrame | None = None
) -> DataFrame:
    """Multi-node lookup — `start p=node(152,153,154)` (README.md:70-72).

    An isin point filter on the vid dictionary (pushes down to the scan);
    the optional pages join broadcasts the handful of matched rows."""
    hit = vertices.filter(F.col("vid").isin([int(v) for v in vids]))
    if pages is None:
        return hit.select("vid", "url").orderBy("vid")
    return (
        pages.join(F.broadcast(hit), "url", "inner")
        .select("vid", *pages.columns)
        .orderBy("vid")
    )


def count_links_to(edges: DataFrame, url: str) -> DataFrame:
    """Count pages linking to a given page (README.md:86-90)."""
    return edges.filter(F.col("dst") == F.lit(url)).agg(
        F.count("*").alias("linking_pages")
    )


def pages_with_min_in_degree(pages: DataFrame, threshold: int) -> DataFrame:
    """All pages with >= threshold incoming links, desc (README.md:92-97)."""
    return (
        pages.filter(F.col("in_degree") >= threshold)
        .select("in_degree", "url")
        .orderBy(F.desc("in_degree"), F.asc("url"))
    )


def top_pages_by_incoming_links(
    pages: DataFrame, edges: DataFrame, k: int = 50, from_degrees: bool = True
) -> DataFrame:
    """The flagship top-k query (README.md:107-112).

    `from_degrees=False` reproduces the README's traversal formulation
    (count links per target, A5) instead of reading the maintained counter;
    both return identical results — the reference README notes the
    equivalence."""
    if from_degrees:
        df = pages.select(F.col("in_degree").alias("nr_of_links"), "url").filter(
            F.col("nr_of_links") > 0
        )
    else:
        df = edges.groupBy(F.col("dst").alias("url")).agg(
            F.count("*").alias("nr_of_links")
        )
    return df.orderBy(F.desc("nr_of_links"), F.asc("url")).limit(k).select(
        "nr_of_links", "url"
    )


def count_home_pages(pages: DataFrame) -> DataFrame:
    """README.md:114-117."""
    return pages.filter(F.col("type") == "home").agg(F.count("*").alias("home_pages"))


def home_pages_by_incoming_links(pages: DataFrame, min_links: int = 0) -> DataFrame:
    """README.md:119-130 (both variants; min_links=50 for the second)."""
    return (
        pages.filter((F.col("type") == "home") & (F.col("in_degree") >= min_links))
        .select("url", "in_degree", "out_degree")
        .orderBy(F.desc("in_degree"), F.asc("url"))
    )


def count_pages_in_domain(pages: DataFrame, domain: str) -> DataFrame:
    """README.md:132-134; GraphImporter.getNumberOfPagesForDomain."""
    return pages.filter(F.col("domain") == F.lit(domain)).agg(
        F.count("*").alias("pages_in_domain")
    )


def domain_pages_with_min_in_degree(
    pages: DataFrame, domain: str, threshold: int = 50
) -> DataFrame:
    """README.md:137-142."""
    return (
        pages.filter(
            (F.col("domain") == F.lit(domain)) & (F.col("in_degree") >= threshold)
        )
        .select("url", "in_degree")
        .orderBy(F.desc("in_degree"), F.asc("url"))
    )


def cross_domain_links(
    pages: DataFrame, edges: DataFrame, domain: str, threshold: int = 100
) -> DataFrame:
    """Two-hop join: pages in `domain` -> linked pages outside it with
    in_degree >= threshold (README.md:144-150, J5).

    Plan: filter both page sides first (pushdown), then two equi joins;
    the domain side is usually small enough for AQE to broadcast."""
    src_pages = pages.filter(F.col("domain") == F.lit(domain)).select(
        F.col("url").alias("src")
    )
    dst_pages = pages.filter(
        (F.col("domain") != F.lit(domain)) & (F.col("in_degree") >= threshold)
    ).select(
        F.col("url").alias("dst"), F.col("in_degree").alias("linked_in_degree")
    )
    return (
        edges.join(src_pages, "src", "inner")
        .join(dst_pages, "dst", "inner")
        .select(
            F.col("src").alias("url"),
            F.col("dst").alias("linked_url"),
            F.col("linked_in_degree"),
        )
        .orderBy(F.desc("linked_in_degree"), F.asc("url"), F.asc("linked_url"))
    )


def count_unfetched_pages(pages: DataFrame) -> DataFrame:
    """Content-regex query (README.md:152-156): the UNKNOWN sentinel is our
    null content (F7 -> F6 under the null mapping); the rlike form is kept
    for literal-sentinel data."""
    unfetched = F.col("content").isNull() | F.col("content").rlike(
        "^Page not yet fetched.*"
    )
    return pages.filter(unfetched).agg(F.count("*").alias("unfetched_pages"))


def pages_without_enrichment(pages: DataFrame, column: str = "facebook_total_count") -> DataFrame:
    """Presence predicate `not has(p.x)` -> IS NULL (README.md:158-166, F6)."""
    return pages.filter(F.col(column).isNull()).select("url").orderBy("url")


def with_sentinel_social_counts(pages: DataFrame, sentinel: int = -1) -> DataFrame:
    """Reference-compat view: PageNode.java:71-86 initializes social counts
    to -1 ('not yet fetched'); this engine maps that state to NULL (SURVEY
    §1.2 decision — NULL composes with Spark aggregates, -1 poisons sums).
    Consumers ported from the reference can restore the sentinel here."""
    out = pages
    for c in ("facebook_total_count", "twitter_count"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(sentinel)).cast("int"))
    return out


def rank_pages_within_domain(pages: DataFrame, k: int | None = None) -> DataFrame:
    """W2: rank pages by in-degree within each domain (window function;
    generalizes README.md:119-130). Deterministic tie-break on url."""
    w = Window.partitionBy("domain").orderBy(F.desc("in_degree"), F.asc("url"))
    df = pages.select(
        "domain", "url", "in_degree", F.row_number().over(w).alias("rank_in_domain")
    )
    if k is not None:
        df = df.filter(F.col("rank_in_domain") <= k)
    return df.orderBy("domain", "rank_in_domain")


def count_pages_by_type(pages: DataFrame) -> DataFrame:
    """Grouped form of the type/domain count queries (A4/A7)."""
    return pages.groupBy("type").agg(F.count("*").alias("n")).orderBy("type")


def error_report(errors: DataFrame, max_display: int = 20) -> DataFrame:
    """FailedUrls report (O3, FailedUrls.java:52-93; App.java:356-358):
    counts per error type, top `max_display` URLs each."""
    w = Window.partitionBy("error_type").orderBy("url")
    return (
        errors.select("error_type", "url", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= max_display)
        .drop("rn")
        .orderBy("error_type", "url")
    )
