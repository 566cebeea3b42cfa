"""Deterministic synthetic document corpora (FIXTURES.md §1, §4).

Two generators:

- ``synthetic_corpus`` — a scalable, fully-distributed generator producing
  the BASELINE.json input_hint shape ``(repo, path, commit, lang, content)``
  plus a deterministic ``seq`` ordinal. Content embeds ``href="..."`` links
  with a power-law hub skew (web graphs are Zipfian; the hub hotspot is why
  the reference carries a 150k-entry URL index cache,
  BatchGraphImporter.java:100-103, and why our aggregations salt). Built
  entirely from ``spark.range`` + codegen'd column expressions — no driver
  data, no Python row loop, so it scales to bench-sized graphs.

- ``fixture_docs`` — tiny hand-authored topologies with known oracle values
  (star_in, chain_backlink, dangling, self_loop, two_components,
  idempotent_refetch, filtered, url_pathology, triangle), mirroring the
  reference's test scenarios (GraphImporterTestBase.java:123-185).

URL synthesis rule (FIXTURES.md §1): repo ``github.com/acme/<site>`` and
path ``""`` yields the home URL ``https://www.<site>.example.com/``; any
other path yields ``https://<site>.example.com/<path>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANG_HTML = "html"

DOC_COLUMNS = ["repo", "path", "commit", "lang", "content", "seq"]


def site_of(repo):  # Column -> Column
    """Last path segment of the repo id, e.g. github.com/acme/site-3 -> site-3."""
    return F.element_at(F.split(repo, "/"), -1)


def page_url(repo, path):  # Columns -> Column
    """FIXTURES.md §1 synthesis rule; home pages get a www. prefix so the
    host-normalization path (UrlUtil.java:17-34) is exercised end to end."""
    host = F.concat(site_of(repo), F.lit(".example.com"))
    return F.when(
        (path == "") | path.isNull(),
        F.concat(F.lit("https://www."), host, F.lit("/")),
    ).otherwise(F.concat(F.lit("https://"), host, F.lit("/"), path))


def synthetic_corpus(
    spark: SparkSession,
    n_pages: int,
    n_sites: int = 10,
    n_hubs: int = 16,
    links_per_page: int = 8,
    hub_fraction: int = 40,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Generate `n_pages` HTML documents whose hrefs form a hub-skewed graph.

    Deterministic given (n_pages, n_sites, n_hubs, links_per_page, seed):
    link k of page i targets page ``xxhash64(i, k, seed) % n_pages``, except
    `hub_fraction`% of links are redirected to one of the first `n_hubs`
    pages — the power-law hubs. Page ``s * (n_pages // n_sites)`` is site
    s's home page (empty path). Every page also carries one media link and
    one off-domain link so the F1-F3 filters see real negatives.
    """
    pages_per_site = max(1, n_pages // n_sites)
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    site_idx = (i / pages_per_site).cast("long") % n_sites
    repo = F.format_string("github.com/acme/site-%d", site_idx)
    is_home = (i % pages_per_site) == 0
    path = F.when(is_home, F.lit("")).otherwise(F.format_string("p/%d.html", i))

    # href targets: array of links_per_page deterministic pseudo-random ids
    ks = F.sequence(F.lit(0), F.lit(links_per_page - 1))

    def target(k):
        h = F.xxhash64(i, k, F.lit(seed))
        hub = F.pmod(h, F.lit(n_hubs))
        anywhere = F.pmod(F.shiftright(h, 8), F.lit(n_pages))
        return F.when(F.pmod(h, F.lit(100)) < hub_fraction, hub).otherwise(anywhere)

    def url_of(page_id):
        t_site = (page_id / pages_per_site).cast("long") % n_sites
        t_home = (page_id % pages_per_site) == 0
        host = F.format_string("site-%d.example.com", t_site)
        return F.when(
            t_home, F.concat(F.lit("https://www."), host, F.lit("/"))
        ).otherwise(
            F.concat(
                F.lit("https://"), host, F.format_string("/p/%d.html", page_id)
            )
        )

    hrefs = F.transform(
        ks, lambda k: F.format_string('<a href="%s">l</a>', url_of(target(k)))
    )
    noise = F.concat(
        F.format_string('<a href="https://site-%d.example.com/img/logo.png">i</a>', site_idx),
        F.format_string('<a href="https://ads.tracker%d.net/pixel">x</a>', i % 7),
    )
    content = F.concat(
        F.lit("<html><head><title>"),
        F.format_string("Page %d", i),
        F.lit("</title></head><body>"),
        F.concat_ws("\n", hrefs),
        noise,
        F.lit("</body></html>"),
    )
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.sha2(F.format_string("commit-%d-%d", i, F.lit(seed)), 256)
        .substr(1, 40)
        .alias("commit"),
        F.lit(LANG_HTML).alias("lang"),
        content.alias("content"),
        i.alias("seq"),
    )


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    n_hubs: int = 1024,
    hub_fraction: int = 40,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Directly generate a hub-skewed (src:long, dst:long) edge table.

    Same statistical shape as extracting `synthetic_corpus` (power-law
    hubs, deterministic xxhash64 targets) but skips the HTML round-trip —
    used for 10^8..10^9-edge PageRank benchmarks where corpus generation,
    not the graph algorithm, would dominate the wall clock. Edges are NOT
    deduplicated here (dedup is part of the measured pipeline when wanted).
    """
    df = spark.range(
        0, n_edges, 1, partitions or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")
    src = F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(n_vertices))
    h = F.xxhash64(i, F.lit(seed + 1))
    hub = F.pmod(h, F.lit(n_hubs))
    anywhere = F.pmod(F.shiftright(h, 8), F.lit(n_vertices))
    dst = F.when(F.pmod(h, F.lit(100)) < hub_fraction, hub).otherwise(anywhere)
    return df.select(src.alias("src"), dst.alias("dst"))


def _doc(repo: str, path: str, links: list[str], seq: int, extra: str = "") -> tuple:
    body = "".join(f'<a href="{u}">x</a>' for u in links) + extra
    content = f"<html><body>{body}</body></html>"
    commit = f"{seq:040d}"
    return (repo, path, commit, LANG_HTML, content, seq)


def _mkdf(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, seq long"
    )


def fixture_docs(spark: SparkSession, name: str) -> DataFrame:
    """Hand-authored topology fixtures (FIXTURES.md §4) as documents tables."""
    A = "github.com/acme/alpha"
    B = "github.com/acme/beta"
    home_a = "https://www.alpha.example.com/"
    p = lambda n: f"https://alpha.example.com/p/{n}.html"  # noqa: E731
    home_b = "https://www.beta.example.com/"
    q = lambda n: f"https://beta.example.com/p/{n}.html"  # noqa: E731

    if name == "star_in":
        # k=4 leaves all link to the hub (home_a); hub links nowhere.
        rows = [_doc(A, "", [], 0)] + [
            _doc(A, f"p/{n}.html", [home_a], n) for n in range(1, 5)
        ]
    elif name == "chain_backlink":
        # root -> p1 -> root cycle; root -> p2 (twice: edge dedup).
        rows = [
            _doc(A, "", [p(1), p(2), p(2)], 0),
            _doc(A, "p/1.html", [home_a], 1),
            _doc(A, "p/2.html", [], 2),
        ]
    elif name == "dangling":
        # p9 is linked but never fetched: no corpus row -> content null.
        rows = [
            _doc(A, "", [p(1), p(9)], 0),
            _doc(A, "p/1.html", [p(9)], 1),
        ]
    elif name == "self_loop":
        rows = [
            _doc(A, "", [home_a, p(1)], 0),
            _doc(A, "p/1.html", [], 1),
        ]
    elif name == "two_components":
        rows = [
            _doc(A, "", [p(1)], 0),
            _doc(A, "p/1.html", [home_a], 1),
            _doc(B, "", [q(1)], 2),
            _doc(B, "p/1.html", [], 3),
        ]
    elif name == "idempotent_refetch":
        # same URL twice; the later row has the real content (seq order wins,
        # GraphImporterTestBase.java:73-83).
        rows = [
            _doc(A, "", [p(1)], 0),
            _doc(A, "p/1.html", [], 1, extra="v1"),
            _doc(A, "p/1.html", [home_a], 2, extra="v2"),
        ]
    elif name == "filtered":
        rows = [
            _doc(
                A,
                "",
                [
                    p(1),
                    "https://alpha.example.com/style.css",
                    "https://alpha.example.com/img/x.png",
                    "https://alpha.example.com/a.jpg/",
                    "https://evil.other.com/page",
                ],
                0,
            ),
            _doc(A, "p/1.html", [], 1),
        ]
    elif name == "url_pathology":
        rows = [
            _doc(
                A,
                "",
                [
                    "http://subdomain.alpha.example.com\\img2\\someimage.txt",
                    "http://alpha.example.com\\\\",
                    "http://alpha.example.com/?bla=1",
                ],
                0,
            ),
        ]
    elif name == "triangle":
        # 3-clique (undirected) + pendant: edges 0<->1<->2<->0, 0->3.
        rows = [
            _doc(A, "", [p(1), p(2), p(3)], 0),
            _doc(A, "p/1.html", [home_a, p(2)], 1),
            _doc(A, "p/2.html", [home_a, p(1)], 2),
            _doc(A, "p/3.html", [], 3),
        ]
    else:
        raise ValueError(f"unknown fixture {name!r}")
    return _mkdf(spark, rows)
