"""Category index analog — the last reference-API member without a repo
counterpart (round-2 verdict item 6).

The reference provisions a name-keyed exact-match node index called
"categories" (AbstractObservableGraphImporter.java:18,
BatchGraphImporter.java:106) and registers nodes in it by their
`category` property (GraphImporter.java:19 `addCategoryNodeToIndex`,
BatchGraphImporter.java:224-228, TransactionalGraphImporter.java:230-232);
its comment sketches the intended use — a category node per page type
("homes", "leaf pages") linked to its pages
(AbstractObservableGraphImporter.java:83-87).

Spark-first re-expression: the index is a `categories` TABLE
(category_id, name) with get-or-create semantics (the same
dedup-join-then-union shape as the page URL index, build.py J1), an
exact-match lookup, and a page->category assignment that mirrors the
reference's home/leaf sketch. Category cardinality is tiny relative to
pages (page TYPES, not pages), so the id-assignment window over *new
names only* is a non-issue at 100 TB — the expensive side (pages) only
ever touches categories through a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CATEGORY_SCHEMA = "category_id long, name string"


def empty_categories(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], CATEGORY_SCHEMA)


def get_or_create_categories(existing: DataFrame, names: DataFrame) -> DataFrame:
    """Return the category table with every name in `names` present
    exactly once; existing rows keep their ids (index semantics —
    re-adding is a no-op, BatchGraphImporter.java:224-228). New names get
    dense ids above the current max, assigned in name order:
    deterministic and idempotent. `names` needs a `name` column."""
    new = (
        names.select(F.col("name").cast("string").alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .join(existing.select("name"), "name", "left_anti")
    )
    base = existing.agg(
        F.coalesce(F.max("category_id"), F.lit(0)).cast("long").alias("_m")
    )
    # row_number over new names only: |new| = category cardinality, tiny.
    w = Window.orderBy("name")
    assigned = new.crossJoin(F.broadcast(base)).select(
        (F.col("_m") + F.row_number().over(w)).cast("long").alias("category_id"),
        "name",
    )
    return existing.select("category_id", "name").unionByName(assigned)


def lookup_category(categories: DataFrame, name: str) -> DataFrame:
    """Exact-match point lookup (the index was provisioned
    MapUtil.stringMap("type", "exact"), BatchGraphImporter.java:106)."""
    return categories.filter(F.col("name") == name)


def assign_page_categories(pages: DataFrame, categories: DataFrame) -> DataFrame:
    """The reference comment's typing scheme
    (AbstractObservableGraphImporter.java:83-87): category "homes" for
    home pages, "leaf pages" otherwise; pages joined to the category
    table by that name — broadcast (the table is tiny by construction)."""
    named = pages.withColumn(
        "name",
        F.when(F.col("type") == "home", F.lit("homes")).otherwise(
            F.lit("leaf pages")
        ),
    )
    return (
        named.join(F.broadcast(categories), "name", "left")
        .drop("name")
    )
