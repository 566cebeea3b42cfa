"""Category index analog (GraphImporter.java:19 addCategoryNodeToIndex;
BatchGraphImporter.java:106, 224-228): get-or-create, exact lookup,
idempotency, and the home/leaf page assignment sketched in
AbstractObservableGraphImporter.java:83-87."""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph.categories import (
    assign_page_categories,
    empty_categories,
    get_or_create_categories,
    lookup_category,
)


def _names(spark, *names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_create_assigns_dense_deterministic_ids(spark):
    cats = get_or_create_categories(
        empty_categories(spark), _names(spark, "news", "blog", "shop", "blog")
    )
    got = {r["name"]: r["category_id"] for r in cats.collect()}
    # dense ids in name order, duplicates collapsed
    assert got == {"blog": 1, "news": 2, "shop": 3}


def test_get_or_create_is_idempotent_and_appends_densely(spark):
    base = get_or_create_categories(
        empty_categories(spark), _names(spark, "news", "blog")
    )
    # re-adding existing names is a no-op (index add semantics)
    again = get_or_create_categories(base, _names(spark, "blog", "news"))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, base.collect()))
    # new names get ids above the current max, old ids untouched
    grown = get_or_create_categories(again, _names(spark, "shop", "blog", "api"))
    got = {r["name"]: r["category_id"] for r in grown.collect()}
    assert got["blog"] == 1 and got["news"] == 2
    assert got == {"blog": 1, "news": 2, "api": 3, "shop": 4}
    # nulls never become categories
    withnull = get_or_create_categories(
        grown, spark.createDataFrame([(None,), ("zzz",)], "name string")
    )
    assert withnull.filter(F.col("name").isNull()).count() == 0


def test_exact_lookup(spark):
    cats = get_or_create_categories(
        empty_categories(spark), _names(spark, "homes", "leaf pages")
    )
    hit = lookup_category(cats, "homes").collect()
    assert len(hit) == 1 and hit[0]["name"] == "homes"
    assert lookup_category(cats, "home").count() == 0  # exact, not prefix


def test_assign_page_categories_home_leaf(spark):
    from webgraph.build import build_graph
    from webgraph.corpus import fixture_docs

    g = build_graph(fixture_docs(spark, "star_in"), ["alpha.example.com"])
    cats = get_or_create_categories(
        empty_categories(spark), _names(spark, "homes", "leaf pages")
    )
    assigned = assign_page_categories(g.pages, cats)
    rows = assigned.select("url", "type", "category_id").collect()
    ids = {r["name"]: r["category_id"] for r in cats.collect()}
    for r in rows:
        want = ids["homes"] if r["type"] == "home" else ids["leaf pages"]
        assert r["category_id"] == want, r
