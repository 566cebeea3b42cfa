"""webgraph — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference (fgavilondo/neo4j-webgraph, a
Java crawler + embedded-Neo4j graph builder; see /root/repo/SURVEY.md) as
idiomatic Spark DataFrame programs:

- ``corpus``    — deterministic synthetic document corpora (FIXTURES.md §1)
- ``urls``      — URL scalar functions (UrlUtil.java analogs, SURVEY §2.8)
- ``extract``   — link extraction from page content (HtmlOnlyCrawler analog)
- ``filters``   — media / domain / status filters (HtmlOnlyCrawler.shouldVisit)
- ``build``     — pages/edges graph build with dedup + degree maintenance
- ``queries``   — the README Cypher query surface as DataFrame queries
- ``enrich``    — observer/enrichment pass (GraphObserver analog, pandas UDFs)
- ``algos``     — PageRank, connected components, label propagation, triangles
- ``checkpoint``— per-iteration snapshot/resume (Iceberg-shaped, parquet-backed)
- ``metrics``   — iteration metrics (delta norms, messages, skew ratios)
- ``text``      — language-ID, quality scoring, token counts, fingerprints
- ``dedup``     — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity``— embedding cosine top-k (brute force + LSH-bucketed)
- ``multimodal``— binary-column decode/feature plumbing (stubbed codecs)
- ``streaming`` — Structured Streaming form of the event/observer subsystem

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, Arrow-vectorized pandas UDFs where Spark lacks an operator, zero
per-row Python, zero driver-side loops over collect() results.
"""

__version__ = "0.1.0"
