"""Shared pytest fixtures: one session-scoped local SparkSession.

Mirrors the reference's impermanent-database fixture strategy
(TransactionalGraphImporterTest.java:33-35) — tests share an in-memory
engine instance and build tiny graphs per test.
"""

from __future__ import annotations

import pytest

from webgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="webgraph-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


DOMAINS = ["alpha.example.com", "beta.example.com"]


@pytest.fixture(scope="session")
def domains():
    return DOMAINS
