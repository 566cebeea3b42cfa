"""Job configuration — the ApplicationConfiguration analog.

Mirrors the reference's config surface (ApplicationConfiguration.java:25-55
CLI options, config.properties:1-18 keys) with the same defaults and the
same validation matrix (ApplicationConfigurationTest.java:12-80):
non-positive politeness/report-frequency/transaction-size rejected, missing
required keys rejected, unknown options rejected. Crawl-only knobs
(proxies, crawler threads) become Spark-relevant knobs (parallelism,
checkpoint dir) — documented per field.

Frozen dataclass: the config is immutable once validated, exactly like the
reference's final fields.
"""

from __future__ import annotations

import argparse
import configparser
from dataclasses import dataclass, field, fields


class ConfigError(ValueError):
    """Invalid or missing configuration (IllegalArgumentException /
    MissingResourceException analog)."""


@dataclass(frozen=True)
class JobConfig:
    # --- graph definition (config.properties keys) ---
    domains_to_crawl: tuple[str, ...] = ()     # domainsToCrawl
    subdomains_to_ignore: tuple[str, ...] = ()  # subdomainsToIgnore
    seed_urls: tuple[str, ...] = ()             # seedUrls (multi-seed, U2)
    root_url: str = ""                          # rootUrl (required, :355-358)
    store_password: str | None = None           # masked in describe() (C8)
    # --- import behavior (CLI options, defaults per :36-43) ---
    resumable: bool = False                     # -r
    max_pages: int = -1                         # -f (-1 = unlimited)
    report_frequency: int = 500                 # -rf (>= 1)
    batch_size: int = 500                       # -ts analog: Arrow batch rows
    # --- Spark-native replacements for crawl-thread knobs ---
    parallelism: int = 32                       # -c analog: core count
    shuffle_partitions: int | None = None
    checkpoint_dir: str | None = None           # resumable state location
    # --- iterative algo controls (north_rule) ---
    pagerank_damping: float = 0.85
    pagerank_tol: float = 1e-6
    max_iterations: int = 40
    extended_analytics: bool = False            # also HITS/k-core/SCC

    def validate(self) -> "JobConfig":
        if not self.root_url:
            raise ConfigError("Missing configuration property rootUrl")
        if not self.domains_to_crawl:
            raise ConfigError("Missing configuration property domainsToCrawl")
        if self.report_frequency < 1:
            raise ConfigError("Value for option 'rf' must be >= 1 node(s)")
        if self.batch_size < 1:
            raise ConfigError("Value for option 'ts' must be >= 1 node(s)")
        if self.parallelism < 1:
            raise ConfigError("Value for option 'c' must be >= 1")
        if not 0 < self.pagerank_damping < 1:
            raise ConfigError("pagerank_damping must be in (0, 1)")
        if self.max_iterations < 1:
            raise ConfigError("max_iterations must be >= 1")
        if self.resumable and not self.checkpoint_dir:
            raise ConfigError("resumable import requires checkpoint_dir")
        return self

    def describe(self) -> str:
        """Config echo with secrets masked — the reference prints its full
        configuration at startup with proxyPassword masked to a same-length
        '*' run (ApplicationConfiguration.java:210-263)."""
        from webgraph.strings import mask

        lines = []
        for f_ in fields(self):
            v = getattr(self, f_.name)
            if "password" in f_.name or "secret" in f_.name:
                v = mask(v)
            lines.append(f"{f_.name}: {v}")
        return "\n".join(lines)


def _split_csv(value: str) -> tuple[str, ...]:
    """Comma-separated list, trimmed, empties dropped
    (ApplicationConfiguration.java:379-395 semantics)."""
    return tuple(v.strip() for v in value.split(",") if v.strip())


def from_properties(path: str, **overrides) -> JobConfig:
    """Load the config.properties-style file (same keys as the reference)."""
    cp = configparser.ConfigParser()
    with open(path) as f:
        cp.read_string("[job]\n" + f.read())
    sec = cp["job"]
    kwargs: dict = {}
    if "domainsToCrawl" in sec:
        kwargs["domains_to_crawl"] = _split_csv(sec["domainsToCrawl"])
    if "subdomainsToIgnore" in sec:
        kwargs["subdomains_to_ignore"] = _split_csv(sec["subdomainsToIgnore"])
    if "seedUrls" in sec:
        kwargs["seed_urls"] = _split_csv(sec["seedUrls"])
    if "rootUrl" in sec:
        kwargs["root_url"] = sec["rootUrl"].strip()
    kwargs.update(overrides)
    return JobConfig(**kwargs).validate()


def parse_args(argv: list[str] | None = None) -> JobConfig:
    """CLI parsing; unknown options are rejected (App.java:155-165)."""
    p = argparse.ArgumentParser(
        prog="webgraph",
        description="PySpark-native link-graph analytics engine",
    )
    p.add_argument("--config", default=None, help="config.properties path")
    p.add_argument("--root-url", default=None)
    p.add_argument("--domains", default=None, help="comma-separated allowlist")
    p.add_argument("--ignore-subdomains", default=None)
    p.add_argument("-r", "--resumable", action="store_true")
    p.add_argument("-f", "--max-pages", type=int, default=-1)
    p.add_argument("-rf", "--report-frequency", type=int, default=500)
    p.add_argument("-ts", "--batch-size", type=int, default=500)
    p.add_argument("-c", "--parallelism", type=int, default=32)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iterations", type=int, default=40)
    p.add_argument(
        "--extended-analytics", action="store_true",
        help="also run HITS, k-core and SCC after PageRank/CC/LP/triangles",
    )
    ns = p.parse_args(argv)

    overrides: dict = dict(
        resumable=ns.resumable,
        max_pages=ns.max_pages,
        report_frequency=ns.report_frequency,
        batch_size=ns.batch_size,
        parallelism=ns.parallelism,
        checkpoint_dir=ns.checkpoint_dir,
        pagerank_damping=ns.damping,
        pagerank_tol=ns.tol,
        max_iterations=ns.max_iterations,
        extended_analytics=ns.extended_analytics,
    )
    if ns.root_url:
        overrides["root_url"] = ns.root_url
    if ns.domains:
        overrides["domains_to_crawl"] = _split_csv(ns.domains)
    if ns.ignore_subdomains:
        overrides["subdomains_to_ignore"] = _split_csv(ns.ignore_subdomains)

    if ns.config:
        return from_properties(ns.config, **overrides)
    return JobConfig(**overrides).validate()
