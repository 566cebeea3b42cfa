"""Config defaults + rejection matrix (ApplicationConfigurationTest.java:12-80,
AppTest.java:7-21)."""

from __future__ import annotations

import pytest

from webgraph.config import ConfigError, JobConfig, from_properties, parse_args

VALID = dict(root_url="https://www.a.com/", domains_to_crawl=("a.com",))


def test_defaults_match_reference():
    cfg = JobConfig(**VALID).validate()
    assert cfg.resumable is False
    assert cfg.max_pages == -1
    assert cfg.report_frequency == 500
    assert cfg.batch_size == 500


@pytest.mark.parametrize(
    "bad",
    [
        {},  # missing rootUrl
        {"root_url": "https://a.com/"},  # missing domains
        {**VALID, "report_frequency": 0},
        {**VALID, "batch_size": 0},
        {**VALID, "parallelism": 0},
        {**VALID, "pagerank_damping": 1.5},
        {**VALID, "max_iterations": 0},
        {**VALID, "resumable": True},  # resumable without checkpoint dir
    ],
)
def test_rejection_matrix(bad):
    with pytest.raises(ConfigError):
        JobConfig(**bad).validate()


def test_properties_file_roundtrip(tmp_path):
    p = tmp_path / "config.properties"
    p.write_text(
        "domainsToCrawl=apple.com, apple.com.au\n"
        "subdomainsToIgnore=store.apple.com , itunes.apple.com\n"
        "rootUrl=https://www.apple.com/\n"
    )
    cfg = from_properties(str(p))
    assert cfg.domains_to_crawl == ("apple.com", "apple.com.au")
    assert cfg.subdomains_to_ignore == ("store.apple.com", "itunes.apple.com")
    assert cfg.root_url == "https://www.apple.com/"


def test_cli_parsing_and_unknown_option_rejected(capsys):
    cfg = parse_args(
        ["--root-url", "https://a.com/", "--domains", "a.com,b.com", "-ts", "100"]
    )
    assert cfg.batch_size == 100
    assert cfg.domains_to_crawl == ("a.com", "b.com")
    with pytest.raises(SystemExit):  # argparse rejects unknown options
        parse_args(["--root-url", "https://a.com/", "--domains", "a.com", "--nope"])
    capsys.readouterr()


def test_seed_urls_and_describe_masking(tmp_path):
    from webgraph.config import JobConfig, from_properties
    from webgraph.strings import (
        format_minutes,
        format_rate,
        format_seconds,
        mask,
    )

    props = tmp_path / "c.properties"
    props.write_text(
        "domainsToCrawl=alpha.example.com\n"
        "seedUrls=https://www.alpha.example.com/,https://www.beta.example.com/\n"
        "rootUrl=https://www.alpha.example.com/\n"
    )
    cfg = from_properties(str(props))
    assert cfg.seed_urls == (
        "https://www.alpha.example.com/",
        "https://www.beta.example.com/",
    )

    # C8: describe() masks secrets to a same-length '*' run
    # (ApplicationConfiguration.java:226, 254-263)
    cfg2 = JobConfig(
        domains_to_crawl=("a.com",), root_url="https://a.com/", store_password="hunter2"
    ).validate()
    desc = cfg2.describe()
    assert "hunter2" not in desc
    assert "store_password: *******" in desc
    assert mask(None) is None and mask("") == "" and mask("abc") == "***"

    # C6: '%4.2f' report formatting (StringFormatUtil.java:4-14)
    assert format_rate(1234.5678) == "1234.57"
    assert format_seconds(3.14159) == "3.14"
    assert format_minutes(0.5) == "0.50"


def test_mask_and_format_columns(spark):
    from pyspark.sql import functions as F

    from webgraph.strings import format_count_col, format_rate_col, mask_col

    df = spark.createDataFrame(
        [("secret", 1234567, 12.345), (None, 0, 0.0), ("", 7, 1.0)],
        "pw string, n long, rate double",
    )
    rows = df.select(
        mask_col(F.col("pw")).alias("pw"),
        format_count_col(F.col("n")).alias("n"),
        format_rate_col(F.col("rate")).alias("r"),
    ).collect()
    assert rows[0]["pw"] == "******" and rows[0]["n"] == "1,234,567"
    assert rows[0]["r"] == "12.35"
    assert rows[1]["pw"] is None and rows[2]["pw"] == ""
