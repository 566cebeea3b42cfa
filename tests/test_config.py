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
