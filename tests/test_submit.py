"""End-to-end spark-submit --py-files smoke test (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Runs the REAL submission path in a subprocess: package the webgraph zip,
launch spark-submit with the shim driver from a cwd OUTSIDE the repo (so
`webgraph.*` imports can only resolve from the --py-files artifact, the
way a cluster executor sees it), and check the full App.run pipeline
(build -> enrich -> PageRank/CC/LP/triangles -> snapshots -> report).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "webgraph.zip"))
    shim = tmp_path / "submit_main.py"
    shutil.copy(os.path.join(REPO, "tools", "submit_main.py"), shim)
    out = tmp_path / "graph_out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["WEBGRAPH_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", zip_path,
            str(shim),
            "--synthetic-pages", "400",
            "--root-url", "https://www.site-0.example.com/",
            "--domains", "example.com",
            "--max-iterations", "3",
            "--extended-analytics",
            "--out", str(out),
        ],
        cwd=str(tmp_path),  # NOT the repo: no accidental source-tree import
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    for artifact in (
        "pages", "edges", "pagerank", "components", "labels",
        "hits", "kcore3", "scc",
    ):
        assert (out / artifact).is_dir(), f"missing {artifact}"
    # the reportResults analog prints one JSON line
    report = next(
        json.loads(ln)
        for ln in proc.stdout.splitlines()
        if ln.startswith("{") and '"pages_per_sec"' in ln
    )
    assert report["pages"] > 0 and report["links"] > 0
    assert report["pagerank_iterations"] >= 1
    assert report["scc_count"] >= 1 and report["hits_iterations"] >= 1
