"""Build the --py-files artifact for cluster submission (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
    python tools/package_pyfiles.py [dist/webgraph.zip]
    spark-submit --py-files dist/webgraph.zip tools/submit_main.py \
        --corpus s3://bucket/documents --root-url https://www.mysite.com/ \
        --domains mysite.com --out s3://bucket/graph_out

The zip contains only the `webgraph` package (no tests, no tools); every
executor unpacks it onto its PYTHONPATH, so pandas-UDF workers resolve
`webgraph.*` imports identically to the driver.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "webgraph")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "webgraph.zip")
    print(build(out))
