"""spark-submit driver script: thin shim over webgraph.__main__ so the
cluster entry is a plain file path (spark-submit does not take -m modules).

    spark-submit --py-files dist/webgraph.zip tools/submit_main.py <args...>

On a cluster the SparkSession comes from spark-submit's conf; locally
webgraph.session.get_spark provides the same defaults.
"""

from __future__ import annotations

import sys

from webgraph.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
