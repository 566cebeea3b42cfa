"""Per-iteration checkpoint/resume with lineage metadata (S7, north_rule).

The reference's durability story is "batch mode: crash = restart from
scratch; transactional mode: ACID per chunk; resume = keep the crawl
frontier + db dir" (App.java:67-69, 177-182; SURVEY §2.1 S7). Here each
iteration of an iterative algorithm commits an immutable snapshot:

    <dir>/<name>/iter=<k>/           parquet state (ranks / labels)
    <dir>/<name>/_manifest.jsonl     one line per committed iteration:
                                     {iteration, path, rows, metrics, wall}

A snapshot directory is written with an atomic rename-free protocol:
parquet write to the final path, manifest line appended only after the
write action returns (Spark's commit protocol makes the parquet dir
all-or-nothing). Resume = read the last manifest line, load its path.
On a cluster this maps 1:1 onto Iceberg snapshot commits (the same
program with `.writeTo(...).createOrReplace()`); parquet-backed here
because the sandbox has no Iceberg runtime jar.

Checkpointing every iteration also truncates DataFrame lineage — the
known failure mode of iterative DataFrame loops is exponential plan
growth (SURVEY §4 item 3); reading back the parquet cuts the plan to a
scan.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, root: str, name: str, retain: int | None = None):
        """`retain`: keep only the newest N state directories (older
        manifest entries stay for lineage/metrics history, but their data
        is pruned — resume only ever needs the latest snapshot). None =
        keep everything."""
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest = os.path.join(self.dir, "_manifest.jsonl")
        self.retain = retain

    def path(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter={iteration}")

    def write_state(self, df: DataFrame, iteration: int) -> DataFrame:
        """Write the iteration state (this executes the iteration's job)
        and return a lineage-free re-read. Manifest line is appended
        separately via log_entry once the caller has final metrics."""
        p = self.path(iteration)
        df.write.mode("overwrite").parquet(p)
        return df.sparkSession.read.parquet(p)

    def log_entry(self, iteration: int, metrics: dict[str, Any] | None = None) -> None:
        """Append the manifest line for a state written with write_state.
        Only after this line exists is the iteration considered committed
        (resume reads the manifest, so a crash between write_state and
        log_entry re-runs the iteration — idempotent overwrite)."""
        line = {
            "iteration": iteration,
            "path": self.path(iteration),
            "metrics": metrics or {},
        }
        with open(self.manifest, "a") as f:
            f.write(json.dumps(line) + "\n")
        if self.retain is not None:
            self._prune(keep_newest_than=iteration - self.retain)

    def _prune(self, keep_newest_than: int) -> None:
        import re
        import shutil

        for entry in os.listdir(self.dir):
            m = re.fullmatch(r"iter=(\d+)", entry)
            if m and int(m.group(1)) <= keep_newest_than:
                shutil.rmtree(os.path.join(self.dir, entry), ignore_errors=True)

    def commit(
        self,
        df: DataFrame,
        iteration: int,
        metrics: dict[str, Any] | None = None,
    ) -> DataFrame:
        """write_state + log_entry in one step (callers that already hold
        their metrics, e.g. CC/LP whose convergence counts execute the
        iteration before the write)."""
        t0 = time.time()
        out = self.write_state(df, iteration)
        m = dict(metrics or {})
        m["checkpoint_write_sec"] = round(time.time() - t0, 3)
        self.log_entry(iteration, m)
        return out

    def entries(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.manifest):
            return []
        with open(self.manifest) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    def latest(self) -> dict[str, Any] | None:
        entries = self.entries()
        return entries[-1] if entries else None

    def load_latest(self, spark: SparkSession) -> tuple[DataFrame, int] | None:
        """Resume point: (state DataFrame, iteration) of the newest commit."""
        last = self.latest()
        if last is None:
            return None
        return spark.read.parquet(last["path"]), last["iteration"]
