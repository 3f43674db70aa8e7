"""Custom Python DataSource WRITER (PySpark 4 DataSource API) — the sink
counterpart of the ``fred_series`` reader family (sources/fred_datasource.py
covers batch read + streaming read; this module completes batch WRITE).

The reference loads its final table into Postgres with a driver-side
psycopg2 loop (``etl.py:48-73``). The DataSource writer API moves that
boundary into the engine with the real two-phase commit protocol
distributed sinks need:

- each task serializes ITS partition to a staging file and returns a
  commit message (filename, row count) — no data ever funnels through
  the driver;
- ``commit()`` (driver, once, only after EVERY task succeeded) promotes
  the staged files and atomically publishes a ``_MANIFEST`` naming
  exactly the committed parts;
- ``abort()`` removes staged files, so a failed/speculative task never
  becomes visible;
- readers trust ONLY the manifest: stray or orphaned staging files in
  the directory are invisible (tests/test_custom_source_stateful.py
  plants both and asserts the read-back ignores them). Raw directory
  reads (``spark.read.json(path)``) are UNSUPPORTED — use
  :func:`committed_files`. Overwrite commits additionally garbage-
  collect part files the new manifest doesn't name (after the atomic
  manifest swap), so repeated overwrites don't accumulate orphans;
  empty partitions are never promoted.

Local-mode note: tasks and driver share one filesystem here, which is
what makes file promotion in ``commit()`` work; on a cluster the same
protocol runs against shared object storage (staging keys + manifest
swap), which is exactly how Iceberg/Delta commit. JSONL keeps the part
payload human-auditable; the format is not the point, the protocol is.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST"


@dataclass
class PartCommit(WriterCommitMessage):
    """Per-task commit message: the staged file awaiting promotion."""

    staged: str
    final: str
    n_rows: int


class JsonDirSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("json_dir_sink requires .option('path', ...)")
        self.path = path
        self.overwrite = overwrite

    # executor-side: stage this partition, never publish
    def write(self, iterator) -> PartCommit:
        os.makedirs(self.path, exist_ok=True)
        final = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, f"_staged_{final}")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return PartCommit(staged=staged, final=final, n_rows=n)

    # driver-side, runs once after all tasks succeeded
    def commit(self, messages) -> None:
        parts: list[dict] = []
        for m in messages:
            if m.n_rows:  # empty partitions: drop the stage, never promote
                os.replace(m.staged, os.path.join(self.path, m.final))
                parts.append({"file": m.final, "n_rows": m.n_rows})
            else:
                try:
                    os.remove(m.staged)
                except OSError:
                    pass
        manifest_path = os.path.join(self.path, MANIFEST)
        prior: list[dict] = []
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prior = json.load(f)["parts"]
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "parts": prior + parts,
                    "total_rows": sum(p["n_rows"] for p in prior + parts),
                },
                f,
            )
        os.replace(tmp, manifest_path)  # atomic publish
        if self.overwrite:
            # physical GC after the logical swap: earlier generations'
            # part files are no longer reachable from the manifest —
            # removing them keeps repeated overwrites from accumulating
            # orphans a raw-directory read (unsupported, but the obvious
            # mistake) would double-count. Manifest-first ordering means
            # a crash here leaks files but never publishes wrong data.
            keep = {p["file"] for p in parts}
            for f in os.listdir(self.path):
                if (
                    f.startswith("part-")
                    and f.endswith(".jsonl")
                    and f not in keep
                ):
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        # a FAILED task's entry is None (no commit message, and its own
        # partial staging file path is unknowable here) — clean the
        # successful tasks' staged files and skip the None slots
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.staged)
            except OSError:
                pass


class JsonDirSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "json_dir_sink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return JsonDirSinkWriter(self.options, overwrite)


def committed_files(path: str) -> list[str]:
    """The reader half of the manifest contract: the exact committed part
    paths, in manifest order. Anything else in the directory is invisible."""
    with open(os.path.join(path, MANIFEST)) as f:
        parts = json.load(f)["parts"]
    return [os.path.join(path, p["file"]) for p in parts]
