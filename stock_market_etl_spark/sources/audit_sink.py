"""Custom Python Data Source WRITER (PySpark 4 ``DataSource`` API) —
the sink-side twin of `market_source.py`'s reader (SURVEY §2.B
superset): an Arrow-batched JSON-lines sink with a real two-phase task
commit.

The reference pushes serving loads driver-side through SQLAlchemy
(`scripts/load_stock_metrics.py:57-89`); a Spark-native custom sink
instead runs once per TASK with the driver only coordinating commit —
the same job/task-commit protocol every production sink (parquet,
JDBC, Delta) uses, here in its minimal visible form:

- ``write`` (executor, per task): stream the task's RecordBatches to a
  private ``part-*.jsonl.tmp`` file and return a commit message naming
  it — nothing a failed/speculative task writes is ever visible.
- ``commit`` (driver, all tasks succeeded): atomically rename each tmp
  file into place and publish a ``_MANIFEST`` listing exactly the
  committed files. Readers trust the manifest, so a crashed job (tmp
  files present, no manifest) reads as empty, not as partial data.
- ``abort`` (driver, any task failed): delete the orphaned tmp files.

Arrow batches (``DataSourceArrowWriter``) keep the executor-side hop
vectorized — rows never materialize one Python object at a time.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_name: str = ""
    n_rows: int = 0


MANIFEST = "_MANIFEST"


class _JsonlWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator):
        os.makedirs(self._path, exist_ok=True)
        tmp = f"part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self._path, tmp), "w") as f:
            for batch in iterator:
                for row in batch.to_pylist():
                    f.write(json.dumps(row, default=str) + "\n")
                    n += 1
        return _FileCommit(tmp_name=tmp, n_rows=n)

    def commit(self, messages):
        final_names = []
        for m in messages:
            if m is None or not m.n_rows:
                # skip empty tasks but still clean their tmp files
                if m is not None:
                    self._drop_tmp(m.tmp_name)
                continue
            final = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self._path, m.tmp_name),
                os.path.join(self._path, final),
            )
            final_names.append(final)
        manifest = os.path.join(self._path, MANIFEST)
        if self._overwrite or not os.path.exists(manifest):
            published = sorted(final_names)
        else:
            with open(manifest) as f:
                published = sorted(set(json.load(f)) | set(final_names))
        with open(manifest + ".tmp", "w") as f:
            json.dump(published, f)
        os.replace(manifest + ".tmp", manifest)  # atomic publish

    def abort(self, messages):
        for m in messages:
            if m is not None:
                self._drop_tmp(m.tmp_name)

    def _drop_tmp(self, tmp_name: str) -> None:
        try:
            os.remove(os.path.join(self._path, tmp_name))
        except FileNotFoundError:
            pass


class JsonlAuditSink(DataSource):
    """``df.write.format("jsonl_audit").option("path", p).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_audit requires a 'path' option")
        return _JsonlWriter(path, overwrite)


def read_jsonl_audit(spark, path: str, schema):
    """Manifest-trusting reader: only files the commit phase published
    are loaded — tmp leftovers from crashed/aborted jobs are invisible
    (the sink's exactly-once read contract)."""
    manifest = os.path.join(path, MANIFEST)
    if not os.path.exists(manifest):
        return spark.createDataFrame([], schema)
    with open(manifest) as f:
        files = [os.path.join(path, name) for name in json.load(f)]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
