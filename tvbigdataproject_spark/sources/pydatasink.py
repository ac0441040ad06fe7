"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
JSON-lines directory sink with a real two-phase commit protocol.

The reader twin (sources/pydatasource.py) exercises partition
planning; this exercises the other half of the connector surface —
per-task writes, commit messages, and the driver-side commit that
makes the output atomic:

- each task streams its partition to a TEMPORARY file named by task
  (attempt) id — a speculative or retried task never collides;
- the task returns a WriterCommitMessage carrying (temp path, rows);
- only the driver-side commit() renames the temps to their final
  ``part-NNNNN.jsonl`` names and writes a ``_SUCCESS`` manifest with
  the total row count — so a reader that requires the manifest never
  observes a partial write (the exactly-once story of
  streaming/sinks.py, on the batch writer API);
- abort() removes every temp of THIS JOB by its job-scoped prefix —
  not from the commit messages: Spark's Python writer passes abort()
  all-None messages (observed on 4.1), so per-job namespacing is the
  only reliable cleanup handle. The job id is generated once on the
  driver when the writer is constructed and serialized to every task.
  Because straggler tasks may still be creating temps when abort()
  runs (task-kill latency), abort first drops an ``_aborted-{job}``
  sentinel that every task re-checks after writing (self-clean), then
  sweeps until quiescent; the next commit() janitors stale sentinels.

Local-filesystem rename is atomic per file; on an object store the
same protocol runs with multipart-upload completion as the "rename".
"""

from __future__ import annotations

import contextlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartMessage(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonDirDataSource(DataSource):
    """``df.write.format("jsonldir").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema, overwrite: bool) -> "JsonDirWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonldir sink requires option 'path'")
        return JsonDirWriter(
            path=path,
            columns=[f.name for f in schema.fields],
            overwrite=overwrite,
        )


class JsonDirWriter(DataSourceWriter):
    def __init__(
        self, path: str, columns: list[str], overwrite: bool = False
    ) -> None:
        self.path = path
        self.columns = columns
        self.overwrite = overwrite
        # driver-side, once per write job; tasks inherit it via pickle
        self.job_id = uuid.uuid4().hex

    def _sentinel(self) -> str:
        return os.path.join(self.path, f"_aborted-{self.job_id}")

    def write(self, iterator) -> _PartMessage:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp-{self.job_id}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        try:
            with open(tmp, "w") as fh:
                for row in iterator:
                    rec = {c: row[i] for i, c in enumerate(self.columns)}
                    fh.write(json.dumps(rec, default=str) + "\n")
                    n += 1
        except BaseException:
            # a failing task's temp never reaches a commit message, so
            # driver-side abort() cannot clean it — the task must.
            # Suppress FileNotFoundError: if the failure happened before
            # open() created the file, removing it would mask the real
            # task exception with a spurious cleanup error.
            with contextlib.suppress(FileNotFoundError):
                os.remove(tmp)
            raise
        if os.path.exists(self._sentinel()):
            # the driver already aborted this job (a sibling task
            # failed) and its cleanup sweep may have run BEFORE this
            # straggler created its temp — the sentinel closes that
            # race: any temp created after the sweep is created after
            # the sentinel, so its task sees the sentinel here and
            # self-cleans instead of leaking the file.
            with contextlib.suppress(FileNotFoundError):
                os.remove(tmp)
            raise RuntimeError(
                f"jsonldir job {self.job_id} was aborted; "
                "straggler task output discarded"
            )
        return _PartMessage(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import glob as _glob
        import re as _re

        existing = sorted(_glob.glob(os.path.join(self.path, "part-*.jsonl")))
        prev_rows = 0
        base = 0
        success = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # truncate-and-replace semantics: a previous LARGER job's
            # leftover part files must not survive alongside this job's
            # output, or a manifest-trusting reader sees a directory
            # whose part count disagrees with _SUCCESS. Deleting here —
            # on the driver, after every task has succeeded — keeps the
            # protocol atomic: an abort never deletes prior data.
            # ORDERING: the stale manifest goes FIRST — if the process
            # dies mid-overwrite, a manifest-trusting reader must find
            # NO _SUCCESS (in-flight, retry) rather than the old
            # manifest pointing at half-deleted parts.
            with contextlib.suppress(FileNotFoundError):
                os.remove(success)
            for old in existing:
                os.remove(old)
            existing = []
        elif existing:
            # append mode: continue numbering past the prior job's parts
            # (renaming onto part-00000 would silently clobber them) and
            # fold prior row counts into the manifest. Part numbers are
            # parsed by regex, not a fixed [5:10] slice — a directory
            # that ever grows past 99999 parts carries wider numbers
            # (f"{i:05d}" widens past 5 digits), and a fixed slice would
            # silently truncate them and restart numbering inside the
            # occupied range.
            nums = [
                int(m.group(1))
                for p in existing
                if (m := _re.fullmatch(r"part-(\d+)\.jsonl", os.path.basename(p)))
            ]
            base = 1 + max(nums) if nums else 0
            if os.path.exists(success):
                with open(success) as fh:
                    prev_rows = json.load(fh).get("rows", 0)
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{base + i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(
                {"rows": prev_rows + total, "parts": base + len(messages)},
                fh,
            )
        # janitor: a PRIOR job's abort leaves its sentinel behind (see
        # abort() — removing it would reopen the straggler race). A
        # later successful commit to the same directory is the safe
        # point to clear that job's debris: its tasks are long dead.
        for s in _glob.glob(os.path.join(self.path, "_aborted-*")):
            job = os.path.basename(s)[len("_aborted-"):]
            if job == self.job_id:
                continue
            for tmp in _glob.glob(os.path.join(self.path, f"_tmp-{job}-*")):
                with contextlib.suppress(FileNotFoundError):
                    os.remove(tmp)
            with contextlib.suppress(FileNotFoundError):
                os.remove(s)

    def abort(self, messages) -> None:
        import glob as _glob
        import time as _time

        # Spark can deliver the driver-side abort while straggler tasks
        # of this job are still creating temps (task-kill latency), so a
        # single glob sweep races them two ways: (a) a temp created
        # after the glob leaks; (b) a temp the task's own except-handler
        # just removed makes os.remove raise. Protocol: drop the
        # job-scoped abort sentinel FIRST — every task re-checks it
        # after finishing its temp and self-cleans (write()) — then
        # sweep until two consecutive quiescent passes (bounded). The
        # sentinel is retained: removing it would reopen the race for a
        # task killed between sweeps; the next commit() janitors it.
        os.makedirs(self.path, exist_ok=True)
        open(self._sentinel(), "w").close()
        quiescent = 0
        deadline = _time.monotonic() + 10.0
        while quiescent < 2:
            temps = _glob.glob(
                os.path.join(self.path, f"_tmp-{self.job_id}-*")
            )
            for tmp in temps:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(tmp)
            quiescent = 0 if temps else quiescent + 1
            if quiescent < 2:
                if _time.monotonic() > deadline:
                    break
                _time.sleep(0.05)


def register_json_sink(spark) -> None:
    """Idempotently register the sink on any session."""
    spark.dataSource.register(JsonDirDataSource)
