"""True single-file byte-offset tail as a Spark streaming source.

The reference's sensor loop (ref core/sensor.go:42-123) opens ONE log
file, seeks to the saved byte offset, reads the new complete lines,
persists the offset, and detects truncation/rotation (file smaller than
the offset → start over, core/sensor.go:60-68). Spark's built-in file
source tracks *files*, not intra-file offsets, which is why earlier
rounds documented a chunk-directory contract instead (SURVEY.md §7).

PySpark 4's Python DataSource API removes that gap: this module is a
``filetail`` streaming source whose offset IS the byte position, giving
the reference's exact semantics natively —

- **O1 file-tail scan**: each micro-batch reads ``[start, eof)`` of the
  tailed file and emits the complete lines in it;
- **O2 truncation/rotation reset**: if the file shrank below the saved
  offset, restart from byte 0 (same rule as the reference);
- **O3 offset checkpointing**: the offset dict is persisted by
  Structured Streaming's checkpoint machinery — restart resumes at the
  committed byte position, no custom state files.

A partial last line (no trailing newline yet — a writer mid-append) is
NOT consumed: the offset only advances past the last complete line, so
the next batch re-reads the remainder. That makes every emitted line
exactly-once under replay (offsets are deterministic functions of file
content).

Scale note: tailing one file is inherently serial (the reference runs
one goroutine per sensor); the reader is a
``SimpleDataSourceStreamReader`` (driver-side reads) by design. Fan-in
of MANY tailed files is the multi-source union (O30) — one stream per
sensor, ``unionByName``, exactly the reference's EventBus shape. High-
volume ingest should use the chunk-directory contract instead; this
source exists for sensor-parity on live appended logs.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

SCHEMA = "value string, byte_offset bigint"


class _TailStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str):
        self.path = path

    HEAD_ID_BYTES = 64

    def _head_id(self, length: int | None = None) -> tuple[int, str]:
        """Content identity for rotation detection: md5 of the file's
        first min(size, 64) bytes (or exactly ``length`` bytes when
        re-checking a stored identity). Append-only writes never change
        an already-hashed prefix, so the identity is stable across
        appends but flips on rotate-and-recreate — unlike inode
        numbers, which filesystems recycle immediately."""
        import hashlib

        try:
            with open(self.path, "rb") as fh:
                head = fh.read(
                    self.HEAD_ID_BYTES if length is None else length
                )
        except OSError:
            return 0, ""
        if length is not None and len(head) < length:
            return len(head), ""  # file shorter than the stored prefix
        return len(head), hashlib.md5(head).hexdigest()

    def _same_file(self, off: dict) -> bool:
        """Does the file on disk still begin with the prefix recorded in
        offset ``off``? hl == 0 means no identity recorded (empty file
        at offset time) — treat as same."""
        hl = int(off.get("hl", 0))
        if hl == 0:
            return True
        cur_len, cur_hash = self._head_id(hl)
        return cur_len == hl and cur_hash == off.get("hh", "")

    def initialOffset(self) -> dict:
        # start at byte 0: a fresh query drains the existing file first
        # (the reference resumes from its DB state; Spark's checkpoint
        # plays that role — initialOffset only applies to new queries)
        hl, hh = self._head_id()
        return {"pos": 0, "hl": hl, "hh": hh}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pos = int(start["pos"])
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return iter([]), start  # file missing: no progress, retry later
        # O2 reset, two rotation styles: truncation-in-place (size fell
        # below the offset — the reference's own rule) and
        # rotate-and-recreate (head checksum changed; catches the case
        # where the NEW file is already larger than the old offset,
        # which a size check alone would misread as a plain append)
        if size < pos or not self._same_file(start):
            pos = 0
        hl, hh = self._head_id()
        if size == pos:
            if pos == int(start["pos"]) and hh == start.get("hh", hh):
                return iter([]), start
            return iter([]), {"pos": pos, "hl": hl, "hh": hh}
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            chunk = fh.read(size - pos)
        # consume only complete lines; a trailing partial line stays
        # unconsumed until its newline arrives
        last_nl = chunk.rfind(b"\n")
        if last_nl < 0:
            return iter([]), {"pos": pos, "hl": hl, "hh": hh}
        complete = chunk[: last_nl + 1]
        rows = []
        line_pos = pos
        for raw in complete.split(b"\n")[:-1]:
            rows.append(
                (raw.decode("utf-8", errors="replace").rstrip("\r"), line_pos)
            )
            line_pos += len(raw) + 1
        return iter(rows), {"pos": pos + last_nl + 1, "hl": hl, "hh": hh}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # deterministic replay of a committed range (failure recovery):
        # offsets are byte positions, so the range re-reads exactly the
        # same bytes — unless the file rotated or truncated in between,
        # in which case the committed bytes are gone and the replay MUST
        # be empty rather than garbage from the new file's content.
        pos, endpos = int(start["pos"]), int(end["pos"])
        if endpos <= pos:
            return iter([])
        if not self._same_file(end):
            return iter([])  # rotated: a different file now lives here
        try:
            if os.path.getsize(self.path) < endpos:
                return iter([])  # truncated below the committed range
            with open(self.path, "rb") as fh:
                fh.seek(pos)
                chunk = fh.read(endpos - pos)
        except OSError:
            return iter([])
        rows = []
        line_pos = pos
        for raw in chunk.split(b"\n")[:-1]:
            rows.append(
                (raw.decode("utf-8", errors="replace").rstrip("\r"), line_pos)
            )
            line_pos += len(raw) + 1
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offset durability is the engine checkpoint's job (O3)


class FileTailDataSource(DataSource):
    """``spark.readStream.format("filetail").option("path", f)`` —
    register with ``spark.dataSource.register(FileTailDataSource)``.

    Output schema: (value string, byte_offset bigint) — the line and
    the byte position it started at (a stable per-line identity the
    parse stage can carry as provenance).
    """

    @classmethod
    def name(cls) -> str:
        return "filetail"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType):
        path = self.options.get("path")
        if not path:
            raise ValueError("filetail source requires option 'path'")
        return _TailStreamReader(path)


def register_filetail(spark) -> None:
    """Idempotent registration helper."""
    spark.dataSource.register(FileTailDataSource)
