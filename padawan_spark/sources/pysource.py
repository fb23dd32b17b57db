"""Custom connector via the Python Data Source API (Spark 4).

The reference's only source is a parquet directory
(``/root/reference/src/padawan/persisted_dataset.py:66-84``); Spark 4's
``pyspark.sql.datasource`` lets this engine add arbitrary pure-Python
connectors (REST paginators, proprietary formats, synthetic generators)
that still plug into Catalyst with a real schema and task-parallel
partitions — each ``InputPartition`` becomes one Spark task, so a
connector scales out exactly like a file scan.

``SequenceSource`` is the in-tree demonstration: a deterministic
partitioned integer sequence (id, square, bucket) — the Python analog of
``spark.range`` with computed columns, used by the ``adv_custom_source``
oracle query.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, DataSourceWriter,
    InputPartition, WriterCommitMessage,
)
from pyspark.sql.types import LongType, StructField, StructType

_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("square", LongType(), False),
    StructField("bucket", LongType(), False),
])


class _SequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [InputPartition((i * step, min((i + 1) * step, self.n)))
                for i in range(self.parts) if i * step < self.n]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, i * i, i % 7)


class _SequenceStreamReader(DataSourceStreamReader):
    """Bounded replay STREAM of the same rows (Spark 4 Python streaming
    data source).  Offsets are row positions.  ``latestOffset`` reports
    the EXTERNAL truth — every row of the bounded sequence is already
    available — never reader-internal throttling state: Spark gives the
    reader no start offset here, so any internal progress counter would
    regress after a checkpoint restart and corrupt exactly-once (the
    classic custom-source bug; real sources report broker/file-listing
    state for the same reason).  The planned range splits into
    ``batchRows``-sized InputPartitions, so a 10k-row batch still reads
    task-parallel exactly like the batch reader, and a restart resumes
    from the checkpointed offset with no replay gap or overlap."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch_rows = int(options.get("batchRows", 250))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": self.n}

    def partitions(self, start, end):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [InputPartition((lo, lo))]
        step = max(1, self.batch_rows)
        return [InputPartition((p, min(p + step, hi)))
                for p in range(lo, hi, step)]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, i * i, i % 7)

    def commit(self, end):
        pass  # bounded in-process replay: nothing to reclaim


class SequenceSource(DataSource):
    """``spark.read[Stream].format("pyseq").option("n", ...)``."""

    @classmethod
    def name(cls):
        return "pyseq"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _SequenceReader(self.options)

    def streamReader(self, schema):
        return _SequenceStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register the in-tree Python data sources."""
    spark.dataSource.register(SequenceSource)
    spark.dataSource.register(JsonlSink)
    spark.dataSource.register(ManifestTailSource)


# ---------------------------------------------------------------------------
# Custom Python Data Source SINK (Spark 4 DataSourceWriter): newline-
# delimited JSON with an explicit commit protocol.  Each task writes its
# partition to a uniquely-named file and returns the name as its commit
# message; the DRIVER's commit() then records exactly the committed
# files in a manifest.  Readers list the manifest, not the directory —
# so files from failed/speculative task attempts are never visible
# (the same two-phase visibility rule every exactly-once lakehouse sink
# implements).
# ---------------------------------------------------------------------------


class _JsonlCommitMessage(WriterCommitMessage):
    """Picklable task commit message: the file this task produced."""

    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a path option")
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        full = _os.path.join(self.path, name)
        n = 0
        with open(full, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return _JsonlCommitMessage(name, n)

    def commit(self, messages):
        import json as _json
        import os as _os
        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.rows for m in messages),
        }
        with open(_os.path.join(self.path, "_manifest.json"), "w") as fh:
            _json.dump(manifest, fh)

    def abort(self, messages):
        import os as _os
        for m in messages:
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlSink(DataSource):
    """``df.write.format("jsonlsink").option("path", dir).save()`` —
    single-machine demonstration (task files land on a shared local fs;
    a cluster deployment points ``path`` at a shared store)."""

    @classmethod
    def name(cls):
        return "jsonlsink"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, schema)


def read_jsonl_sink(spark, path, schema):
    """Read back ONLY the manifest-committed files of a jsonlsink dir."""
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_manifest.json")) as fh:
        manifest = _json.load(fh)
    files = [_os.path.join(path, f) for f in manifest["files"]]
    return spark.read.schema(schema).json(files)


# ---------------------------------------------------------------------------
# Manifest-tailing STREAM source: the snapshot history of a manifest-
# versioned dataset (dataset.write_parquet archives one version per
# write) is treated as a commit log — offsets are version numbers, and
# each micro-batch reads exactly the files ADDED between two versions
# (the same delta op_incremental_read consumes in batch).  latestOffset
# reports the on-disk version list (external truth → checkpoint-restart
# safe), and each new file is one InputPartition, so a batch of many
# appended files reads task-parallel.  This is the "table as a stream" /
# change-data-feed idea of the lakehouse formats, on the padawan
# manifest.
# ---------------------------------------------------------------------------


class _ManifestTailReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self._seen_id = None   # first non-null table id observed this run

    def _stamp(self, tid):
        """Track the first non-null table id seen this RUN and fail
        loudly if it ever changes.  Offsets checkpointed before the
        table existed carry ``id=null`` forever (initialOffset on an
        empty path), so the offset-level identity check alone never
        activates for such streams — this run-level stamp closes that
        window from the first batch where ``table_id()`` materializes
        (ADVICE r5)."""
        if tid is None:
            return tid
        if self._seen_id is None:
            self._seen_id = tid
        elif self._seen_id != tid:
            raise RuntimeError(
                f"padawan_tail: table identity at {self.path} changed "
                f"({self._seen_id[:8]}… -> {tid[:8]}…) — the dataset was "
                "overwritten under an active stream.  The old checkpoint "
                "does not describe the new table; restart the stream with "
                "a fresh checkpointLocation to stream it from scratch.")
        return tid

    def initialOffset(self):
        from .. import metadata as _meta
        return {"v": 0, "id": self._stamp(_meta.table_id(self.path))}

    def latestOffset(self):
        from .. import metadata as _meta
        vs = _meta.list_versions(self.path)
        return {"v": vs[-1] if vs else 0,
                "id": self._stamp(_meta.table_id(self.path))}

    def _files_of(self, version: int) -> list | None:
        """Files of a snapshot; ``None`` when that snapshot no longer
        exists (expired by ``metadata.vacuum``, or history was reset by
        an overwrite)."""
        from .. import metadata as _meta
        if version <= 0:
            return []
        try:
            return list(_meta.load_manifest(self.path, version=version).files)
        except FileNotFoundError:
            return None

    def partitions(self, start, end):
        import os as _os
        lo, hi = start["v"], end["v"]
        # table-identity check: an overwrite resets history to v1, so a
        # busy producer can grow the NEW table's version count past the
        # checkpointed offset before the next batch fires — the hi < lo
        # guard alone would then silently diff two unrelated histories.
        # The identity stamp (minted with the version dir, destroyed by
        # overwrite's rmtree) catches that regardless of version numbers.
        # fall back to the run-level stamp for offsets minted before the
        # table existed (id=null) or by pre-identity checkpoints
        sid = start.get("id") or self._seen_id
        eid = self._stamp(end.get("id")) or self._seen_id
        if sid is not None and eid is not None and sid != eid:
            raise RuntimeError(
                f"padawan_tail: table identity at {self.path} changed "
                f"({sid[:8]}… -> {eid[:8]}…) — the dataset was overwritten "
                "under an active stream.  The old checkpoint does not "
                "describe the new table; restart the stream with a fresh "
                "checkpointLocation to stream it from scratch.")
        if hi < lo:
            # version history only grows under append; a LOWER latest
            # version means the table was overwritten (rmtree resets
            # history to v1) under an active stream — the checkpointed
            # offset no longer describes this table's history, so fail
            # with guidance instead of silently re-emitting rows
            raise RuntimeError(
                f"padawan_tail: version history at {self.path} regressed "
                f"from v{lo} to v{hi} — the dataset was overwritten under "
                "an active stream.  The old checkpoint does not describe "
                "the new table; restart the stream with a fresh "
                "checkpointLocation to stream it from scratch.")
        if hi <= lo:
            return [InputPartition(None)]
        base = self._files_of(lo)
        if base is None:
            # the checkpointed snapshot was expired by vacuum: the delta
            # base is gone, so "files added since lo" is unanswerable —
            # fail loudly rather than regress offsets or re-emit history
            raise RuntimeError(
                f"padawan_tail: checkpointed snapshot v{lo} at {self.path} "
                "no longer exists (expired by metadata.vacuum).  Keep at "
                "least the snapshots an active stream may restart from "
                "(vacuum keep_last), or restart the stream with a fresh "
                "checkpointLocation.")
        seen = set(base)
        new = []
        for v in range(lo + 1, hi + 1):
            files = self._files_of(v)
            if files is None:
                # an INTERMEDIATE snapshot expired: safe to skip — file
                # lists are cumulative, so anything it added and a later
                # retained snapshot still references shows up there
                continue
            for f in files:
                if f not in seen:
                    seen.add(f)
                    new.append(_os.path.join(self.path, f))
        return [InputPartition(p) for p in new] or [InputPartition(None)]

    def read(self, partition):
        if partition.value is None:
            return
        import pyarrow.parquet as pq
        for row in pq.read_table(partition.value).to_pylist():
            yield tuple(row.values())

    def commit(self, end):
        pass  # snapshots are retained until metadata.vacuum


class ManifestTailSource(DataSource):
    """``spark.readStream.format("padawan_tail").schema(...)
    .option("path", dataset_dir)`` — stream the version history of a
    manifest dataset; user-provided schema must match the table.

    Contract under table maintenance (same caveats as any change-data
    feed): ``write_parquet(append=True)`` is the supported producer.
    An OVERWRITE resets version history and breaks the stream (loud
    error on restart — fresh checkpoint required); a VACUUM that
    expires the snapshot a checkpoint restarts from also fails loudly
    (keep enough snapshots for your longest stream outage); a
    COMPACTION re-emits already-streamed rows, because merged files are
    genuinely new files in the manifest delta — downstream consumers
    that must be compaction-proof should deduplicate on a row key."""

    @classmethod
    def name(cls):
        return "padawan_tail"

    def streamReader(self, schema):
        return _ManifestTailReader(self.options)
