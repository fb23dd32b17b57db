"""Apache Hudi copy-on-write table reader, dependency-free (the
PUBLIC Hudi timeline layout): ``.hoodie/<instant>.commit`` JSON files
whose ``partitionToWriteStats`` map the write's file groups to data
files.  Completes the table-format interop trifecta next to
:mod:`padawan_spark.functions.delta` and
:mod:`padawan_spark.functions.iceberg`.

Copy-on-write semantics: each commit rewrites whole file groups, so
the live view at an instant keeps, per ``fileId``, the path written by
the LATEST completed commit at or before that instant.  The reader
replays the timeline (O(commits x write-stats) driver work), reads the
surviving parquet files in one scan, and drops Hudi's ``_hoodie_*``
meta columns by default.

Supported: CoW tables with JSON commit instants and instant-time time
travel.  Merge-on-read tables (log files needing compaction),
replacecommit/clustering, and ``.hoodie/metadata`` table reads raise an
honest ``NotImplementedError``.
"""

from __future__ import annotations

import json
import os
import re

_META_COLS = ("_hoodie_commit_time", "_hoodie_commit_seqno",
              "_hoodie_record_key", "_hoodie_partition_path",
              "_hoodie_file_name")


def list_hudi_commits(path: str) -> list[str]:
    """Completed commit instants (ascending timestamp strings)."""
    hdir = os.path.join(path, ".hoodie")
    if not os.path.isdir(hdir):
        raise FileNotFoundError(f"{path} has no .hoodie directory")
    out = []
    for f in os.listdir(hdir):
        m = re.match(r"^(\d+)\.commit$", f)
        if m:
            out.append(m.group(1))
        elif re.match(r"^\d+\.(deltacommit|replacecommit)$", f):
            raise NotImplementedError(
                f"hudi instant {f}: merge-on-read/clustering "
                "timelines unsupported (copy-on-write .commit only)")
    return sorted(out)


def live_hudi_files(path: str, as_of: str | None = None):
    """Latest file slice per file group at ``as_of`` (default: latest
    commit).  Returns ``[(abs_path, partition_path)]``."""
    commits = list_hudi_commits(path)
    if not commits:
        raise FileNotFoundError(f"{path}: no completed commits")
    if as_of is None:
        as_of = commits[-1]
    if as_of not in commits:
        raise ValueError(
            f"no commit instant {as_of} at {path}; have {commits}")
    latest: dict[str, tuple[str, str]] = {}    # fileId -> (rel, part)
    for ts in commits:
        if ts > as_of:
            break
        with open(os.path.join(path, ".hoodie", f"{ts}.commit")) as fh:
            commit = json.load(fh)
        for part, stats in commit.get("partitionToWriteStats",
                                      {}).items():
            for st in stats:
                fid = st.get("fileId")
                rel = st.get("path")
                if fid and rel:
                    latest[fid] = (rel, part)
    return sorted((os.path.join(path, rel), part)
                  for rel, part in latest.values())


def read_hudi(spark, path: str, as_of: str | None = None,
              keep_meta: bool = False):
    """Scan a Hudi CoW table at a commit instant (default: latest).
    One parquet scan over the live file slices; ``_hoodie_*`` meta
    columns dropped unless ``keep_meta``."""
    files = [p for p, _part in live_hudi_files(path, as_of)]
    if not files:
        raise NotImplementedError(f"{path}: no live data files")
    df = spark.read.parquet(*files)
    if not keep_meta:
        df = df.drop(*[c for c in df.columns if c in _META_COLS])
    return df


def write_hudi_fixture(spark, df, path: str,
                       partition_field: str | None = None,
                       replace_file_ids=(), instant: str | None = None
                       ) -> str:
    """FIXTURE writer emitting the public CoW timeline layout (a test
    double, not a transactional writer — same stance as the Delta and
    Iceberg fixture writers).  Each call is one commit: ``df``'s rows
    become one file group per distinct partition value (with the
    standard ``_hoodie_*`` meta columns), and any fileId listed in
    ``replace_file_ids`` is REWRITTEN (same fileId, new file — the
    copy-on-write update path).  Returns the commit instant."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    hdir = os.path.join(path, ".hoodie")
    os.makedirs(hdir, exist_ok=True)
    try:
        commits = list_hudi_commits(path)
    except FileNotFoundError:
        commits = []
    instant = instant or f"{20260101000000 + len(commits):014d}"
    parts: dict[str, list] = {}
    rows = df.collect()
    for r in rows:
        part = (str(r[partition_field]) if partition_field
                else "")
        parts.setdefault(part, []).append(r)
    stats_by_part: dict[str, list] = {}
    for pi, (part, prows) in enumerate(sorted(parts.items())):
        fid = (list(replace_file_ids)[pi]
               if pi < len(replace_file_ids)
               else uuid.uuid4().hex[:8])
        rel_dir = part
        fname = f"{fid}_0-0-0_{instant}.parquet"
        rel = f"{rel_dir}/{fname}" if rel_dir else fname
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        import pandas as pd
        data = {c: [r[c] for r in prows] for c in df.columns}
        meta = {
            "_hoodie_commit_time": [instant] * len(prows),
            "_hoodie_commit_seqno": [f"{instant}_{i}"
                                     for i in range(len(prows))],
            "_hoodie_record_key": [str(r[0]) for r in prows],
            "_hoodie_partition_path": [part] * len(prows),
            "_hoodie_file_name": [fname] * len(prows),
        }
        pdf = pd.DataFrame({**meta, **data})
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       full)
        stats_by_part.setdefault(part, []).append({
            "fileId": fid, "path": rel,
            "numWrites": len(prows),
            "fileSizeInBytes": os.path.getsize(full)})
    with open(os.path.join(hdir, f"{instant}.commit"), "w") as fh:
        json.dump({"partitionToWriteStats": stats_by_part,
                   "operationType": "UPSERT"}, fh)
    return instant
