"""Delta Lake table reader (reference: exon_context_ext.rs:181-185,579-588
``read_delta_table`` / ``STORED AS DELTATABLE``, feature-gated on delta-rs;
delta.slt).

If the delta-spark connector is on the classpath we defer to it. Otherwise
this module replays the public Delta transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) to the active
file set — `_last_checkpoint` → checkpoint parquet adds, then JSON commits
in version order, remove-by-path tombstones — and hands the surviving
parquet files to Spark's native reader with ``basePath`` so partition
columns are re-derived from the paths.

Scale notes: only the transaction LOG is read driver-side (metadata: one
row per file, exactly what any planner must hold); data files are scanned
by executors through the stock parquet source, so predicate pushdown,
column pruning and split planning all apply unchanged. Tables whose
checkpoints exceed driver memory need the connector's distributed log
replay — we raise rather than silently degrade.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet$")

# protocol reader features we implement: plain add/remove replay +
# partition values. Anything newer (deletion vectors, column mapping,
# v2 checkpoints) must fail loudly, per PROTOCOL.md reader rules.
_MAX_READER_VERSION = 1


class DeltaProtocolError(NotImplementedError):
    pass


def _replay_log(log_dir: str) -> tuple[list[str], dict]:
    """Replay the transaction log; returns (active relative paths, last
    metaData action)."""
    entries = sorted(os.listdir(log_dir))
    start_version = -1
    active: dict[str, dict] = {}
    meta: dict = {}

    last_cp = os.path.join(log_dir, "_last_checkpoint")
    cp_files: list[str] = []
    if os.path.exists(last_cp):
        with open(last_cp) as fh:
            cp = json.load(fh)
        v = int(cp["version"])
        parts = cp.get("parts")
        pref = f"{v:020d}.checkpoint"
        cp_files = [
            os.path.join(log_dir, e)
            for e in entries
            if e.startswith(pref) and e.endswith(".parquet")
        ]
        if parts and len(cp_files) != parts:
            raise DeltaProtocolError(
                f"multipart checkpoint incomplete: want {parts} got {len(cp_files)}"
            )
        if not cp_files:
            # _last_checkpoint names a version whose parquet files are gone:
            # advancing start_version would silently skip every commit <= v,
            # returning a partial file set. Module contract: raise instead.
            raise DeltaProtocolError(
                f"_last_checkpoint names version {v} but no "
                f"{pref}*.parquet files exist in {log_dir}"
            )
        start_version = v

    if cp_files:
        import pyarrow.parquet as pq

        for f in cp_files:
            t = pq.read_table(f)
            cols = t.column_names
            rows = t.to_pylist()
            for row in rows:
                add = row.get("add") if "add" in cols else None
                if add and add.get("path"):
                    active[add["path"]] = add
                prot = row.get("protocol") if "protocol" in cols else None
                if prot and prot.get("minReaderVersion"):
                    _check_protocol(prot)
                md = row.get("metaData") if "metaData" in cols else None
                if md and md.get("id"):
                    meta = md

    for e in entries:
        m = _VERSION_RE.match(e)
        if not m or int(m.group(1)) <= start_version:
            continue
        with open(os.path.join(log_dir, e)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    _check_protocol(action["protocol"])
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    return list(active), meta


def _check_protocol(protocol: dict) -> None:
    v = int(protocol.get("minReaderVersion", 1))
    feats = protocol.get("readerFeatures") or []
    if v > _MAX_READER_VERSION and feats:
        # v3 tables are readable iff every listed feature is one we know
        unknown = [f for f in feats if f not in ()]
        if unknown:
            raise DeltaProtocolError(
                f"Delta reader features not supported: {unknown} — "
                "install delta-spark for this table"
            )
    elif v > _MAX_READER_VERSION:
        raise DeltaProtocolError(
            f"Delta minReaderVersion {v} not supported without delta-spark"
        )


def _connector_available(spark: SparkSession) -> bool:
    try:
        # py4j package traversal never raises — ask the classloader
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.DeltaLog"
        )
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str, **options) -> DataFrame:
    """``read_deltatable`` (exon_context_ext.rs:579-588). Prefers the real
    connector when its classes are present; otherwise native log replay."""
    path = path.rstrip("/")
    if path.startswith("file:"):
        path = path[len("file:") :]
    if _connector_available(spark):
        return spark.read.format("delta").load(path)
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    rel_paths, meta = _replay_log(log_dir)
    from pyspark.sql.types import StructType

    schema = None
    if meta.get("schemaString"):
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if not rel_paths:
        if schema is None:
            raise DeltaProtocolError(f"Delta log has no metaData action: {path}")
        return spark.createDataFrame([], schema)
    files = [_resolve_add_path(path, p) for p in sorted(rel_paths)]
    reader = spark.read.option("basePath", path)
    if schema is not None:
        # Pin the declared Delta schema (column types, order, nullability)
        # rather than re-inferring from parquet footers — this also pins
        # partition-column types, which path-string inference can drift on
        # (e.g. '01' -> int 1, '2024-01-01' -> date).
        reader = reader.schema(schema)
    return reader.parquet(*files)


def _resolve_add_path(table_path: str, p: str) -> str:
    """add.path is a relative path within the table, or an absolute URI
    (PROTOCOL.md: 'a path ... relative ... or an absolute path'); both are
    percent-encoded."""
    p = urllib.parse.unquote(p)
    parsed = urllib.parse.urlparse(p)
    if parsed.scheme and parsed.scheme != "file":
        raise DeltaProtocolError(
            f"absolute add.path with scheme {parsed.scheme!r} not supported "
            "without delta-spark"
        )
    if parsed.scheme == "file":
        p = parsed.path
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)
