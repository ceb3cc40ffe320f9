"""Base class for the format data sources (Python DataSource API, Spark 4).

Execution model mirrors the reference's scan pattern (SURVEY.md §2.1:
ListingTable -> Scan -> FileStream -> BatchReader): the driver lists files
and plans one InputPartition per file (or per byte-range/index-chunk where
the format is splittable); executors parse records and emit Arrow
RecordBatches of BATCH_SIZE rows (reference: 8*1024,
exon/exon-core/src/config/mod.rs:24).

Hive partition values discovered from ``key=value`` path segments are
appended as string columns (table_schema.rs:76-110 semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    _parse_datatype_string,
)

from exon_spark.sources.util import (
    FoundFile,
    detect_compression,
    list_files,
    partition_columns,
)

BATCH_SIZE = 8 * 1024  # reference: exon config/mod.rs:24

_SIMPLE_TYPES = {
    "string": StringType,
    "boolean": BooleanType,
    "tinyint": ByteType,
    "byte": ByteType,
    "smallint": ShortType,
    "short": ShortType,
    "int": IntegerType,
    "integer": IntegerType,
    "bigint": LongType,
    "long": LongType,
    "float": FloatType,
    "double": DoubleType,
    "binary": BinaryType,
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (p.strip() for p in parts) if p]


def parse_ddl_type(t: str) -> DataType:
    t = t.strip()
    low = t.lower()
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]()
    if low.startswith("array<") and t.endswith(">"):
        return ArrayType(parse_ddl_type(t[6:-1]))
    if low.startswith("map<") and t.endswith(">"):
        k, v = _split_top(t[4:-1])
        return MapType(parse_ddl_type(k), parse_ddl_type(v))
    if low.startswith("struct<") and t.endswith(">"):
        from pyspark.sql.types import StructField

        fields = []
        for f in _split_top(t[7:-1]):
            name, _, typ = f.partition(" ")
            fields.append(StructField(name.strip("`"), parse_ddl_type(typ), True))
        return StructType(fields)
    raise ValueError(f"cannot parse DDL type: {t!r}")


def parse_ddl(ddl: str) -> StructType:
    """Session-free DDL schema parser (covers the types our sources emit).
    Needed because DataSource.schema()/UDTF.analyze() run in workers where
    pyspark's _parse_datatype_string has no SparkContext."""
    from pyspark.sql.types import StructField

    fields = []
    for f in _split_top(ddl):
        name, _, typ = f.partition(" ")
        fields.append(StructField(name.strip("`"), parse_ddl_type(typ), True))
    return StructType(fields)


def arrow_type(dt: DataType) -> pa.DataType:
    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, ByteType):
        return pa.int8()
    if isinstance(dt, ShortType):
        return pa.int16()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, BinaryType):
        return pa.binary()
    if isinstance(dt, ArrayType):
        return pa.list_(arrow_type(dt.elementType))
    if isinstance(dt, MapType):
        return pa.map_(arrow_type(dt.keyType), arrow_type(dt.valueType))
    if isinstance(dt, StructType):
        return pa.struct(
            [pa.field(f.name, arrow_type(f.dataType), True) for f in dt.fields]
        )
    raise TypeError(f"no arrow mapping for {dt}")


def arrow_schema(schema: StructType) -> pa.Schema:
    return pa.schema([pa.field(f.name, arrow_type(f.dataType), True) for f in schema.fields])


@dataclass
class FilePartition(InputPartition):
    path: str
    compression: str
    partition_values: tuple[tuple[str, str], ...]
    start: int = 0
    end: int | None = None  # byte range for splittable formats
    extra: tuple = ()  # e.g. index chunks


def _split_ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """Split a DDL column list into (name, type) pairs, respecting nested
    ``<...>`` in array/struct/map types."""
    fields = []
    depth = 0
    start = 0
    parts = []
    for i, ch in enumerate(ddl):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i])
            start = i + 1
    parts.append(ddl[start:])
    for p in parts:
        p = p.strip()
        if not p:
            continue
        name, _, typ = p.partition(" ")
        fields.append((name.strip("`"), typ.strip()))
    return fields


def read_partition_batches(
    source_cls, options: dict, spark_schema: StructType, partition: FilePartition
) -> Iterator[pa.RecordBatch]:
    """Shared executor-side partition reader (batch + streaming paths)."""
    schema = arrow_schema(spark_schema)
    pv = dict(partition.partition_values)
    names = schema.names

    # vectorized fast path: a source may build whole Arrow batches
    # (e.g. via pyarrow.csv) instead of yielding per-record dicts.
    # Returns None when the partition/options need the generic path.
    vec = getattr(source_cls, "read_arrow_partition", None)
    if vec is not None:
        data_schema = pa.schema([f for f in schema if f.name not in pv])
        batches = vec(partition, options, data_schema)
        if batches is not None:
            for batch in batches:
                if pv:
                    arrays = list(batch.columns)
                    bnames = list(batch.schema.names)
                    for k in schema.names:
                        if k in pv:
                            arrays.append(
                                pa.array([pv[k]] * batch.num_rows, pa.string())
                            )
                            bnames.append(k)
                    batch = pa.RecordBatch.from_arrays(arrays, names=bnames)
                    batch = batch.select(schema.names)
                yield batch
            return

    def flush(rows: list[dict]) -> pa.RecordBatch:
        # column-pivot + typed pa.array is ~7x faster than
        # RecordBatch.from_pylist's per-row dict decoding
        arrays = [
            pa.array([r.get(n) for r in rows], type=schema.field(i).type)
            for i, n in enumerate(names)
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    rows: list[dict] = []
    for rec in source_cls.parse_partition(partition, options):
        if pv:
            rec.update(pv)
        rows.append(rec)
        if len(rows) >= BATCH_SIZE:
            yield flush(rows)
            rows = []
    if rows:
        yield flush(rows)


def derive_region_from_filters(
    filters, chrom_col: str, pos_col: str
) -> str | None:
    """Region string implied by the AND of Catalyst-pushed filters, or
    None. Sound per-conjunct: every row dropped by the derived region
    violates one of the pushed conjuncts, and the caller never consumes
    the filters, so Spark re-applies them all above the scan — pruning is
    purely an optimization (the same contract as the SQL-string rewrite).
    """
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    def col_of(f):
        a = getattr(f, "attribute", None)
        if isinstance(a, tuple):
            return a[-1] if len(a) == 1 else None  # no nested columns here
        return a

    names: list[str] | None = None
    lo, hi = 1, None
    for f in filters:
        col = col_of(f)
        if col == chrom_col:
            if isinstance(f, EqualTo) and isinstance(f.value, str):
                if names is not None and names != [f.value]:
                    return None  # contradictory conjuncts — leave alone
                names = [f.value]
            elif isinstance(f, In) and all(
                isinstance(v, str) for v in f.value
            ):
                vals = list(dict.fromkeys(f.value))
                if names is not None and names != vals:
                    return None
                names = vals
        elif col == pos_col and isinstance(getattr(f, "value", None), int):
            v = f.value
            if isinstance(f, GreaterThan):
                lo = max(lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                lo = max(lo, v)
            elif isinstance(f, LessThan):
                hi = v - 1 if hi is None else min(hi, v - 1)
            elif isinstance(f, LessThanOrEqual):
                hi = v if hi is None else min(hi, v)
            elif isinstance(f, EqualTo):
                lo = max(lo, v)
                hi = v if hi is None else min(hi, v)
    if not names:
        return None
    if hi is None and lo <= 1:
        return ",".join(names)
    span_hi = hi if hi is not None else (1 << 31) - 1
    return ",".join(f"{n}:{lo}-{span_hi}" for n in names)


class FormatReader(DataSourceReader):
    def __init__(self, source: "FileFormatSource", schema: StructType):
        self.source_cls = type(source)
        self.options = dict(source.options)
        self.schema = schema
        self.files = source._files()

    def partitions(self):
        return [
            p
            for f in self.files
            for p in self.source_cls.plan_partitions(f, self.options)
        ]

    def read(self, partition: FilePartition) -> Iterator[pa.RecordBatch]:
        yield from read_partition_batches(
            self.source_cls, self.options, self.schema, partition
        )


class PushdownFormatReader(FormatReader):
    """FormatReader + Catalyst filter-pushdown-driven region derivation —
    returned by ``reader()`` ONLY when ``.option("derive_regions", "true")``
    is set (requires ``spark.sql.python.filterPushdown.enabled=true``;
    Spark rejects any reader defining pushFilters while that conf is off,
    so the method must not exist on the default reader).

    The derivation consumes NO filters: all are returned unsupported, so
    Spark re-evaluates the full predicate above the scan and pruning stays
    optimization-only. Per-read opt-in (not a session default) because
    Spark caches the planned scan (partitions + read function) at TABLE
    scope: after a filtered query plans with pruning, an UNfiltered query
    over the same ``load()`` DataFrame silently reuses the pruned
    partitions and loses rows (verified on Spark 4.1: full-count 58.3M ->
    97k after a sibling filtered count). Use one ``load()`` per predicate
    shape."""

    def pushFilters(self, filters):
        rf = getattr(self.source_cls, "REGION_FIELDS", None)
        if rf and not (
            self.options.get("regions") or self.options.get("region")
        ):
            region = derive_region_from_filters(list(filters), *rf)
            if region:
                self.options["regions"] = region
        return filters


class FormatStreamReader(DataSourceStreamReader):
    """Streaming face of every format source: the directory is an unbounded
    table and files appearing under it become micro-batches
    (`spark.readStream.format("fastq").load(dir)`). Offsets are the sorted
    set of files already processed — exactly-once at file granularity, the
    same contract as Spark's built-in FileStreamSource. Index-pruned /
    byte-range partition planning is reused verbatim, so one new 10 GB file
    still fans out across executors within its micro-batch."""

    def __init__(self, source: "FileFormatSource", schema: StructType):
        self.source = source
        self.source_cls = type(source)
        self.options = dict(source.options)
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": sorted(f.path for f in self.source._files())}

    def partitions(self, start: dict, end: dict):
        new = set(end.get("seen", ())) - set(start.get("seen", ()))
        parts = [
            p
            for f in self.source._files()
            if f.path in new
            for p in self.source_cls.plan_partitions(f, self.options)
        ]
        # Spark requires >= 1 partition per planned batch
        return parts or [FilePartition("", "none", (), extra=("__none__",))]

    def read(self, partition: FilePartition) -> Iterator[pa.RecordBatch]:
        if partition.extra and partition.extra[0] == "__none__":
            return
        yield from read_partition_batches(
            self.source_cls, self.options, self.schema, partition
        )

    def commit(self, end: dict) -> None:
        pass


class FileFormatSource(DataSource):
    """Subclasses set NAME, EXTENSIONS, BASE_SCHEMA (DDL string) and
    implement ``parse_records`` (or override ``plan_partitions`` /
    ``parse_partition`` for splittable / index-pruned scans)."""

    NAME = "override-me"
    EXTENSIONS: tuple[str, ...] = ()
    BASE_SCHEMA = "value string"
    # (chrom-like col, pos-like col) enabling region derivation from
    # Catalyst-pushed filters (FormatReader.pushFilters); None = no genome
    # coordinates in this format's schema
    REGION_FIELDS: tuple[str, str] | None = None

    @classmethod
    def name(cls) -> str:
        return cls.NAME

    def _files(self) -> list[FoundFile]:
        path = self.options.get("path")
        if not path:
            raise ValueError(f"{self.NAME}: .load(path) is required")
        exts = self.EXTENSIONS
        custom = self.options.get("file_extension")  # reference table option
        if custom:
            exts = (custom.lstrip("."),)
        return list_files(path, exts)

    def base_schema(self) -> str:
        """DDL string (no StructType here — schema() runs in a sessionless
        planning worker where DDL parsing is unavailable)."""
        return self.BASE_SCHEMA

    def schema(self) -> str:
        ddl = self.base_schema()
        for col in partition_columns(self._files()):
            ddl += f", {col} string"
        wanted = self.options.get("columns")
        if wanted:
            # projection option (reference honors FileScanConfig projection,
            # SURVEY.md §4.3): narrows the reader schema so Arrow conversion
            # and JVM transfer only touch the requested fields
            keep = {c.strip() for c in wanted.split(",") if c.strip()}
            fields = _split_ddl_fields(ddl)
            kept = [f for f in fields if f[0] in keep]
            if kept:
                ddl = ", ".join(f"{n} {t}" for n, t in kept)
        return ddl

    def reader(self, schema: StructType) -> FormatReader:
        if str(self.options.get("derive_regions", "")).lower() in ("true", "1"):
            return PushdownFormatReader(self, schema)
        return FormatReader(self, schema)

    def streamReader(self, schema: StructType) -> FormatStreamReader:
        return FormatStreamReader(self, schema)

    # ---- hooks ----

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        return [
            FilePartition(
                path=f.path,
                compression=detect_compression(f.path, options.get("compression")),
                partition_values=tuple(sorted(f.partition_values.items())),
            )
        ]

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        yield from cls.parse_records(partition.path, partition.compression, options)

    @classmethod
    def parse_records(
        cls, path: str, compression: str, options: dict
    ) -> Iterator[dict]:
        raise NotImplementedError
