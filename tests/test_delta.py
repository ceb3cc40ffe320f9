"""Delta Lake log-replay reader (sources/delta.py; reference
exon_context_ext.rs:181-185, delta.slt). Tables are synthesized by writing
the public PROTOCOL.md actions directly — no delta-spark needed."""

from __future__ import annotations

import json
import os
import uuid

import pytest


def _write_commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(partition_cols=()):
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True, "metadata": {}},
        ]
        + [
            {"name": c, "type": "string", "nullable": True, "metadata": {}}
            for c in partition_cols
        ],
    }
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _add(path):
    return {
        "add": {
            "path": path,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


@pytest.fixture()
def delta_dir(spark, tmp_path):
    """Two commits: v0 adds f1+f2, v1 removes f2 and adds f3 — the active
    set must be exactly {f1, f3}."""
    root = tmp_path / "dt"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    for name, ids in (("f1.parquet", [1, 2]), ("f2.parquet", [3]), ("f3.parquet", [4])):
        spark.createDataFrame(
            [(i, f"v{i}") for i in ids], "id long, val string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage" / name))
        part = [
            f
            for f in os.listdir(tmp_path / "stage" / name)
            if f.endswith(".parquet")
        ][0]
        os.replace(tmp_path / "stage" / name / part, root / name)
    _write_commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            _add("f1.parquet"),
            _add("f2.parquet"),
        ],
    )
    _write_commit(
        log,
        1,
        [
            {"remove": {"path": "f2.parquet", "deletionTimestamp": 1, "dataChange": True}},
            _add("f3.parquet"),
        ],
    )
    return str(root)


def test_replay_add_remove(spark, delta_dir):
    from exon_spark.sources.delta import read_delta

    df = read_delta(spark, delta_dir)
    assert sorted((r.id, r.val) for r in df.collect()) == [
        (1, "v1"),
        (2, "v2"),
        (4, "v4"),
    ]


def test_replay_respects_checkpoint(spark, delta_dir, tmp_path):
    """A checkpoint supersedes earlier JSON commits: fake one at v1 whose
    add-set is only f3, plus a v2 commit adding f1 back — replay must not
    re-apply v0/v1 json."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = os.path.join(delta_dir, "_delta_log")
    add_struct = [
        {
            "add": {"path": "f3.parquet", "size": 1},
            "remove": None,
            "protocol": {"minReaderVersion": 1},
            "metaData": None,
        }
    ]
    pq.write_table(
        pa.Table.from_pylist(add_struct),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 1}, fh)
    _write_commit(log, 2, [_add("f1.parquet")])

    from exon_spark.sources.delta import read_delta

    df = read_delta(spark, delta_dir)
    assert sorted((r.id, r.val) for r in df.collect()) == [
        (1, "v1"),
        (2, "v2"),
        (4, "v4"),
    ]


def test_unsupported_protocol_raises(spark, tmp_path):
    from exon_spark.sources.delta import DeltaProtocolError, read_delta

    root = tmp_path / "dt2"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _write_commit(
        log,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                }
            },
            _meta(),
        ],
    )
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, str(root))


def test_empty_table_schema(spark, tmp_path):
    from exon_spark.sources.delta import read_delta

    root = tmp_path / "dt3"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _write_commit(log, 0, [_meta()])
    df = read_delta(spark, str(root))
    assert df.count() == 0
    assert df.columns == ["id", "val"]
