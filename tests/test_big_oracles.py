"""The sf10-tractable alternative oracles (tools/check_correctness.py
BIG_ORACLES, r11) must be EXACTLY the plain SQL oracles — a different
algorithm for the same definition (union-find vs recursive closure for
q31; gram-sharded dup extraction vs the monolithic all-ngram index for
q37). Pinned at two SFs, no Spark involved."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import BIG_ORACLES, normalize  # noqa: E402

from exon_spark.queries import ALL_QUERIES, TABLES  # noqa: E402


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(BIG_ORACLES))
def test_big_oracles_match_sql_oracles(name, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create or replace view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    sql_df = con.execute(ALL_QUERIES[name].oracle).df()
    big_df = BIG_ORACLES[name](con, sf_dir)
    assert sorted(sql_df.columns) == sorted(big_df.columns)
    assert len(sql_df) == len(big_df)
    assert normalize(sql_df) == normalize(big_df)
