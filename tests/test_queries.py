"""Registry invariants for the driver's correctness gate.

The driver's CORRECTNESS artifact windows exactly the FIRST 50 entries of
``ALL_QUERIES`` in registry order (observed r5: the registry grew to 52 and
the two stateful streaming queries, then appended last, silently fell out
of the gate). These tests pin the two invariants that keep every operator
driver-verified: the registry never exceeds the window, and the streaming
specs — the hardest to re-verify by hand — sit inside it.
"""

from exon_spark.queries import ALL_QUERIES

DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    assert len(ALL_QUERIES) <= DRIVER_WINDOW, (
        f"{len(ALL_QUERIES)} queries > the driver's {DRIVER_WINDOW}-entry "
        "correctness window — merge related queries (see q23_text_profile) "
        "instead of letting entries silently fall out of the gate"
    )


def test_streaming_specs_inside_window():
    head = list(ALL_QUERIES)[:DRIVER_WINDOW]
    for name in (
        "q29_streaming_tumbling",
        "q33_streaming_dedup",
        "q39_streaming_interval_join",
    ):
        assert name in head, f"{name} outside the driver's gate window"


def test_every_query_has_oracle_or_is_streaming():
    for name, spec in ALL_QUERIES.items():
        assert spec.spark_fn is not None, name


def test_micro_sum_overflow_raises(spark):
    """_MICRO_SUM's 2^63-micro-unit headroom is enforced, not advisory:
    under the session's ANSI mode (the Spark 4 default; no session here
    overrides it) a group sum past the bound raises ARITHMETIC_OVERFLOW
    instead of silently wrapping to a wrong result."""
    import pytest

    from exon_spark.queries.base import SUM_D

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    # 3 terms of 4e12 currency units = 1.2e19 micro-units > 2^63-1
    spark.createDataFrame(
        [(4.0e12,), (4.0e12,), (4.0e12,)], "v double"
    ).createOrReplaceTempView("_overflow_probe")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        spark.sql(
            f"select {SUM_D('v', 'sum_v')} from _overflow_probe"
        ).collect()
    # and the in-bounds spelling still sums exactly
    got = spark.sql(
        "select "
        + SUM_D("v", "sum_v")
        + " from (select 1.25 as v union all select 2.5 as v)"
    ).collect()[0].sum_v
    assert got == 3.75
