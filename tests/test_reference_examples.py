"""The reference's shipped examples (exon-examples/examples/*.rs), run
verbatim through our SQL surface.

* mzml_querying.rs runs against its REAL data file (GNPS00002_A3_p.mzML)
  — see test_sources_longtail.test_reference_example_mzml_querying.
* gff_annotation_join.rs's data file (Ga0604745_crt.gff) is not in the
  checkout, but the example asserts its exact 10-row output — the fixture
  here reconstructs a GFF holding precisely those CRISPR/repeat_unit
  records (plus decoys that must NOT appear) and runs the example's SQL
  unchanged, pinning the join/containment/order/limit semantics to the
  reference's golden.
"""

import pytest


@pytest.fixture(scope="module")
def crispr_gff(tmp_path_factory):
    # golden repeats from gff_annotation_join.rs: CRISPR array 1-3473 on
    # Ga0604745_000026 containing repeat units at these coordinates
    repeats = [
        (1, 37), (73, 109), (147, 183), (219, 255), (291, 327),
        (365, 401), (437, 473), (510, 546), (582, 618), (654, 690),
        (726, 762),  # an 11th repeat: LIMIT 10 must cut it
    ]
    d = tmp_path_factory.mktemp("crispr")
    p = d / "Ga0604745_crt.gff"
    lines = ["##gff-version 3"]
    lines.append(
        "Ga0604745_000026\tCRT\tCRISPR\t1\t3473\t.\t.\t.\tID=crispr1"
    )
    for i, (s, e) in enumerate(repeats):
        lines.append(
            f"Ga0604745_000026\tCRT\trepeat_unit\t{s}\t{e}\t.\t.\t.\tParent=crispr1;ID=r{i}"
        )
    # decoys: a repeat on another contig, and one outside the array
    lines.append("Ga0604745_000099\tCRT\trepeat_unit\t5\t40\t.\t.\t.\tID=rx")
    lines.append(
        "Ga0604745_000026\tCRT\trepeat_unit\t4000\t4036\t.\t.\t.\tID=ry"
    )
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_reference_example_gff_annotation_join(spark, crispr_gff):
    from exon_spark import ExonSession

    x = ExonSession(spark)
    x.sql(
        "CREATE EXTERNAL TABLE IF NOT EXISTS crispr_gff STORED AS GFF "
        f"LOCATION '{crispr_gff}'"
    )
    df = x.sql(
        """SELECT crispr.seqname, crispr.start, crispr.end,
                  repeat.start AS r_start, repeat.end AS r_end
        FROM (SELECT * FROM crispr_gff WHERE type = 'CRISPR') AS crispr
            JOIN (SELECT * FROM crispr_gff WHERE type = 'repeat_unit') AS repeat
                ON crispr.seqname = repeat.seqname
                AND crispr.start <= repeat.start
                AND crispr.end >= repeat.end
        ORDER BY crispr.seqname, crispr.start, crispr.end, r_start, r_end
        LIMIT 10"""
    )
    rows = [(r.seqname, r.start, r.end, r.r_start, r.r_end) for r in df.collect()]
    golden = [
        ("Ga0604745_000026", 1, 3473, 1, 37),
        ("Ga0604745_000026", 1, 3473, 73, 109),
        ("Ga0604745_000026", 1, 3473, 147, 183),
        ("Ga0604745_000026", 1, 3473, 219, 255),
        ("Ga0604745_000026", 1, 3473, 291, 327),
        ("Ga0604745_000026", 1, 3473, 365, 401),
        ("Ga0604745_000026", 1, 3473, 437, 473),
        ("Ga0604745_000026", 1, 3473, 510, 546),
        ("Ga0604745_000026", 1, 3473, 582, 618),
        ("Ga0604745_000026", 1, 3473, 654, 690),
    ]
    assert rows == golden
