"""Genomic-region predicate functions.

Parity targets (reference: wheretrue/exon):

* ``region_match(chrom, pos, region)``   — udfs/vcf/mod.rs:39-131
* ``chrom_match(chrom, region)``         — udfs/vcf/mod.rs:141-156
* ``interval_match(pos, region)``        — udfs/vcf/mod.rs:221+
* ``vcf_region_filter(region, chrom[, pos])``     — udfs/vcf/vcf_region_filter.rs
* ``bam_region_filter(region, reference[, start, end])`` — udfs/sam/bam_region_filter.rs:29-67
* ``cram_region_filter`` / ``gff_region_filter`` / ``bigwig_region_filter`` /
  ``fasta_region_filter`` — same shape (udfs/sam/cram_region_filter.rs,
  udfs/gff/gff_region_filter.rs, udfs/bigwig_region_filter.rs;
  ``fasta_region_filter`` is checked by the reference's FASTA provider at
  datasources/fasta/table_provider.rs:334 but never registered — here it is a
  real function).

Region grammar (noodles ``Region::from_str``): ``name``, ``name:start`` (start
to end-of-sequence) or ``name:start-end``; coordinates 1-based inclusive.

All predicates are pure Column expressions. In our readers the same predicates
double as pushdown triggers: when the region argument is a *literal* string,
``exon_spark.plans.region_pruning`` extracts it at plan-build time and turns
it into index-driven byte-range pruning (the reference's flagship
optimization, SURVEY.md §4.1) — the Column predicate still runs as the
residual filter, so correctness never depends on pruning.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "parse_region",
    "region_match",
    "chrom_match",
    "interval_match",
    "vcf_region_filter",
    "bam_region_filter",
    "cram_region_filter",
    "gff_region_filter",
    "bigwig_region_filter",
    "fasta_region_filter",
]

_MAX_POS = 2**63 - 1

_REGION_RE = re.compile(r"^(?P<name>[^:]+)(?::(?P<start>\d+)(?:-(?P<end>\d+))?)?$")


def parse_region(region: str) -> tuple[str, int, int]:
    """Parse ``name[:start[-end]]`` → ``(name, start, end)``, 1-based
    inclusive; missing bounds become ``1`` / ``2**63-1`` (unbounded), matching
    noodles ``Region`` semantics used at udfs/vcf/mod.rs:86-90.
    """
    m = _REGION_RE.match(region)
    if not m:
        raise ValueError(f"invalid region: {region!r}")
    name = m.group("name")
    start = int(m.group("start")) if m.group("start") else 1
    end = int(m.group("end")) if m.group("end") else _MAX_POS
    return name, start, end


def expand_regions(regions: str) -> list[str]:
    """Split a comma-separated region option; any element that is a path to
    an existing file is replaced by its lines (one region per line) — the
    reference's region-file support in fasta_indexed_scan
    (datasources/fasta/udtfs/fasta_indexed_scan.rs:61-75)."""
    import os

    out: list[str] = []
    for r in (p.strip() for p in regions.split(",")):
        if not r:
            continue
        if ("/" in r or os.sep in r) and os.path.isfile(r):
            with open(r) as fh:
                out.extend(line.strip() for line in fh if line.strip())
        else:
            out.append(r)
    return out


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def region_match(chrom: Column | str, pos: Column | str, region: str) -> Column:
    """``chrom == name AND start <= pos <= end`` (udfs/vcf/mod.rs:107-121).
    1-based inclusive on both ends."""
    name, lo, hi = parse_region(region)
    return (_col(chrom) == name) & _col(pos).between(F.lit(lo), F.lit(hi))


def chrom_match(chrom: Column | str, region: str) -> Column:
    """Region-name equality only (udfs/vcf/mod.rs:141-156)."""
    name, _, _ = parse_region(region)
    return _col(chrom) == name


def interval_match(pos: Column | str, region: str) -> Column:
    """Interval containment only (udfs/vcf/mod.rs:221+)."""
    _, lo, hi = parse_region(region)
    return _col(pos).between(F.lit(lo), F.lit(hi))


def vcf_region_filter(
    region: str, chrom: Column | str, pos: Column | str | None = None
) -> Column:
    """VCF region predicate; with ``pos`` it is ``region_match``, without it
    ``chrom_match`` (udfs/vcf/vcf_region_filter.rs). Recognized for index
    pushdown by the VCF reader."""
    if pos is None:
        return chrom_match(chrom, region)
    return region_match(chrom, pos, region)


def _overlap_filter(
    region: str,
    reference: Column | str,
    start: Column | str | None,
    end: Column | str | None,
) -> Column:
    name, lo, hi = parse_region(region)
    pred = _col(reference) == name
    if start is not None:
        pred = pred & (_col(start) <= F.lit(hi))
    if end is not None:
        pred = pred & (_col(end) >= F.lit(lo))
    return pred


def bam_region_filter(
    region: str,
    reference: Column | str,
    start: Column | str | None = None,
    end: Column | str | None = None,
) -> Column:
    """Alignment-vs-region interval overlap: ``reference == name AND start <=
    region_end AND end >= region_start`` (udfs/sam/bam_region_filter.rs:29-67;
    1-based inclusive intervals)."""
    return _overlap_filter(region, reference, start, end)


def cram_region_filter(
    region: str,
    reference: Column | str,
    start: Column | str | None = None,
    end: Column | str | None = None,
) -> Column:
    """Same predicate as ``bam_region_filter`` (udfs/sam/cram_region_filter.rs)."""
    return _overlap_filter(region, reference, start, end)


def gff_region_filter(
    region: str,
    seqname: Column | str,
    start: Column | str | None = None,
    end: Column | str | None = None,
) -> Column:
    """Feature-vs-region overlap (udfs/gff/gff_region_filter.rs)."""
    return _overlap_filter(region, seqname, start, end)


def bigwig_region_filter(
    region: str,
    name: Column | str,
    start: Column | str | None = None,
    end: Column | str | None = None,
) -> Column:
    """Value-vs-region overlap (udfs/bigwig_region_filter.rs)."""
    return _overlap_filter(region, name, start, end)


def fasta_region_filter(
    region: str,
    id_col: Column | str,
) -> Column:
    """Sequence-name match for FASTA region scans (checked by the reference's
    FASTA provider, datasources/fasta/table_provider.rs:327-342, but never
    registered there — promoted to a real function here)."""
    name, _, _ = parse_region(region)
    return _col(id_col) == name
