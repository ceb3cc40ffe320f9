"""SAM-flag bit-test predicates.

Parity target: the 13 predicates registered at
``exon/exon-core/src/udfs/sam/samflags.rs:112-134`` (reference:
wheretrue/exon). Note the reference maps BOTH ``is_properly_aligned`` and
``is_properly_segmented`` to the PROPERLY_SEGMENTED bit (0x2) — we preserve
that. Pure Column expressions: ``(flag & mask) != 0``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# SAM spec flag masks (htslib Flags; samflags.rs uses noodles Flags).
SAM_FLAG_MASKS: dict[str, int] = {
    "is_segmented": 0x1,
    "is_properly_aligned": 0x2,  # reference aliases this to PROPERLY_SEGMENTED
    "is_properly_segmented": 0x2,
    "is_unmapped": 0x4,
    "is_mate_unmapped": 0x8,
    "is_reverse_complemented": 0x10,
    "is_mate_reverse_complemented": 0x20,
    "is_first_segment": 0x40,
    "is_last_segment": 0x80,
    "is_secondary": 0x100,
    "is_qc_fail": 0x200,
    "is_duplicate": 0x400,
    "is_supplementary": 0x800,
}

__all__ = ["SAM_FLAG_MASKS", "sam_flag_test", *SAM_FLAG_MASKS.keys()]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sam_flag_test(flag: Column | str, mask: int) -> Column:
    """``(flag & mask) != 0`` as a Boolean Column."""
    return _col(flag).bitwiseAND(F.lit(mask)) != 0


def _make(name: str, mask: int):
    def fn(flag: Column | str) -> Column:
        return sam_flag_test(flag, mask)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__doc__ = (
        f"SAM flag predicate ``(flag & 0x{mask:x}) != 0`` "
        f"(samflags.rs:112-134)."
    )
    return fn


_g = globals()
for _name, _mask in SAM_FLAG_MASKS.items():
    _g[_name] = _make(_name, _mask)
del _g, _name, _mask
