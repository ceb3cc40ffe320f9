"""Deterministic NxSF replica generator for the scale-proof runs.

Builds an N-times-larger copy of a driver testdata directory (default:
sf0.1 x10 -> a local sf1) that preserves the semantic structure the
operators are sensitive to, instead of naively duplicating rows:

* **Relational keys shift per replica** (shift = next power of ten above
  the source key's max, shared across referencing tables), so
  referential integrity holds and keys stay unique: lineitem follows
  orders/part/supplier, orders follows customer, events.user_id gets
  its own id space per replica.
* **region/nation stay fixed** — dimension tables a 10x business does
  not grow.
* **documents replicas are token-suffixed** (`tok` -> `tok~k`, k>=1):
  within a replica every planted dup/near-dup/boilerplate relationship
  of the source survives EXACTLY (same token count, same line
  structure), while cross-replica shingle Jaccard is ZERO — so the
  corpus dup RATE stays constant at 10x instead of every doc acquiring
  9 exact twins (which would grow pairwise-op outputs quadratically and
  poison the superlinearity read). Vocabulary grows ~10x — a worst-case
  stress for the LM-ladder model tables on purpose. n_chars is
  recomputed (source convention: n_chars == len(text), verified).
* **embeddings replicas go through a per-replica orthogonal transform**
  (cyclic coordinate shift + deterministic sign flips): within a
  replica every cosine — planted near-dups included — is EXACTLY the
  source value (orthogonal maps preserve inner products, and the
  float32 payload is only permuted/negated, so not even fp drift),
  while cross-replica cosines decorrelate to ~N(0, 1/64) (max |cos|
  over all cross pairs measured < 0.8, far from the 0.95 dup
  threshold). A naive epsilon perturbation instead makes every replica
  a ~0.9999-cosine twin of its source — an artificial 100% near-dup
  rate that grew q28's output 2380x instead of 10x (measured).
  Unit norms survive untouched, so dot-product and true cosine stay
  interchangeable in both engines.
* **timestamps are left alone** — 10x orders/events in the same date
  range models a denser business, and keeps every window/sessionize
  parameter meaningful.

Single parquet file per table (the `{dir}/{table}.parquet` path
contract check_correctness.py and bench.py share), but written with
bounded row groups (ROW_GROUP_ROWS) so Spark can actually split the
scan — the driver's own testdata is single-row-group, which caps scan
parallelism at 1 task per table regardless of size (SCALE.md).

Usage: python tools/make_sf_replica.py [--base /root/testdata/sf0.1]
          [--out /root/repo/.testdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP_ROWS = 262_144
# row/doc tables with big per-row payloads get proportionally smaller
# row groups so the file splits at least ~cores ways: a single-row-group
# file byte-splits into PHANTOM partitions (every row in one task) and
# defeats partition-count heuristics downstream (measured: q23 ran its
# whole fan-out on one core at the first sf1 cut, 43x instead of ~4x)
MIN_ROW_GROUPS = 32
_TOKEN = re.compile(r"(\S+)")


def _shift_base(series: pd.Series) -> int:
    m = int(series.max())
    s = 10
    while s <= m:
        s *= 10
    return s


def _write(out_dir: Path, name: str, frames: list[pd.DataFrame], schema: pa.Schema) -> None:
    df = pd.concat(frames, ignore_index=True)
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    rg = max(1024, min(ROW_GROUP_ROWS, len(df) // MIN_ROW_GROUPS))
    table = table.combine_chunks()  # concat chunk bounds must not cap row groups
    pq.write_table(table, out_dir / f"{name}.parquet", row_group_size=rg)
    print(f"  {name}: {len(df):,} rows, rg={rg}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.testdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    base, out, n = Path(args.base), Path(args.out), args.factor
    out.mkdir(parents=True, exist_ok=True)

    def load(name: str) -> tuple[pd.DataFrame, pa.Schema]:
        t = pq.read_table(base / f"{name}.parquet")
        return t.to_pandas(), t.schema

    # fixed dims: straight copy
    for name in ("region", "nation"):
        df, schema = load(name)
        _write(out, name, [df], schema)

    customer, c_schema = load("customer")
    supplier, s_schema = load("supplier")
    part, p_schema = load("part")
    orders, o_schema = load("orders")
    lineitem, l_schema = load("lineitem")
    CS, SS, PS, OS = (
        _shift_base(customer.c_custkey),
        _shift_base(supplier.s_suppkey),
        _shift_base(part.p_partkey),
        _shift_base(orders.o_orderkey),
    )

    def replicas(df, fn):
        return [df] + [fn(df.copy(), k) for k in range(1, n)]

    _write(out, "customer", replicas(customer, lambda d, k: d.assign(
        c_custkey=d.c_custkey + k * CS)), c_schema)
    _write(out, "supplier", replicas(supplier, lambda d, k: d.assign(
        s_suppkey=d.s_suppkey + k * SS)), s_schema)
    _write(out, "part", replicas(part, lambda d, k: d.assign(
        p_partkey=d.p_partkey + k * PS)), p_schema)
    _write(out, "orders", replicas(orders, lambda d, k: d.assign(
        o_orderkey=d.o_orderkey + k * OS, o_custkey=d.o_custkey + k * CS)), o_schema)
    _write(out, "lineitem", replicas(lineitem, lambda d, k: d.assign(
        l_orderkey=d.l_orderkey + k * OS,
        l_partkey=d.l_partkey + k * PS,
        l_suppkey=d.l_suppkey + k * SS)), l_schema)
    del customer, supplier, part, orders, lineitem

    events, e_schema = load("events")
    ES, US = _shift_base(events.event_id), _shift_base(events.user_id)
    _write(out, "events", replicas(events, lambda d, k: d.assign(
        event_id=d.event_id + k * ES, user_id=d.user_id + k * US)), e_schema)
    del events

    documents, d_schema = load("documents")
    DS = _shift_base(documents.doc_id)

    def doc_rep(d, k):
        text = d.text.str.replace(_TOKEN, rf"\1~{k}", regex=True)
        return d.assign(doc_id=d.doc_id + k * DS, text=text,
                        n_chars=text.str.len().astype("int64"))

    _write(out, "documents", replicas(documents, doc_rep), d_schema)
    del documents

    emb, v_schema = load("embeddings")
    VS = _shift_base(emb.vec_id)
    vecs = np.stack(emb.embedding.values).astype(np.float32)
    dim = vecs.shape[1]

    def emb_rep(d, k):
        # orthogonal transform: cyclic shift by a replica-specific
        # offset (23 is coprime with 64, so k=1..9 get distinct
        # shifts), then deterministic per-(replica, coordinate) sign
        # flips — inner products within the replica are exactly
        # preserved, cross-replica directions decorrelate
        shift = (k * 23) % dim
        signs = 1.0 - 2.0 * (((np.arange(dim) * 2654435761 + k * 40503) >> 3) & 1)
        v32 = (np.roll(vecs, shift, axis=1) * signs[None, :]).astype(np.float32)
        return d.assign(vec_id=d.vec_id + k * VS,
                        embedding=[row for row in v32])

    _write(out, "embeddings", replicas(emb, emb_rep), v_schema)
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
