#!/usr/bin/env python
"""Generate a larger scale factor locally by key-shifted replication of
an existing driver-generated SF directory (TESTDATA.md shape).

The driver ships sf0.001/0.01/0.1 read-only; every 100 TB claim in the
repo otherwise rests on sf0.1 plan shapes. This tool builds sf1 (or any
--factor multiple) so the heavy tier can be measured one decade up and
a scaling exponent recorded in BASELINE.md (VERDICT r5 #3).

Replication preserves referential integrity and — deliberately — the
per-copy internal structure of every table:

* fact/dim keys shift by ``copy * 10**digits(max_key)`` so joins stay
  valid and key-ranges of distinct copies never collide;
* ``documents.text`` gets a per-copy Caesar rotation of the letters:
  every shingle changes (copies are NOT near-dups of each other) while
  the intra-copy dedup structure is byte-for-byte preserved, so the
  true near-dup pair count scales exactly linearly with the factor —
  the property a scaling study needs. Appending marker tokens instead
  would make every copy a near-dup of the original and inflate pair
  counts quadratically (an adversarial corpus, not a scaled one);
* ``embeddings.embedding`` rotates each vector by ``copy`` positions:
  norms and intra-copy geometry are preserved, cross-copy vectors are
  decorrelated;
* ``events.ts`` is left unchanged: 10x the factor means 10x the events
  per window/session, which is exactly how ingest density scales.

Output is plain parquet, one file per table, 128k-row row groups so a
local[32] scan still parallelizes.

Usage:
    python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--dst .scale/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def _cap(col: pa.ChunkedArray) -> int:
    """Smallest power of ten above the column's max (key-shift stride)."""
    return 10 ** len(str(pc.max(col).as_py()))


def _shift(table: pa.Table, name: str, offset: int) -> pa.Table:
    idx = table.schema.get_field_index(name)
    col = table.column(name)
    shifted = pc.add(col, pa.scalar(offset, type=col.type))
    return table.set_column(idx, table.schema.field(idx), shifted)


def _caesar_table(shift: int) -> dict[int, int]:
    table = {}
    for alphabet in (LOWER, UPPER):
        for i, ch in enumerate(alphabet):
            table[ord(ch)] = ord(alphabet[(i + shift) % 26])
    return table


def _rotate_text(table: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return table
    trans = _caesar_table((copy * 7) % 26)
    idx = table.schema.get_field_index("text")
    rotated = pa.array(
        [t.translate(trans) if t is not None else None
         for t in table.column("text").to_pylist()],
        type=pa.string(),
    )
    return table.set_column(idx, table.schema.field(idx), rotated)


def _rotate_vectors(table: pa.Table, copy: int) -> pa.Table:
    if copy == 0:
        return table
    idx = table.schema.get_field_index("embedding")
    field = table.schema.field(idx)
    rotated = pa.array(
        [v[copy % len(v):] + v[:copy % len(v)] if v else v
         for v in table.column("embedding").to_pylist()],
        type=field.type,
    )
    return table.set_column(idx, field, rotated)


# table -> {column: cap-source (table, column) whose max defines the stride}
KEY_SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    src_tables = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in list(KEY_SHIFTS) + list(COPY_AS_IS)
    }
    caps = {
        (t, c): _cap(src_tables[t].column(c))
        for shifts in KEY_SHIFTS.values()
        for (t, c) in shifts.values()
    }

    for name in COPY_AS_IS:
        pq.write_table(src_tables[name], os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: copied as-is ({src_tables[name].num_rows} rows)")

    for name, shifts in KEY_SHIFTS.items():
        base = src_tables[name]
        copies = []
        for i in range(args.factor):
            t = base
            for col, cap_key in shifts.items():
                t = _shift(t, col, i * caps[cap_key])
            if name == "documents":
                t = _rotate_text(t, i)
            if name == "embeddings":
                t = _rotate_vectors(t, i)
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(
            out,
            os.path.join(args.dst, f"{name}.parquet"),
            row_group_size=131072,
        )
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
