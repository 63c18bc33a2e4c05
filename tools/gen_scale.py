#!/usr/bin/env python3
"""Deterministic sf-multiplier fixture generator (VERDICT r6 #3).

Builds an sf1-equivalent dataset from /root/testdata/sf0.1 by replicating
each scaling table R times with disjoint key spaces, so referential
integrity holds (orders.o_custkey references the shifted customer keys,
lineitem references shifted orders/part/supplier) and per-key workload
shape is preserved (10x the planes / users / docs, same per-key depth —
the same axis the TPC-H generator scales on).

Two transforms keep the WORKLOAD shape honest instead of quadratic:

- documents.text (replica r>0): every whitespace token gets a ``~r``
  suffix.  Within-replica duplicate/near-dup structure is preserved
  exactly (same transform on same text), while cross-replica shingle
  overlap drops to zero — so near-dup candidate pairs scale linearly
  with sf, like a real corpus, instead of every doc becoming a 10-way
  cross-replica duplicate (pairs would grow ~R^2 and the scaling
  exponents would measure the generator, not the engine).  n_chars is
  recomputed to stay == length(text).
- embeddings.embedding (replica r>0): a seeded signed coordinate
  permutation (an exact isometry — within-replica angles are preserved
  bit-for-bit on the permuted order) decorrelates replicas so ANN/near-dup
  neighborhoods scale linearly too.

region/nation are dimension tables (fixed 5/25 rows at every TPC-H sf) —
copied verbatim.  Everything is pyarrow-level, seed-fixed, engine-neutral:
Spark and DuckDB read the same files; parquet timestamp physical type is
preserved (TIMESTAMP(NANOS) fixtures stay NANOS).

Usage: python tools/gen_scale.py [out_dir] [replicas] [src_dir]
  defaults: /tmp/sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42

# table -> {column: stride table}  (a column shifts by replica * stride of
# the table that OWNS the key, so references stay aligned)
KEY_OWNER = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_TABLES = ("region", "nation")


def _strides(src: Path) -> dict[str, int]:
    """stride = max(owning key) + 1, per key-owning table."""
    owners = {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events": ("events", "event_id"),
        "events_user": ("events", "user_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }
    out = {}
    for owner, (table, col) in owners.items():
        t = pq.read_table(src / f"{table}.parquet", columns=[col])
        out[owner] = int(pc.max(t.column(0)).as_py()) + 1
    return out


def _suffix_words(text: str, tag: str) -> str:
    return re.sub(r"\S+", lambda m: m.group(0) + tag, text)


def _replica(table: pa.Table, name: str, r: int, strides: dict[str, int]) -> pa.Table:
    if r == 0:
        return table
    cols = {}
    for i, field in enumerate(table.schema):
        col = table.column(i)
        owner = KEY_OWNER.get(name, {}).get(field.name)
        if owner is not None:
            # add_checked: a silent wraparound on a narrow int key column
            # would corrupt referential integrity — fail loudly instead
            col = pc.add_checked(col, pa.scalar(r * strides[owner], type=field.type))
        cols[field.name] = col
    if name == "documents":
        tag = f"~{r}"
        texts = [_suffix_words(t, tag) for t in cols["text"].to_pylist()]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) for t in texts], type=table.schema.field("n_chars").type
        )
    if name == "embeddings":
        rng = np.random.default_rng(SEED + r)
        dim = len(table.column("embedding")[0])
        perm = rng.permutation(dim)
        signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        mat = np.asarray(
            table.column("embedding").combine_chunks().to_numpy(zero_copy_only=False).tolist(),
            dtype=np.float32,
        )
        mat = mat[:, perm] * signs[None, :]
        cols["embedding"] = pa.array(
            list(mat), type=table.schema.field("embedding").type
        )
    arrays, fields = [], []
    for field in table.schema:
        c = cols[field.name]
        if not isinstance(c, pa.ChunkedArray):
            c = pa.chunked_array([c])
        arrays.append(c.cast(field.type))
        fields.append(field)
    return pa.table(dict(zip([f.name for f in fields], arrays)), schema=table.schema)


def main() -> int:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("/root/testdata/sf0.1")
    out_dir.mkdir(parents=True, exist_ok=True)
    strides = _strides(src)
    print(f"strides: {strides}")
    for name in COPY_TABLES:
        t = pq.read_table(src / f"{name}.parquet")
        pq.write_table(t, out_dir / f"{name}.parquet", store_schema=True)
        print(f"{name}: copied {t.num_rows} rows")
    for name in KEY_OWNER:
        t = pq.read_table(src / f"{name}.parquet")
        parts = [_replica(t, name, r, strides) for r in range(replicas)]
        full = pa.concat_tables(parts)
        pq.write_table(
            full,
            out_dir / f"{name}.parquet",
            row_group_size=1 << 19,
            store_schema=True,
        )
        print(f"{name}: {t.num_rows} -> {full.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
