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

Usage: python tools/gen_scale.py [out_dir] [replicas] [src_dir] [--adversarial]
  defaults: /tmp/sf1 10 /root/testdata/sf0.1

--adversarial (VERDICT r8 #1) plants three worst-case pathologies the
benign replicated fixture deliberately lacks, all seeded/deterministic:

  viral shingle   20% of documents get the same 3-token phrase appended
                  -> ONE shingle with df ~ N/5 (10^4 at sf1).  Uncapped
                  inverted-index joins must blow up on it (df^2 candidate
                  pairs); the df-cap must drop it with recall intact
                  (viral-only pairs share 3 shingles out of hundreds, far
                  below any Jaccard threshold, so they are pure wasted
                  candidates - the cap removes work, not results).
  hot key         20% of events rows are reassigned to ONE user_id ->
                  a single hex carries ~200k rows at sf1 for every
                  window/session/interval lane partitioned by hex.
  clustered vecs  embeddings become a 32-center Gaussian-mixture manifold
                  (not isotropic noise) with planted near-dup pairs at
                  exact cosines {0.99, 0.95, 0.9, 0.8}: pair (i, i+1) for
                  every vec_id i ≡ 0 (mod 50), target cos by (i//50) % 4;
                  label = cluster id.  Ground truth is re-derivable from
                  the same arithmetic - no sidecar file needed.
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


VIRAL_PHRASE = " zx0virality zx0spread zx0cascade"
VIRAL_MOD = 5  # doc_id % 5 == 0 -> 20% of docs carry the viral shingle
HOT_EVENT_MOD = 5  # event_id % 5 == 0 -> 20% of rows onto one user
CLUSTERS = 32
CLUSTER_SIGMA = 0.25
PLANT_MOD = 50  # vec_id % 50 == 0 -> (i, i+1) is a planted near-dup pair
PLANT_COSINES = (0.99, 0.95, 0.9, 0.8)  # target by (vec_id // 50) % 4


def planted_pairs(n_vecs: int) -> list[tuple[int, int, float]]:
    """Ground-truth (src, dst, target_cos) triples for an adversarial
    embeddings table of n_vecs rows — pure arithmetic, shared by the
    generator and the recall tools so there is no sidecar to drift."""
    return [
        (i, i + 1, PLANT_COSINES[(i // PLANT_MOD) % len(PLANT_COSINES)])
        for i in range(0, n_vecs - 1, PLANT_MOD)
    ]


def _adversarial(full: pa.Table, name: str) -> pa.Table:
    if name == "documents":
        texts = full.column("text").to_pylist()
        ids = full.column("doc_id").to_numpy()
        n_viral = 0
        for j in range(len(texts)):
            if ids[j] % VIRAL_MOD == 0:
                texts[j] = texts[j] + VIRAL_PHRASE
                n_viral += 1
        print(f"  adversarial: viral shingle planted in {n_viral} docs")
        cols = {f.name: full.column(f.name) for f in full.schema}
        cols["text"] = pa.chunked_array([pa.array(texts, type=pa.string())])
        cols["n_chars"] = pa.chunked_array(
            [pa.array([len(t) for t in texts],
                      type=full.schema.field("n_chars").type)]
        )
        return pa.table(cols, schema=full.schema)
    if name == "events":
        uid = full.column("user_id").to_numpy().copy()
        eid = full.column("event_id").to_numpy()
        hot_id = int(uid.min())
        mask = eid % HOT_EVENT_MOD == 0
        uid[mask] = hot_id
        print(f"  adversarial: hot user_id={hot_id} now carries "
              f"{int(mask.sum())}/{len(uid)} rows")
        cols = {f.name: full.column(f.name) for f in full.schema}
        cols["user_id"] = pa.chunked_array([pa.array(uid, type=pa.int64())])
        return pa.table(cols, schema=full.schema)
    if name == "embeddings":
        n = full.num_rows
        dim = len(full.column("embedding")[0])
        rng = np.random.default_rng(SEED)
        centers = rng.standard_normal((CLUSTERS, dim)).astype(np.float64)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        ids = full.column("vec_id").to_numpy()
        cl = (ids % CLUSTERS).astype(np.int32)
        mat = centers[cl] + CLUSTER_SIGMA * rng.standard_normal((n, dim))
        # planted near-dups at EXACT cosines: dst = cos*u + sin*w with w a
        # unit vector orthogonal to u (Gram-Schmidt on seeded noise)
        order = np.argsort(ids)
        pos = {int(ids[j]): j for j in order}
        for src, dst, cos_t in planted_pairs(int(ids.max()) + 1):
            if src not in pos or dst not in pos:
                continue
            u = mat[pos[src]]
            u = u / np.linalg.norm(u)
            r = rng.standard_normal(dim)
            w = r - (r @ u) * u
            w /= np.linalg.norm(w)
            scale = np.linalg.norm(mat[pos[dst]])
            mat[pos[dst]] = scale * (cos_t * u + np.sqrt(1.0 - cos_t**2) * w)
        print(f"  adversarial: {CLUSTERS}-center manifold, "
              f"{len(planted_pairs(int(ids.max()) + 1))} planted pairs")
        cols = {f.name: full.column(f.name) for f in full.schema}
        cols["embedding"] = pa.chunked_array(
            [pa.array(list(mat.astype(np.float32)),
                      type=full.schema.field("embedding").type)]
        )
        cols["label"] = pa.chunked_array([pa.array(cl, type=pa.int32())])
        return pa.table(cols, schema=full.schema)
    return full


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--adversarial"]
    adversarial = "--adversarial" in sys.argv[1:]
    out_dir = Path(argv[0]) if len(argv) > 0 else Path("/tmp/sf1")
    replicas = int(argv[1]) if len(argv) > 1 else 10
    src = Path(argv[2]) if len(argv) > 2 else Path("/root/testdata/sf0.1")
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
        if adversarial:
            full = _adversarial(full.combine_chunks(), name)
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
