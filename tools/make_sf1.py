#!/usr/bin/env python
"""Synthesize an sf1 scaling point (~10× sf0.1) into data/sf1/.

Round-5 verdict ask #8: extend the scaling curve one decade to catch
low-cardinality-window cliffs empirically.  The driver only ships
sf{0.001,0.01,0.1}, so sf1 is derived from sf0.1 by 10-fold
replication with CONSISTENT key offsets — every replica shifts each
table's surrogate keys (and the foreign keys that reference them) by
``replica * (max_key + 1)``, so referential integrity, join fan-outs,
key skew shape, and per-key group sizes all match a genuinely larger
draw of the same generator:

- region/nation: fixed dimensions, copied once (as in TPC-H, where
  they are scale-factor-invariant).
- customer/supplier/part/orders/lineitem: PK+FK offsets per replica;
  value columns untouched, so aggregates scale linearly and
  distinct-value domains (prices, dates, flags) stay fixed — exactly
  the property the re-grained window plans rely on.
- events: event_id/user_id offsets; timestamps untouched (10× events
  per hour bucket — the streaming/sessionize stress case).
- documents: doc_id offset; replicas >0 get their token sequence
  deterministically SHUFFLED (hash-of-(doc,position,replica) sort
  order) plus a ``" repN"`` suffix.  A plain copy would make every
  doc a 10-way near-duplicate (jaccard ≈1 shingle sets) —
  quadratically inflating MinHash/SimHash/n-gram candidate pairs far
  beyond what a genuinely larger draw of the word-sampling generator
  produces — and mere token ROTATION is not enough (it preserves all
  adjacencies but the seam, measured jaccard ≈0.9).  Shuffling
  preserves each doc's unigram vocabulary, length, and language (so
  vocab-overlap / lang-mix / quality distributions scale faithfully)
  while rebuilding its k-gram shingles from scratch — which matches
  the base generator, whose docs are near-random word sequences.
  n_chars is recomputed from the rewritten text.
- embeddings: vec_id offset; replicas >0 get their DIMENSIONS
  cyclically rotated by the replica index.  Identical copies would
  make every vector a 10-way exact near-dup (cosine 1) — the same
  quadratic artifact.  Rotation preserves norms and within-replica
  geometry (each label cluster maps to an equally tight rotated
  cluster) while decorrelating across replicas.
- part names are deliberately NOT perturbed: TPC-H p_name draws short
  strings from a tiny word pool, so a larger genuine draw has the
  same name-collision density — the quadratic pair growth in
  edit-distance blocking is intrinsic to that query, not an artifact.

DuckDB does the rewrite (UNION ALL of offset SELECTs → one parquet
file per table, matching the driver's single-file layout).

Usage: python tools/make_sf1.py [out_dir] [src_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

DIM_COPY = ("region", "nation")

#: table -> (pk/fk columns offset by that table's own key domain)
#: every offset col maps to the OWNING table whose max key defines it.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
}

#: owning table -> the column whose max defines its key domain
DOMAIN_COL = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
    "documents": "doc_id",
}


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    spans = {
        t: con.execute(
            f"SELECT MAX({c}) + 1 FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
        for t, c in DOMAIN_COL.items()
    }

    for t in DIM_COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, fks in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(replicas):
            proj = ", ".join(
                f"{c} + {i * spans[fks[c]]} AS {c}" if c in fks else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    # documents: offset + deterministic per-replica token shuffle (see
    # module docstring) keeps the near/exact-dup rate of the base
    # corpus instead of making every doc a 10-way near-dup cluster.
    selects = [f"SELECT * FROM '{src}/documents.parquet'"]
    for i in range(1, replicas):
        selects.append(
            f"""
            SELECT d.doc_id + {i * spans['documents']} AS doc_id,
                   s.text || ' rep{i}' AS text,
                   d.lang, d.source,
                   CAST(LENGTH(s.text) + {len(f' rep{i}')} AS BIGINT) AS n_chars
            FROM '{src}/documents.parquet' d
            JOIN (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY
                           hash(doc_id * 1000003 + pos * 31 + {i}), pos) AS text
                FROM (
                    SELECT doc_id,
                           unnest(string_split(text, ' ')) AS tok,
                           unnest(range(len(string_split(text, ' ')))) AS pos
                    FROM '{src}/documents.parquet'
                )
                GROUP BY doc_id
            ) s USING (doc_id)
            """
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO "
        f"'{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM '{out_dir}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {n} rows")

    # embeddings: offset + dimension rotation decorrelates replicas
    # while preserving norms and within-replica cluster geometry.
    selects = [f"SELECT * FROM '{src}/embeddings.parquet'"]
    for i in range(1, replicas):
        rot = (
            f"CAST(list_concat(embedding[{i} % len(embedding) + 1:], "
            f"embedding[1:{i} % len(embedding)]) AS FLOAT[])"
        )
        selects.append(
            f"SELECT vec_id + {i * spans['embeddings']} AS vec_id, "
            f"{rot} AS embedding, label "
            f"FROM '{src}/embeddings.parquet'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO "
        f"'{out_dir}/embeddings.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM '{out_dir}/embeddings.parquet'"
    ).fetchone()[0]
    print(f"embeddings: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
