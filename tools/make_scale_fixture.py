#!/usr/bin/env python3
"""Deterministic 10× scale-up of the sf0.1 fixtures (→ "sf1-synth")
for the heavy-family weak-scaling check (tools/bench_scale.py).

The driver ships fixtures only up to sf0.1; the 100 TB design claims
are argued from plans. This builds a 10× corpus whose SIMILARITY
STRUCTURE matches sf0.1 — i.e. a true weak-scaling input, not a
duplicate-blowup — so measured scaling reflects data volume, not an
artificially densified dup graph:

- documents: 10 copies; copy i > 0 suffixes every whitespace word
  with ``~i``, so shingles/fingerprints NEVER collide across copies
  (each copy is a disjoint replica of sf0.1's near-dup graph; with
  verbatim copies every doc would gain 9 exact dups and the pair
  count would grow 100×, which measures densification, not scale).
- embeddings: 10 copies; copy i applies a copy-specific SIGN-FLIP
  pattern per dimension — an orthogonal map, so all intra-copy
  cosines are bit-preserved while cross-copy similarity is
  decorrelated (verbatim copies would put 10 identical vectors in
  every LSH bucket: again densification, not scale).
- events: 10 copies; event_id/user_id offset per copy (per-key
  streaming state volume stays constant — 10× keys, not 10× state
  per key), timestamps unchanged.

Round-12 fixes (r11 verdict #7):

- ID_STRIDE 10,000,000 → 25,000,000. The old stride COLLIDED with
  q277's planted-clone offset (clones live at partkey + 1e7): copy
  1's real ids landed exactly on copy 0's clone ids, the distinct
  union merged them, and q277 emitted 0 rows at 10×. 25M clears the
  +1e7 clone band for every copy (real ids sit < copy_offset + ~1M).
- Each table is a DIRECTORY of one parquet file PER COPY
  (``table.parquet/copy00.parquet`` …) with a bounded row-group
  size, instead of one single-row-group file. A single file under
  ``spark.sql.files.maxPartitionBytes`` scans as ONE task at any
  core count, so the old fixture could not demonstrate scan
  parallelism at all (every pre-exchange stage was serial by
  fixture, not by plan). Spark reads the directory transparently;
  nothing at 10× reads via DuckDB.

Usage: python tools/make_scale_fixture.py [out_dir] [n_copies]
Defaults: /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
ID_STRIDE = 25_000_000
ROW_GROUP_SIZE = 65_536


def build(out_dir: str, n_copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def copy_into(table: str, select_sql: str, i: int) -> None:
        d = os.path.join(out_dir, f"{table}.parquet")
        if i == 0:
            shutil.rmtree(d, ignore_errors=True)
            # a stale single-FILE fixture blocks the mkdir
            if os.path.isfile(d):
                os.remove(d)
            os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY ({select_sql}) TO '{d}/copy{i:02d}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})"
        )

    def word_suffix(i: int) -> str:
        # suffix every whitespace word with ~i (copy 0 stays verbatim)
        pat = "'(" + chr(92) + "S+)'"
        rep = "'" + chr(92) + f"1~{i}'"
        return f"regexp_replace(text, {pat}, {rep}, 'g')"

    for i in range(n_copies):
        copy_into(
            "documents",
            f"""
SELECT doc_id + {i * ID_STRIDE} AS doc_id,
  {"text" if i == 0 else word_suffix(i)} AS text,
  lang, source,
  {"n_chars" if i == 0 else f"length({word_suffix(i)})"} AS n_chars
FROM read_parquet('{SRC}/documents.parquet')""",
            i,
        )

    for i in range(n_copies):
        if i == 0:
            emb = f"""
SELECT vec_id + {i * ID_STRIDE} AS vec_id, embedding, label
FROM read_parquet('{SRC}/embeddings.parquet')"""
        else:
            emb = f"""
SELECT vec_id + {i * ID_STRIDE} AS vec_id,
  [CASE WHEN (j * 2654435761 + {i} * 40503) % 2 = 0
        THEN CAST(-embedding[j] AS FLOAT)
        ELSE CAST(embedding[j] AS FLOAT) END
   FOR j IN generate_series(1, len(embedding))]::FLOAT[] AS embedding,
  label
FROM read_parquet('{SRC}/embeddings.parquet')"""
        copy_into("embeddings", emb, i)

    for i in range(n_copies):
        copy_into(
            "events",
            f"""
SELECT event_id + {i * 100_000_000} AS event_id, ts,
  user_id + {i * ID_STRIDE} AS user_id, event_type, value, props
FROM read_parquet('{SRC}/events.parquet')""",
            i,
        )

    # Relational family: FK-consistent 10× TPC-H-ish weak scaling.
    # Every key column gets the same per-copy offset on BOTH sides of
    # each FK edge (orderkey/custkey/partkey/suppkey), so join
    # selectivities, group sizes, and graph densities all match
    # sf0.1 — ×10 disjoint replicas, not a densified fact table
    # against fixed dims (which would blow up co-purchase degrees
    # 10× and wedge counts 100×). nation/region are true constants
    # (25/5 rows) and stay shared.
    rel = {
        "lineitem": """
SELECT l_orderkey + {o} AS l_orderkey, l_partkey + {p} AS l_partkey,
  l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity,
  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
  l_shipdate
FROM read_parquet('{src}/lineitem.parquet')""",
        "orders": """
SELECT o_orderkey + {o} AS o_orderkey, o_custkey + {c} AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM read_parquet('{src}/orders.parquet')""",
        "customer": """
SELECT c_custkey + {c} AS c_custkey, c_name, c_nationkey, c_acctbal,
  c_mktsegment
FROM read_parquet('{src}/customer.parquet')""",
        "part": """
SELECT p_partkey + {p} AS p_partkey, p_name, p_brand, p_type, p_size,
  p_retailprice
FROM read_parquet('{src}/part.parquet')""",
        "supplier": """
SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey, s_acctbal
FROM read_parquet('{src}/supplier.parquet')""",
    }
    for t, tpl in rel.items():
        for i in range(n_copies):
            copy_into(
                t,
                tpl.format(
                    o=i * ID_STRIDE,
                    c=i * ID_STRIDE,
                    p=i * ID_STRIDE,
                    s=i * ID_STRIDE,
                    src=SRC,
                ),
                i,
            )
    for t in ("nation", "region"):
        copy_into(
            t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", 0
        )

    for t in (
        "documents", "embeddings", "events",
        "lineitem", "orders", "customer", "part", "supplier",
    ):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet/*.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, n)
