#!/usr/bin/env python
"""Synthesize a factor-N scaled copy of a testdata directory — the
committed form of the 10x/100x scaling-probe recipe BENCH.md documents
(rounds 5-6 built these ad hoc; this script makes the probe
reproducible).

Recipe (per BENCH.md "10x scaling experiment"):
- every table is N concatenated copies with entity ids offset per copy
  by the table's id span, so per-key densities (orders per customer,
  events per user, lineitems per order) are PRESERVED — a naive
  concatenation without offsets would multiply per-key group sizes
  instead of key cardinality and turn per-key windows quadratic;
- document word order is hash-scrambled per (copy, doc), so dedup
  workloads see unique texts rather than N-1 artificial exact-dup
  clusters per doc (n_chars is recomputed from the scrambled text);
- embedding components get a deterministic per-(copy, position) sign
  pattern, which preserves norms and component distributions while
  decorrelating copies — otherwise SemDeDup/ANN would see every vector
  N times at cosine 1.0;
- region/nation are true dimensions and copy through unchanged;
- timestamps are left as-is (same time range, N-fold density — the
  shape a busier feed produces).

Usage:
  python scripts/make_scale_data.py SRC_DIR DST_DIR FACTOR
  # 10x:  python scripts/make_scale_data.py /root/testdata/sf0.1 /tmp/scale10 10
  # 100x: python scripts/make_scale_data.py /tmp/scale10 /tmp/scale100 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, [id columns offset by their own table's span], [fk columns
# offset by the referenced table's span])
_OFFSETS: dict[str, list[tuple[str, str]]] = {
    # col -> span source table (its own table for PKs)
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"),
                 ("l_suppkey", "supplier")],
    "events": [("event_id", "events"), ("user_id", None)],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
_PK = {"customer": "c_custkey", "supplier": "s_suppkey",
       "part": "p_partkey", "orders": "o_orderkey",
       "events": "event_id", "documents": "doc_id",
       "embeddings": "vec_id"}
_COPY_THROUGH = ("region", "nation")


def _span(conn, src: str, table: str, col: str | None = None) -> int:
    col = col or _PK[table]
    return conn.execute(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    conn = duckdb.connect()
    conn.execute(f"SET threads TO {os.cpu_count()}")
    for t in _COPY_THROUGH:
        conn.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                     f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied through")

    spans = {"customer": _span(conn, src, "customer"),
             "supplier": _span(conn, src, "supplier"),
             "part": _span(conn, src, "part"),
             "orders": _span(conn, src, "orders"),
             "events": _span(conn, src, "events"),
             "documents": _span(conn, src, "documents"),
             "embeddings": _span(conn, src, "embeddings"),
             None: _span(conn, src, "events", "user_id")}

    for t, offs in _OFFSETS.items():
        cols = [r[0] for r in conn.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        off_map = {c: spans[ref] for c, ref in offs}
        sel = []
        for c in cols:
            if c in off_map:
                sel.append(f"{c} + c.copy * {off_map[c]} AS {c}")
            elif t == "documents" and c == "text":
                # deterministic per-(copy, doc) word scramble: stable
                # sort of the word list by a keyed hash; copy 0 keeps
                # the original order so the base slice is bit-identical
                sel.append(
                    "CASE WHEN c.copy = 0 THEN text ELSE "
                    "array_to_string(list_transform(list_sort(list_transform("
                    "  string_split(text, ' '), "
                    "  w -> struct_pack(k := hash(w || '|' || c.copy || '|' "
                    "|| doc_id), w := w))), s -> s.w), ' ') END AS text")
            elif t == "documents" and c == "n_chars":
                # copy 0 keeps the SOURCE n_chars (so the base slice is
                # bit-identical even if the source disagrees with
                # length(text)); copies >= 1 are recomputed below from
                # the scrambled text
                sel.append("CASE WHEN c.copy = 0 THEN n_chars "
                           "ELSE CAST(NULL AS BIGINT) END AS n_chars")
            elif t == "embeddings" and c == "embedding":
                # per-(copy, position) sign flips: norm-preserving,
                # distribution-preserving, decorrelates copies
                sel.append(
                    "CASE WHEN c.copy = 0 THEN embedding ELSE "
                    "CAST(list_transform(list_zip(embedding, "
                    "  range(1, len(embedding) + 1)), "
                    "  z -> z[1] * CAST(1 - 2 * CAST(hash(c.copy || ':' || "
                    "z[2]) % 2 AS BIGINT) AS FLOAT)) AS FLOAT[]) END "
                    "AS embedding")
            else:
                sel.append(c)
        q = (f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
             f"(SELECT unnest(range({factor})) AS copy) AS c")
        if t == "documents":
            q = (f"SELECT * REPLACE (coalesce(n_chars, "
                 f"CAST(length(text) AS BIGINT)) AS n_chars) FROM ({q})")
        conn.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = conn.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    scale(sys.argv[1], sys.argv[2], int(sys.argv[3]))
