#!/usr/bin/env python3
"""Build a key-offset replicated scale-check dataset (builder-local).

Replicates the LLM-pipeline tables (documents, embeddings, events) K
times with key offsets so ids stay unique while content repeats —
deliberately stressing the dedup/contamination family, which sees every
replica as an exact near-dup. TPC-H-shaped tables are symlinked from
the source scale dir (their scale behavior is covered by the TPC-H
family's own AQE checks; replicating them only slows the loop).

Usage: tools/make_replicas.py <src_sf_dir> <out_dir> [K=10]

Timestamps are rewritten as plain microseconds by the parquet writer
here; graft.Tables.events branches on the read schema, so both the
driver's TIMESTAMP(NANOS) originals and these replicas load.
"""
import os
import sys

import duckdb

KEYED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}

LINKED = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def main() -> None:
    # abspath: a relative symlink target would resolve relative to the
    # LINK's directory, leaving dangling links for relative src dirs
    src, out = os.path.abspath(sys.argv[1]), sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYED.items():
        path = os.path.join(src, f"{table}.parquet")
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        # per-table offset from the data (max over all key cols + 1):
        # a fixed constant would silently overlap replica key ranges the
        # day a source table's ids reach it, breaking the unique-ids/
        # repeated-content invariant the dedup scale checks depend on
        offset = con.sql(
            "SELECT greatest(" + ", ".join(f"max({c})" for c in keys)
            + f", 0) + 1 FROM '{path}'").fetchone()[0]
        arms = []
        for i in range(k):
            sel = ", ".join(
                f"{c} + {i * offset} AS {c}" if c in keys else c
                for c in cols)
            arms.append(f"SELECT {sel} FROM '{path}'")
        union = "\nUNION ALL\n".join(arms)
        dest = os.path.join(out, f"{table}.parquet")
        con.sql(f"COPY ({union}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dest}")
    for table in LINKED:
        dest = os.path.join(out, f"{table}.parquet")
        if os.path.lexists(dest):
            os.remove(dest)
        os.symlink(os.path.join(src, f"{table}.parquet"), dest)
        print(f"{table}: symlink -> {dest}")


if __name__ == "__main__":
    main()
