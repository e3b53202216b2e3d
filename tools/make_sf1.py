"""Synthesize a local sf1 dataset by replicating sf0.1 ten times.

The driver testdata tops out at sf0.1 (TESTDATA.md); VERDICT r03 item 6
asks for one sf1 robustness run to catch constant factors that hide at
sf0.1.  This script builds sf1 = 10 key-shifted replicas of sf0.1:

- Replica r shifts every surrogate key by ``r * stride`` where stride is a
  power of ten safely above the key's max, and the SAME stride is applied
  to both sides of every FK edge (orders.o_orderkey <-> lineitem.l_orderkey,
  o_custkey <-> c_custkey, l_partkey <-> p_partkey, l_suppkey <-> s_suppkey,
  so referential integrity and join selectivity are preserved exactly).
- ``region``/``nation`` are true dimensions and stay fixed (so per-nation
  group counts stay constant while group sizes grow 10x — the realistic
  scale-up shape).
- ``events.user_id`` shifts, so the (user_id, day) -> trace derivation in
  sources/spans.py yields 10x traces of unchanged size/depth.
- ``documents.text`` / ``embeddings.embedding`` are replicated VERBATIM:
  replicas form exact-duplicate groups of 10, which is the realistic shape
  of a crawled corpus and a deliberate stress for the dedup family (LSH
  cliques of 10 -> 45 candidate pairs per original doc, bounded).

Output: ``<repo>/.bench/sf1/*.parquet`` (gitignored), row groups sized so
Spark's maxPartitionBytes actually splits the scan (the driver testdata's
one-row-group-per-file pitfall is documented in SCALE.md).

r14 (VERDICT r13 next-round #1): the replica count / output name are now
argv-parametrized so the same machinery builds a third scale for the
floor probes: ``python tools/make_sf1.py 50 sf5`` writes a 50-replica
``.bench/sf5``.  Strides stay safe: the largest (10M) times 49 replicas
is 4.9e8, far inside BIGINT and far above every sf0.1 key max.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench",
    sys.argv[2] if len(sys.argv) > 2 else "sf1",
)

# table -> {column: stride}; strides are shared across FK edges.
STRIDE_ORDER = 10_000_000
STRIDE_CUST = 1_000_000
STRIDE_PART = 1_000_000
STRIDE_SUPP = 100_000
STRIDE_EVENT = 10_000_000
STRIDE_USER = 10_000_000
STRIDE_DOC = 1_000_000
STRIDE_VEC = 1_000_000

SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": STRIDE_CUST},
    "supplier": {"s_suppkey": STRIDE_SUPP},
    "part": {"p_partkey": STRIDE_PART},
    "orders": {"o_orderkey": STRIDE_ORDER, "o_custkey": STRIDE_CUST},
    "lineitem": {
        "l_orderkey": STRIDE_ORDER,
        "l_partkey": STRIDE_PART,
        "l_suppkey": STRIDE_SUPP,
    },
    "events": {"event_id": STRIDE_EVENT, "user_id": STRIDE_USER},
    "documents": {"doc_id": STRIDE_DOC},
    "embeddings": {"vec_id": STRIDE_VEC},
}
FIXED = ["region", "nation"]


def replicate(con: duckdb.DuckDBPyConnection, table: str) -> None:
    src = f"{SRC}/{table}.parquet"
    cols = [
        r[0]
        for r in con.execute(
            f"describe select * from read_parquet('{src}')"
        ).fetchall()
    ]
    shifts = SHIFTS[table]
    selects = []
    for r in range(REPLICAS):
        exprs = []
        for c in cols:
            if c in shifts and r > 0:
                # CAST keeps the shifted key the same type as the source.
                exprs.append(f"CAST({c} + {r * shifts[c]} AS BIGINT) AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM read_parquet('{src}')"
        )
    union = " UNION ALL ".join(selects)
    dst = f"{DST}/{table}.parquet"
    con.execute(
        f"COPY ({union}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
    print(f"{table}: {n} rows -> {dst}")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied fixed dimension")
    for t in SHIFTS:
        replicate(con, t)


if __name__ == "__main__":
    main()
