"""Synthesize a larger SF locally by replicating an existing SF N
times with key remapping — VERDICT r6 item #2: one more measured
decade of scaling so the 100 TB linearity claims are data, not
assertion.

NOT for correctness (parity runs only on driver-generated SFs) —
this is a measurement corpus.  Conventions (mirroring TESTDATA.md's
generator shape):

- every integer entity key gets ``+ replica * 10_000_000`` on BOTH
  sides of each FK (order/lineitem, part, supplier, customer, event,
  user, doc, vec) — the offset is a multiple of 10 and 25, so the
  ``doc_id % 10`` ingestion-batch and ``vec_id % 25`` query-set
  selections keep their exact fractions, and only replica 0 holds
  ``vec_id < 16`` → the IVF index keeps exactly 16 cells while its
  cells grow 10× (the honest index-stress case);
- dimension tables (region, nation) and categorical domains
  (brands, types, segments, languages) are FIXED — at any real
  scale the nation count does not grow with the fact tables, which
  is precisely what keeps the bounded-relation global windows
  bounded;
- timestamps are UNCHANGED — a 10× corpus has 10× rows per day,
  not 10× more days (calendar-bounded spines stay bounded);
- document TEXT is salted per replica (every whitespace token gets a
  replica-letter suffix; replica 0 verbatim) so cross-replica docs
  are NOT near-duplicates: shingle vocabularies are disjoint across
  replicas, LSH bucket sizes stay at their sf0.1 profile, and
  candidate-pair counts scale linearly like a real multi-day crawl
  instead of quadratically like naive row cloning;
- embeddings get one deterministic perturbed coordinate per replica
  (replica 0 verbatim) so vectors are distinct but the geometry is
  preserved.

Usage: python tools/synth_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_COPY = ("region", "nation")

#: Keyed fact tables and their max-key probe column, used to derive a
#: collision-free per-replica offset when the SOURCE is itself a
#: synthesized SF (chaining sf0.1 -> sf1 -> sf10).
_KEY_PROBES = (
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("events", "event_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def _offset(con, src: str) -> int:
    """Smallest power of 10 above every source key — a power of 10
    >= 100 is a multiple of both 10 and 25, so the ``doc_id % 10``
    batch and ``vec_id % 25`` query selections keep their fractions
    at any chaining depth."""
    mx = 0
    for t, k in _KEY_PROBES:
        mx = max(mx, con.execute(
            f"SELECT MAX({k}) FROM '{src}/{t}.parquet'"
        ).fetchone()[0])
    off = 10_000_000
    while off <= mx:
        off *= 10
    return off


def synth(factor: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    OFF = _offset(con, src)
    print(f"  key offset {OFF}")
    con.execute(f"CREATE TABLE reps AS SELECT UNNEST(range({factor})) AS r")

    def gen(table: str, select: str) -> None:
        out = f"{dst}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet', reps) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"  {table}: {n} rows")

    for t in TABLES_COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")

    k = f"r * {OFF}"
    gen("customer", f"c_custkey + {k} AS c_custkey, c_name, c_nationkey, "
                    "c_acctbal, c_mktsegment")
    gen("supplier", f"s_suppkey + {k} AS s_suppkey, s_name, s_nationkey, "
                    "s_acctbal")
    gen("part", f"p_partkey + {k} AS p_partkey, p_name, p_brand, p_type, "
                "p_size, p_retailprice")
    gen("orders", f"o_orderkey + {k} AS o_orderkey, "
                  f"o_custkey + {k} AS o_custkey, o_orderstatus, "
                  "o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem", f"l_orderkey + {k} AS l_orderkey, "
                    f"l_partkey + {k} AS l_partkey, "
                    f"l_suppkey + {k} AS l_suppkey, "
                    "l_linenumber, l_quantity, l_extendedprice, l_discount, "
                    "l_tax, l_returnflag, l_linestatus, l_shipdate")
    gen("events", f"event_id + {k} AS event_id, ts, "
                  f"user_id + {k} AS user_id, event_type, value, props")
    # Replica-salted text: disjoint shingle vocabularies per replica.
    salted = (
        "CASE WHEN r = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), "
        "t -> t || chr((96 + r)::INTEGER)),"
        " ' ') END"
    )
    gen("documents", f"doc_id + {k} AS doc_id, {salted} AS text, lang, "
                     f"source, length({salted})::BIGINT AS n_chars")
    # One perturbed coordinate per replica keeps vectors distinct.
    pert = (
        "CASE WHEN r = 0 THEN embedding ELSE "
        "list_transform(embedding, (x, i) -> CASE WHEN i = 1 + (r % 64) "
        "THEN CAST(x + 0.001 * r AS FLOAT) ELSE x END) END"
    )
    gen("embeddings", f"vec_id + {k} AS vec_id, {pert} AS embedding, label")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
    print(f"synth {factor}x {src} -> {dst}")
    synth(factor, src, dst)
