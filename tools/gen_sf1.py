#!/usr/bin/env python3
"""Generate a 10x replica of sf0.1 ("sf1.0") for the scaling-curve
study (BASELINE.md): same schemas and distributions, keys offset per
replica so per-key structure (chains within an order, SCD2 key
domains, pagerank vertex ids) scales in COUNT without changing shape.
Writes only the tables the curve's five queries + Bench's session
warm-up touch. Output dir is disposable (/tmp) — NOT driver testdata.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def perm(r):
    """Deterministic per-replica alphabet permutation (explicit LCG
    Fisher-Yates — stable across Python versions). A plain rotation
    collides mod 26: replicas r and r+26 would be byte-identical,
    silently re-introducing the duplicate explosion dissimilar
    replicas exist to avoid."""
    a = list("abcdefghijklmnopqrstuvwxyz")
    s = 2 * r + 1
    for i in range(25, 0, -1):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        j = (s >> 33) % (i + 1)
        a[i], a[j] = a[j], a[i]
    p = "".join(a)
    if p == "abcdefghijklmnopqrstuvwxyz":  # force non-identity
        p = p[1] + p[0] + p[2:]
    return p


vals = ", ".join(f"({r}, '{perm(r)}')" for r in range(R))
con.sql("CREATE VIEW reps AS SELECT * FROM "
        f"(VALUES {vals}) t(r, perm)")

def gen(table, select):
    con.sql(
        f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet' "
        f"CROSS JOIN reps) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# ONE shared orderkey offset for both fact tables: independent maxima
# only preserve the orders<->lineitem join by coincidence (they are
# equal today because the highest-keyed order happens to have
# lineitems; a source where it doesn't would silently shear the join
# across replicas)
mo = con.sql(
    f"SELECT greatest((SELECT max(l_orderkey) FROM '{SRC}/lineitem.parquet'), "
    f"(SELECT max(o_orderkey) FROM '{SRC}/orders.parquet')) + 1").fetchone()[0]
gen("lineitem",
    f"l_orderkey + r*{mo} AS l_orderkey, l_partkey, l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate")
gen("orders",
    f"o_orderkey + r*{mo} AS o_orderkey, o_custkey, o_orderstatus, "
    "o_totalprice, o_orderdate, o_orderpriority")
nd = con.sql(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
cols = [c[0] for c in con.sql(
    f"DESCRIBE SELECT * FROM '{SRC}/documents.parquet'").fetchall()]
# text gets a per-replica alphabet PERMUTATION so replicas are
# DISSIMILAR at any R (verbatim copies turn every dedup run into a
# duplicate-explosion stress where the OUTPUT, not the algorithm,
# dominates — fine as a worst case, wrong for a scaling curve);
# r=0 keeps the original
az = "abcdefghijklmnopqrstuvwxyz"
rot = ("CASE WHEN r = 0 THEN text ELSE translate(text, '" + az +
       "', perm) END")
rest = ", ".join(c for c in cols if c not in ("doc_id", "text"))
gen("documents", f"doc_id + r*{nd} AS doc_id, {rot} AS text, {rest}")
ne = con.sql(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
nu = con.sql(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
ecols = [c[0] for c in con.sql(
    f"DESCRIBE SELECT * FROM '{SRC}/events.parquet'").fetchall()]
erest = ", ".join(c for c in ecols if c not in ("event_id", "user_id"))
gen("events",
    f"event_id + r*{ne} AS event_id, user_id + r*{nu} AS user_id, {erest}")
nv = con.sql(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
vcols = [c[0] for c in con.sql(
    f"DESCRIBE SELECT * FROM '{SRC}/embeddings.parquet'").fetchall()]
# embeddings get pseudo-random per-(replica, dim) SIGN FLIPS so
# replicas decorrelate (cosine ~0) instead of being exact duplicates
vrest = ", ".join(c for c in vcols if c not in ("vec_id", "embedding"))
flip = ("CASE WHEN r = 0 THEN embedding ELSE "
        "list_transform(embedding, (x, i) -> "
        "x * (CASE WHEN hash(i * 131 + r * 7919) % 2 = 0 "
        "THEN 1 ELSE -1 END)) END")
gen("embeddings", f"vec_id + r*{nv} AS vec_id, {flip} AS embedding, {vrest}")
# dimension tables copy UNSCALED (the TPC-H campaign joins replicated
# facts against them; fact keys like o_custkey are left in the base
# domain on purpose). Without these the TPC-H queries fail table
# resolution at the replica dir — and Bench records a near-zero cell
# for a thrown query, which reads as impossibly fast instead of broken.
for t in ("region", "nation", "customer", "supplier", "part"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied unscaled")
print("done ->", DST)
