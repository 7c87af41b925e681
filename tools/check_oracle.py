#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: load each Verify
parquet dump, run the corresponding oracle SQL in DuckDB over the same
testdata dir, sort columns by name + rows, and compare values exactly.

Driver-strict since round 4: the driver hashes TYPED values, so a DuckDB
HUGEINT 60 and a Spark BIGINT 60 are different even though they compare
numerically equal.  This script therefore also DESCRIBEs both sides and
fails on any column whose DuckDB logical type differs between the oracle
result and the Spark parquet dump (the lint that ends the
HUGEINT/DECIMAL/TIMESTAMP-width bug class — decimal literals escaped in
r2, CAST-rounding in r3 self-review, window-SUM HUGEINT in r3 driver).

Usage: check_oracle.py <sfDir> <verifyOutDir>
       check_oracle.py --selftest     (seeded HUGEINT fixture must go red)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = None
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is not None, str(type(x)), str(x)) for x in t))
    return [sorted(cols), out]


def type_map(rel):
    """Column -> DuckDB logical type name, the driver-visible type."""
    return {c: str(t) for c, t in zip(rel.columns, rel.types)}


def type_lint(got_rel, exp_rel):
    """Return a list of 'col: spark_type != oracle_type' mismatches.

    Exact type equality, the driver's standard — no numeric-family
    leniency, because the driver's hash has none.
    """
    got_t, exp_t = type_map(got_rel), type_map(exp_rel)
    return [f"{c}: spark={got_t[c]} oracle={exp_t[c]}"
            for c in sorted(set(got_t) & set(exp_t)) if got_t[c] != exp_t[c]]


def compare(name, got_rel, exp_rel):
    """Returns (ok, message)."""
    mismatches = type_lint(got_rel, exp_rel)
    if mismatches:
        return False, f"TYPE LINT {'; '.join(mismatches)}"
    got_cols, got = got_rel.columns, got_rel.fetchall()
    exp_cols, exp = exp_rel.columns, exp_rel.fetchall()
    gc, gr = canon(got, got_cols)
    ec, er = canon(exp, exp_cols)
    if gc != ec:
        return False, f"columns {gc} != {ec}"
    if len(gr) != len(er):
        return False, f"rows {len(gr)} != {len(er)}"
    if gr != er:
        diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
        return False, f"values differ, e.g. {diffs}"
    return True, f"{len(gr)} rows"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            exp_rel = con.sql(sql)
            ok, msg = compare(name, got_rel, exp_rel)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if ok:
            print(f"PASS {name} ({msg})")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


def selftest():
    """The lint must go red on a seeded HUGEINT/BIGINT twin (the exact
    q87 failure shape) and green on a CAST-disciplined twin."""
    con = duckdb.connect()
    spark_side = con.sql("SELECT CAST(60 AS BIGINT) AS start_tok")
    poisoned = con.sql(
        "SELECT SUM(CAST(60 AS BIGINT)) OVER () AS start_tok")  # HUGEINT
    ok, msg = compare("seeded_hugeint", spark_side, poisoned)
    assert not ok and "TYPE LINT" in msg, f"lint missed HUGEINT: {ok} {msg}"
    fixed = con.sql(
        "SELECT CAST(SUM(CAST(60 AS BIGINT)) OVER () AS BIGINT) AS start_tok")
    ok, msg = compare("cast_fixed", con.sql(
        "SELECT CAST(60 AS BIGINT) AS start_tok"), fixed)
    assert ok, f"false positive after CAST: {msg}"
    # DECIMAL poisoning (the r2 escape) must also trip it.
    dec = con.sql("SELECT 0.5 AS ratio")  # DECIMAL(2,1)
    dbl = con.sql("SELECT CAST(0.5 AS DOUBLE) AS ratio")
    ok, msg = compare("seeded_decimal", dbl, dec)
    assert not ok and "TYPE LINT" in msg, f"lint missed DECIMAL: {ok} {msg}"
    print("selftest PASS (HUGEINT red, CAST green, DECIMAL red)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
