#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: run each
oracle SQL in DuckDB against the sf parquet tables, load the Verify
parquet dump for the same query, sort columns by name, and compare
values exactly (row order as produced). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import decimal
import json
import math
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Type-STRICT canonicalization: (type-class, exact-string-render).

    The driver's comparator hashes a rendered form, so a Spark
    DecimalType output vs a DuckDB decimal->float64 output diverges
    there even when the values are numerically equal. A plain Python
    ``==`` compare (the pre-r18 spelling) cannot see that:
    ``Decimal(677248) == 677248.0`` is True — which is exactly how the
    driver-red q_ams_f2 of round 17 passed the local mirror. Mapping
    both sides through (type-class, repr) makes any representation
    divergence a local FAIL before the driver sees it.
    """
    if isinstance(v, bool):          # bool before int: bool <: int
        return ("b", v)
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, int):
        return ("i", v)
    return v


def selftest():
    """Seeded representation-divergence test: a DECIMAL-typed value
    must NOT canon-equal its numerically-identical float/int twins."""
    dec = decimal.Decimal(677248)
    assert canon(dec) != canon(677248.0), "Decimal vs float must differ"
    assert canon(dec) != canon(677248), "Decimal vs int must differ"
    assert canon(677248) != canon(677248.0), "int vs float must differ"
    assert canon(True) != canon(1), "bool vs int must differ"
    assert canon(decimal.Decimal(677248)) == canon(dec)
    assert canon(1.5) == canon(1.5)
    assert canon(float("nan")) == canon(float("nan")), "NaN folds equal"
    # end-to-end: a decimal-typed dump FAILS against a bigint oracle,
    # the bigint twin PASSES — the exact q_ams_f2 r17 failure class
    con = duckdb.connect()
    dec_rows = con.sql(
        "SELECT CAST(677248 AS DECIMAL(38,0)) AS x").fetchall()
    big_rows = con.sql("SELECT CAST(677248 AS BIGINT) AS x").fetchall()
    flt_rows = con.sql("SELECT CAST(677248 AS DOUBLE) AS x").fetchall()
    cmp = lambda a, b: tuple(map(canon, a[0])) == tuple(map(canon, b[0]))
    assert not cmp(dec_rows, flt_rows), "decimal dump vs float oracle" \
        " must FAIL the mirror"
    assert not cmp(dec_rows, big_rows), "decimal dump vs bigint oracle" \
        " must FAIL the mirror"
    assert cmp(big_rows, big_rows), "bigint twin must pass"
    print("selftest ok: representation divergence is detected")
    return 0


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # The manifest is the set Verify actually dumped in its last run
    # into this outDir: iterate it (not oracle_sql.json, which lists
    # every registered oracle) and prune per-query dump dirs that are
    # not in it — ghosts from a renamed/removed query in an earlier
    # run would otherwise surface as confusing schema FAILs.
    manifest_path = f"{out_dir}/manifest.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            names = json.load(f)
        live = set(names)
        for entry in sorted(os.listdir(out_dir)):
            p = os.path.join(out_dir, entry)
            if os.path.isdir(p) and entry not in live:
                shutil.rmtree(p)
                print(f"stale {entry}: removed (not in manifest)")
        items = [(n, oracles.get(n)) for n in sorted(names)]
    else:
        items = sorted(oracles.items())
    n_ok = n_bad = 0
    for name, sql in items:
        if sql is None:
            print(f"skip {name}: no oracle SQL registered")
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                " FROM got").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                " FROM exp").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_bad += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if tuple(map(canon, g)) != tuple(map(canon, e)):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs\n  spark={g}\n  duck ={e}")
            print(f"  cols: {got_cols}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
