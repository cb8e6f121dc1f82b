#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
parquet tables, and compares row count, column names, and values
(columns sorted by name, exact compare with a tiny float tolerance for
diagnostics -- the real driver hash-compares, so we report any inexact
float as a failure too).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import math
from decimal import Decimal

def canon(v):
    if isinstance(v, Decimal):
        return ('d', str(v.normalize()))
    if isinstance(v, float):
        return ('f', v)
    if hasattr(v, 'isoformat'):
        return ('t', v.isoformat())
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(t)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_bad += 1; continue
        files = glob.glob(os.path.join(res_dir, '*.parquet'))
        spark_tbl = pq.read_table(files)
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}"); n_bad += 1; continue
        # Output-type lint: decimal columns hash-mismatch in the driver's
        # compare (Decimal repr vs float), and nested types break its
        # pandas row-sort -- both burned us in round 1. Declared-query
        # outputs must stay in {int, bigint, double, string, date,
        # timestamp, bool}.
        risky = [f"{c}:{spark_tbl.schema.field(c).type}" for c in spark_tbl.column_names
                 if str(spark_tbl.schema.field(c).type).startswith(('decimal', 'list', 'struct', 'map'))]
        if risky:
            print(f"FAIL {name}: driver-hostile output types {risky}"); n_bad += 1; continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} != {duck.num_rows}"); n_bad += 1; continue
        bad = None
        for c in s_cols:
            sv = spark_tbl[c].to_pylist()
            dv = duck[c].to_pylist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                ca, cb = canon(a), canon(b)
                if ca != cb:
                    # int-width-only leniency (int32 vs int64); any
                    # decimal/float cross-type difference is a FAILURE --
                    # the driver hashes value reprs strictly (round 1:
                    # every decimal-output query hash-mismatched).
                    if isinstance(a, int) and isinstance(b, int) and a == b:
                        continue
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}"); n_bad += 1
        else:
            print(f"ok   {name} ({spark_tbl.num_rows} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
