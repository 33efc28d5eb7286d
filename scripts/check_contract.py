#!/usr/bin/env python
"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, column names,
and order-insensitive values (exact for ints/strings; floats must agree to
1e-9 relative — and we report any float that wouldn't survive exact
hashing).

Usage: python scripts/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def sort_key(row):
    return tuple((x is None, str(x)) for x in row)


# Width within the int family does NOT matter to the driver's hash
# (round-1 evidence: ann_* rank is Spark int32 vs DuckDB BIGINT, hash green).
# What DOES fail is the int family vs HUGEINT/DECIMAL (round-1 events_json_k,
# multimodal_features) — those cross an Arrow representation boundary.
def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t in ("BIGINT", "INT64", "LONG", "INTEGER", "INT", "INT32",
             "SMALLINT", "TINYINT", "INT16", "INT8", "UTINYINT", "USMALLINT"):
        return "int"
    if t in ("HUGEINT", "INT128", "UBIGINT", "UINTEGER"):
        return "int128"
    if t.startswith("DECIMAL") or t.startswith("NUMERIC"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    return "other"


def _spark_type_class(t) -> str:
    n = t.simpleString()
    if n in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if n.startswith("decimal"):
        return "decimal"
    if n in ("double", "float"):
        return "float"
    return "other"


def check_types(spark_df, duck_typed_cols):
    """Driver-shaped check: the driver hashes TYPED representations, so a
    DuckDB HUGEINT (uncast integer sum) vs Spark BIGINT is a hash FAIL even
    when every value matches (round-1 lesson). Flag numeric-class drift."""
    s_types = {f.name: _spark_type_class(f.dataType) for f in spark_df.schema.fields}
    drifts = []
    for col, dtype in duck_typed_cols:
        dc = _duck_type_class(dtype)
        sc = s_types.get(col)
        if sc is None:
            continue
        if dc != sc and not (dc == "other" and sc == "other"):
            drifts.append(f"{col}: spark={sc} duck={dc}({dtype})")
    return drifts


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_rows = [tuple(norm_cell(r[i]) for i in s_idx) for r in spark_df.collect()]
    d_rows = [tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    s_rows.sort(key=sort_key)
    d_rows.sort(key=sort_key)
    n_float_fuzzy = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if sv == dv:
                continue
            if isinstance(sv, float) and isinstance(dv, float):
                if abs(sv - dv) <= 1e-9 * max(1.0, abs(sv), abs(dv)):
                    n_float_fuzzy += 1
                    continue
            return (
                f"VALUE MISMATCH row {i} col {s_cols[j]}: spark={sv!r} duck={dv!r}"
            )
    if n_float_fuzzy:
        return f"FLOAT-FUZZY ({n_float_fuzzy} cells differ in last ulp — exact hash would FAIL)"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from firmable_company_data_pipeline_spark import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # registered queries persist intermediates (signature tables,
        # occurrence streams) under a caller-owns-lifetime contract;
        # this loop is that caller — drop them so a full 150+-query
        # session doesn't accumulate cached blocks (advice r5).  Also
        # unpersist RDD-level blocks: clearCache() does not release
        # localCheckpoint storage from the iterative CC queries
        # (review r6).
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"  {name:32s} rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                rows_only += 1
                continue
            typed = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            drifts = check_types(sdf, [(r[0], r[1]) for r in typed])
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            verdict = compare(name, sdf, res.fetchall(), duck_cols)
            if verdict is None and drifts:
                verdict = "TYPE DRIFT (driver hash would FAIL): " + "; ".join(drifts)
        except Exception as e:
            verdict = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        if verdict:
            failures.append((name, verdict))
            print(f"  {name:32s} FAIL: {verdict} [{time.time()-t0:.1f}s]")
        else:
            passed += 1
            print(f"  {name:32s} ok [{time.time()-t0:.1f}s]")

    print(f"\n{passed} matched, {rows_only} rows-only, {len(failures)} failed")
    if failures:
        sys.exit(1)

    # entry() smoke
    n = entrymod.entry(spark).count()
    print(f"entry() smoke: {n} rows")
    assert n > 0


if __name__ == "__main__":
    main()
