#!/usr/bin/env python3
"""Dev-side replica of the driver's t2 check: read Verify output parquet,
run oracle_sql.json in DuckDB over the same sf dir, compare as multisets
(sorted columns by name, 1e-9 relative tolerance on floats).

ARRAY-COLUMN RULE (round-5 lesson): the driver's pandas harness sorts rows
with sort_values, which dies on array/list-typed columns (`unhashable type:
numpy.ndarray`). Any oracle-declared query MUST render array/map/struct
results to canonical strings (to_json / array_join) in BOTH spellings.
This script enforces that: a list/struct-typed output column is a FAIL here
even though repr-sorting could compare it, because the driver cannot."""
import sys, json, glob, math
import duckdb, pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracles = json.load(open(f"{outdir}/oracle_sql.json"))

import datetime, decimal
def norm(v):
    # Type-tagged renders: the driver hashes RENDERED values (via pandas),
    # so Spark BIGINT 5 vs DuckDB DOUBLE 5.0 (ceil/floor/sign) and DuckDB
    # HUGEINT (arrow decimal128 -> pandas float64) MUST mismatch here too.
    # Round-2 lesson: 9-sig-digit numeric normalization alone under-detects.
    if isinstance(v, bool): return "b:" + str(v)
    if isinstance(v, datetime.datetime): return "dt:" + v.isoformat()
    if isinstance(v, datetime.date): return "d:" + v.isoformat()
    if isinstance(v, decimal.Decimal):  # DuckDB HUGEINT/decimal -> pandas float64 on the driver
        return norm(float(v))
    if isinstance(v, float):
        if math.isnan(v): return "f:NaN"
        r = round(v, 9) if abs(v) < 1 else round(v, max(0, 9 - int(math.log10(abs(v)))))
        return "f:" + repr(r)
    if isinstance(v, int): return "i:" + str(v)
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    if isinstance(v, dict): return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, bytes): return v.hex()
    return v

ok = fail = 0
failures = []
for name in sorted(oracles):
    path = f"{outdir}/{name}"
    try:
        spark_tbl = pq.read_table(glob.glob(f"{path}/*.parquet")[0] if glob.glob(f"{path}/*.parquet") else path)
    except Exception as e:
        failures.append((name, f"spark output missing: {e}")); fail += 1; continue
    try:
        duck = con.sql(oracles[name]).fetch_arrow_table()
    except Exception as e:
        failures.append((name, f"oracle error: {e}")); fail += 1; continue
    s_cols = sorted(spark_tbl.column_names); d_cols = sorted(duck.column_names)
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        failures.append((name, f"schema mismatch: spark={s_cols} duck={d_cols}")); fail += 1; continue
    import pyarrow as pa
    # Binary columns crash the driver the same way (bytearray is unhashable
    # in pandas sort_values — round-6 lesson from mm_frame_sample), so
    # reject pa binary/large_binary alongside nested types.
    nested = [f.name for tbl in (spark_tbl, duck) for f in tbl.schema
              if pa.types.is_nested(f.type) or pa.types.is_binary(f.type)
              or pa.types.is_large_binary(f.type) or pa.types.is_fixed_size_binary(f.type)]
    if nested:
        failures.append((name, f"DRIVER-INCOMPATIBLE array/struct/binary columns {sorted(set(nested))}: "
                         "render to strings (to_json/array_join/base64) in both spellings")); fail += 1; continue
    s_rows = sorted([tuple(norm(r[c]) for c in s_cols) for r in spark_tbl.to_pylist()], key=repr)
    d_rows = sorted([tuple(norm(r[c]) for c in d_cols) for r in duck.to_pylist()], key=repr)
    if s_rows == d_rows:
        ok += 1
    else:
        fail += 1
        diff = f"rows spark={len(s_rows)} duck={len(d_rows)}"
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                diff += f"; first diff row {i}: spark={a} duck={b}"; break
        failures.append((name, diff))
print(f"PASS {ok} / {ok+fail}")
for n, d in failures:
    print(f"FAIL {n}: {d[:500]}")
