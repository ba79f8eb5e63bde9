#!/usr/bin/env python3
"""Dev-only cross-check mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the testdata parquet and compares
against the Spark-written parquet in the verify out dir (columns sorted
by name, rows compared as multisets with exact value equality).

Usage: python3 tools/check_oracles.py /tmp/verify_out /root/testdata/sf0.001
"""
import sys, os, json, math, decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def type_cat(t):
    """Collapse an arrow type to the category the driver's hash is sensitive
    to. Int widths are folded together (the driver's pandas coercion erases
    them) but decimal vs int vs float vs string stay DISTINCT — DuckDB's
    sum(BIGINT) -> HUGEINT -> decimal128(38,0) widening must be flagged here,
    not first by the driver (the p43 lesson)."""
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bin"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_date(t): return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_cat(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{type_cat(f.type)}" for f in t) + ">"
    return str(t)

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # full precision
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # never silently equal to an int/str of same digits
    if v is None: return "NULL"
    return str(v)

def rows_of(table):
    cols = sorted(table.column_names)
    table = table.select(cols)
    types = {c: type_cat(table.schema.field(c).type) for c in cols}
    data = table.to_pylist()
    return cols, types, sorted("|".join(canon(r[c]) for c in cols) for r in data)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            print(f"MISSING-SPARK {name}"); n_bad += 1; continue
        try:
            spark_t = ds.dataset(d, format="parquet").to_table()
        except Exception as e:
            print(f"SPARK-READ-FAIL {name}: {e}"); n_bad += 1; continue
        try:
            duck_t = con.sql(sql).arrow()
        except Exception as e:
            print(f"DUCK-FAIL {name}: {str(e)[:200]}"); n_bad += 1; continue
        sc, st, sr = rows_of(spark_t)
        dc, dt, dr = rows_of(duck_t)
        if sc != dc:
            print(f"SCHEMA-MISMATCH {name}: spark={sc} duck={dc}"); n_bad += 1; continue
        tdiff = {c: (st[c], dt[c]) for c in sc if st[c] != dt[c]}
        if tdiff:
            print(f"TYPE-MISMATCH {name}: " +
                  ", ".join(f"{c}: spark={a} duck={b}" for c, (a, b) in tdiff.items()))
            n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"ROWCOUNT {name}: spark={len(sr)} duck={len(dr)}"); n_bad += 1; continue
        if sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"VALUES {name}: {len([1 for a,b in zip(sr,dr) if a!=b])} differing rows; first: ")
            for a, b in diffs:
                print(f"   spark: {a[:220]}")
                print(f"   duck : {b[:220]}")
            n_bad += 1; continue
        print(f"OK {name} ({len(sr)} rows)"); n_ok += 1
    # rows-only entries
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracles:
            try:
                n = ds.dataset(p, format="parquet").to_table().num_rows
                print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS-ONLY {name}: READ FAIL {e}")
    print(f"\n{n_ok} ok, {n_bad} bad")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
