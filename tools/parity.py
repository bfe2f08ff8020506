#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 tools/parity.py [sfdir] [outdir]
Expects graft.Verify to have written <outdir>/<name>/ parquet dirs and
<outdir>/oracle_sql.json. Runs each oracle in DuckDB over views named
after the test tables, sorts columns by name, compares row-by-row.
"""
import sys, json, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if len(sys.argv) > 3:  # optional comma-separated query-name filter
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"[MISS] {name}: no spark output"); fails += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {str(e)[:200]}"); fails += 1; continue
    # Read the Spark output with pyarrow, NOT duckdb fetchdf: duckdb
    # flattens parquet DECIMAL columns to float64, which masked the
    # round-10 q2 driver mismatch (Spark decimal128(27,6) vs oracle
    # DOUBLE hash differently at the driver, but compared equal here).
    # pyarrow keeps decimals as decimal.Decimal objects so canon() sees
    # the same serialization split the driver does.
    import pyarrow.parquet as _pq
    import pandas as _pd
    sdf = _pd.concat(
        [_pq.read_table(f).to_pandas() for f in sorted(spark_files)],
        ignore_index=True)
    sdf = sdf[sorted(sdf.columns)]; odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"[SCHEMA] {name}: spark={list(sdf.columns)} oracle={list(odf.columns)}"); fails += 1; continue
    if len(sdf) != len(odf):
        print(f"[ROWS] {name}: spark={len(sdf)} oracle={len(odf)}"); fails += 1; continue
    # dtype comparison (int64 vs int32 etc.)
    dt_s, dt_o = [str(t) for t in sdf.dtypes], [str(t) for t in odf.dtypes]
    if dt_s != dt_o:
        print(f"[DTYPE] {name}: spark={dt_s} oracle={dt_o} (warn)")
    # Serialized-form comparison, mirroring the driver's hasher: the
    # driver hashes a string serialization of each cell, under which
    # Decimal('1.5') != Decimal('1.500000') even though pandas value
    # equality says they're equal.  Scale/serialization mismatches in
    # DECIMAL output columns MUST fail here, or local green doesn't
    # predict driver green (the round-5 false "tri-SF green").
    import numpy as np, decimal, math, datetime as _dt
    import pandas as _pd2
    def canon(v):
        if isinstance(v, (np.ndarray, list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        # pyarrow yields tz-AWARE Timestamps for Spark parquet timestamps
        # (isAdjustedToUTC) while duckdb fetchdf yields naive datetime64 —
        # normalize both to naive-UTC ISO strings so the asymmetric read
        # paths can't false-fail a matching timestamp column
        if isinstance(v, _pd2.Timestamp) or isinstance(v, _dt.datetime):
            t = _pd2.Timestamp(v)
            if t.tzinfo is not None:
                t = t.tz_convert("UTC").tz_localize(None)
            return "ts:" + t.isoformat()
        if isinstance(v, np.datetime64):
            return "ts:" + _pd2.Timestamp(v).isoformat()
        if isinstance(v, _dt.date):
            return "date:" + v.isoformat()
        if isinstance(v, decimal.Decimal):
            return "dec:" + str(v)
        if isinstance(v, (float, np.floating)):
            f = float(v)
            return "nan" if math.isnan(f) else repr(f)
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if v is None:
            return "null"
        return str(v)
    ser_s = np.array([[canon(v) for v in row] for row in sdf.itertuples(index=False)])
    ser_o = np.array([[canon(v) for v in row] for row in odf.itertuples(index=False)])
    neq = ser_s != ser_o
    if neq.any():
        idx = list(zip(*np.where(neq)))[:5]
        print(f"[VALUES] {name}: {neq.sum()} mismatched cells (serialized); first: ")
        for r, c in idx:
            print(f"    row {r} col {sdf.columns[c]}: spark={ser_s[r, c]!r} oracle={ser_o[r, c]!r}")
        fails += 1; continue
    print(f"[OK] {name}: {len(sdf)} rows")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
