#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query parquet
dumped by graft.Verify, run the oracle SQL in DuckDB over the same sf dir
and compare schema + row count + value hash (columns sorted by name, rows
sorted by all columns)."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for qname, sql in sorted(oracle.items()):
    spark_glob = f"{out_dir}/{qname}/*.parquet"
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_glob}'").df()
    except Exception as e:
        bad.append((qname, f"spark output missing: {e}")); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        bad.append((qname, f"oracle sql failed: {e}")); continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        bad.append((qname, f"schema mismatch: spark={scols} oracle={ocols}")); continue
    if len(sdf) != len(odf):
        bad.append((qname, f"rowcount mismatch: spark={len(sdf)} oracle={len(odf)}")); continue
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    try:
        sdt = {c: str(s[c].dtype) for c in scols}
        odt = {c: str(o[c].dtype) for c in ocols}
        if sdt != odt:
            bad.append((qname, f"dtype mismatch: spark={sdt} oracle={odt}")); continue
        eq = s.equals(o)
    except Exception as e:
        bad.append((qname, f"compare error: {e}")); continue
    if eq:
        ok.append((qname, len(s)))
    else:
        diff = (s != o) & ~(s.isna() & o.isna())
        ndiff = int(diff.any(axis=1).sum())
        cols_bad = [c for c in scols if diff[c].any()]
        bad.append((qname, f"value mismatch: {ndiff}/{len(s)} rows differ in {cols_bad}"))

for q, n in ok: print(f"PASS {q} ({n} rows)")
for q, msg in bad: print(f"FAIL {q}: {msg}")
print(f"\n{len(ok)} pass / {len(bad)} fail")
sys.exit(1 if bad else 0)
