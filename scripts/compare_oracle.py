#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate.

Reads target/verify_out/<name>/ parquet (Spark result) and runs the
matching oracle_sql.json entry in DuckDB over the same sf dir, then
compares rows / schema (sorted column names) / a value hash computed
under sorted column order — the driver's documented compare rule.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOut> [name ...]
"""
import sys, json, glob, os, hashlib, decimal
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf, t + ".parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(v):
    if v is None:
        return "NULL"
    # DECIMAL results coerce to float like the driver's pandas-backed
    # compare does (r15: q_mann_kendall's DECIMAL(38,1) `s` vs the
    # engine's DOUBLE was green at the driver but red here via the
    # str(Decimal) path — the oracles are now DOUBLE-cast anyway, this
    # keeps the dev loop faithful if one slips through again)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(",".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

fails = 0
names = sorted(n for n in oracle if not only or any(s in n for s in only))
for name in names:
    d = os.path.join(out, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [c[0] for c in con.description]
        odf = con.execute(oracle[name]).fetchall()
        ocols = [c[0] for c in con.description]
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    ok_rows = len(sdf) == len(odf)
    ok_schema = sorted(scols) == sorted(ocols)
    ok_hash = ok_schema and table_hash(scols, sdf) == table_hash(ocols, odf)
    if ok_rows and ok_schema and ok_hash:
        print(f"ok   {name} ({len(sdf)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: rows {len(sdf)}/{len(odf)} "
              f"schema {sorted(scols)}/{sorted(ocols)} hash={ok_hash}")
print(f"\n{len(names) - fails}/{len(names)} green")
sys.exit(1 if fails else 0)
