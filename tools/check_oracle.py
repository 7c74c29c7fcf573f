import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        results[name] = {"rows": len(spark_df), "oracle": False}
        continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = {"error": "oracle_sql: " + str(e)[:200]}
        continue
    r = {"rows_spark": len(spark_df), "rows_oracle": len(odf)}
    s = spark_df[sorted(spark_df.columns)]
    o = odf[sorted(odf.columns)]
    r["cols_match"] = list(s.columns) == list(o.columns)
    if not r["cols_match"]:
        r["spark_cols"] = list(s.columns); r["oracle_cols"] = list(o.columns)
    else:
        r["dtypes"] = [str(a)+"/"+str(b) for a,b in zip(s.dtypes, o.dtypes) if str(a)!=str(b)]
        if len(s) == len(o):
            mism = []
            for c in s.columns:
                a, b = s[c].values, o[c].values
                try:
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        eq = (pd.isna(a) & pd.isna(b)) | (a == b)
                    else:
                        eq = (pd.Series(a).isna() & pd.Series(b).isna()).values | (a == b)
                    n_bad = int((~eq).sum())
                    if n_bad: mism.append((c, n_bad))
                except Exception as e:
                    mism.append((c, "cmpfail:"+str(e)[:80]))
            r["value_mismatches"] = mism
        r["rows_match"] = len(s) == len(o)
    results[name] = r

# coverage hole guard: an oracle key whose query crashed in Verify has no
# output dir -- that must FAIL, not silently vanish from the gate
for name in oracle:
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        results[name] = {"error": "no output dir (query failed in Verify?)"}

ok = fail = 0
for name, r in sorted(results.items()):
    if r.get("oracle") is False:
        print(f"{name}: ROWS-ONLY rows={r['rows']}")
        continue
    if "error" in r:
        fail += 1
        print(f"{name}: FAIL {r['error']}")
        continue
    good = (r.get("rows_match") and r.get("cols_match")
            and not r.get("value_mismatches") and not r.get("dtypes"))
    status = "OK" if good else "FAIL"
    if good: ok += 1
    else: fail += 1
    extra = ""
    if not good:
        extra = " " + json.dumps({k: v for k, v in r.items() if k not in ("rows_match",)})[:400]
    dt = r.get("dtypes")
    if dt: extra += f" DTYPES={dt}"
    print(f"{name}: {status}{extra}")
print(f"\n{ok} OK, {fail} FAIL")
