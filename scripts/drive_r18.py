"""Full-registry oracle drive -> machine-readable artifact (VERDICT r17 #5).
Usage: python drive_r18.py <sf_dir> <out.json> [names...]"""
import datetime, json, math, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from raquet_spark.session import get_spark

spark = get_spark("drive_r18", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m

sf_dir, out_path = sys.argv[1], sys.argv[2]
only = sys.argv[3:]
qs, oracles = m.queries(), m.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(v):
    import pandas as pd
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # NaN == missing for cross-engine nodata
        v = round(v, 9)
        if v == -0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)

def norm(rows, cols):
    return sorted(tuple(canon(r[c]) for c in sorted(cols)) for r in rows)

results = {}
for name in (only or qs):
    sql = oracles.get(name)
    if sql is None:
        results[name] = {"status": "no_oracle_rows_only_by_design"}
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, sf_dir)
        a = norm([r.asDict() for r in sdf.collect()], sdf.columns)
        ddf = con.execute(sql).df()
        b = norm(
            [dict(zip(ddf.columns, row)) for row in ddf.itertuples(index=False)],
            list(ddf.columns),
        )
        results[name] = {
            "status": "match" if a == b else "MISMATCH",
            "spark_rows": len(a), "oracle_rows": len(b),
            "sec": round(time.time() - t0, 1),
        }
    except Exception as exc:
        results[name] = {"status": "ERROR", "err": repr(exc)[:200]}
    print(name, results[name]["status"], flush=True)

n_ok = sum(1 for r in results.values() if r["status"] == "match")
n_bad = sum(1 for r in results.values() if r["status"] in ("MISMATCH", "ERROR"))
summary = {"sf_dir": sf_dir, "n_queries": len(results), "n_match": n_ok,
           "n_fail": n_bad,
           "n_no_oracle": len(results) - n_ok - n_bad,
           "per_query": results}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
print(json.dumps({k: summary[k] for k in
                  ("n_queries", "n_match", "n_fail", "n_no_oracle")}))
