"""Emulate the driver's correctness gate at sf0.01: run each queries()
entry and its oracle_sql() side-by-side, compare rows/schema/values."""
import hashlib
import json
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main():
    ray.init(address="local", num_cpus=16, include_dashboard=False)
    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = em.queries()
    oracles = em.oracle_sql()
    report = {}
    only = sys.argv[2:] or list(qs)
    for name in only:
        fn = qs[name]
        try:
            rdf = to_pandas(fn(SF))
        except Exception as e:
            report[name] = {"status": "RAY_ERROR", "err": str(e)[:300]}
            continue
        if name not in oracles:
            report[name] = {"status": "rows_only", "rows": len(rdf), "cols": sorted(rdf.columns)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            report[name] = {"status": "SQL_ERROR", "err": str(e)[:300]}
            continue
        entry = {"rows": (len(rdf), len(odf)),
                 "cols_match": sorted(rdf.columns) == sorted(odf.columns)}
        if not entry["cols_match"]:
            entry["ray_cols"] = sorted(rdf.columns)
            entry["sql_cols"] = sorted(odf.columns)
            entry["status"] = "COLS_MISMATCH"
        elif len(rdf) != len(odf):
            entry["status"] = "ROWS_MISMATCH"
        else:
            h1, h2 = canon(rdf), canon(odf)
            entry["status"] = "MATCH" if h1 == h2 else "HASH_MISMATCH"
        report[name] = entry
    ray.shutdown()
    print(json.dumps(report, indent=1, default=str))
    bad = [k for k, v in report.items() if v.get("status") not in ("MATCH", "rows_only")]
    print("BAD:", bad)


main()
