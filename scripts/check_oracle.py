"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the same sf, then
compare row count + sorted-column schema + order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join("NULL" if pd.isna(v) else repr(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: float(v) if isinstance(v, (int, float)) else v)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from simple_data_workflow_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only  {name}: {len(sdf)} rows  ({took:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            sdf.columns = [c.lower() for c in sdf.columns]
            odf.columns = [c.lower() for c in odf.columns]
            h1, h2 = value_hash(normalize(sdf)), value_hash(normalize(odf))
            if h1 != h2:
                problems.append("value hash mismatch")
                # show a diff sample
                merged = sdf.reindex(sorted(sdf.columns), axis=1)
                omerged = odf.reindex(sorted(odf.columns), axis=1)
                key = sorted(sdf.columns)[0]
                try:
                    m = merged.sort_values(list(merged.columns)).reset_index(drop=True)
                    o = omerged.sort_values(list(omerged.columns)).reset_index(drop=True)
                    neq = (m != o) & ~(m.isna() & o.isna())
                    bad = neq.any(axis=1)
                    if bad.any():
                        i = bad.idxmax()
                        print(f"      first diff row {i}:\n  spark: {m.iloc[i].to_dict()}\n  duck:  {o.iloc[i].to_dict()}")
                except Exception as e:
                    print(f"      (diff sample failed: {e})")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({took:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows  ({took:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
