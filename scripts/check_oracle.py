"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the same sf, then
compare row count + sorted-column schema + order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Set CHECK_ORACLE_JSON=<path> to also write a driver-format artifact
(per-query rows_match/schema_match/hash_match/spark_rows/oracle_rows/err)
so the full local surface can be committed alongside the driver's own
CORRECTNESS_r{N}.json and diffed by the judge.
"""

from __future__ import annotations

import hashlib
import json
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
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            rec["err"] = f"spark: {exc}"
            n_fail += 1
            continue
        took = time.time() - t0
        rec["spark_rows"] = len(sdf)
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({took:.1f}s)")
            rec["err"] = "no_oracle"
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            rec["err"] = f"duckdb: {exc}"
            n_fail += 1
            continue
        rec["oracle_rows"] = len(odf)
        problems = []
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["rows_match"]:
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        rec["schema_match"] = sorted(map(str.lower, sdf.columns)) == sorted(
            map(str.lower, odf.columns)
        )
        if not rec["schema_match"]:
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            sdf.columns = [c.lower() for c in sdf.columns]
            odf.columns = [c.lower() for c in odf.columns]
            h1, h2 = value_hash(normalize(sdf)), value_hash(normalize(odf))
            rec["hash_match"] = h1 == h2
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
    out_path = os.environ.get("CHECK_ORACLE_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
