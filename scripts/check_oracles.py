"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() on the same parquet tables, compare row count, column
names, and an order-insensitive value hash. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from vectortiles_spark.plans.queries import TABLES
from vectortiles_spark.session import get_spark


def normalize(df) -> tuple[int, list[str], str]:
    """(n_rows, sorted_columns, order-insensitive value hash) of a pandas df."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        parts = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                parts.append("NULL")
            elif isinstance(v, float):
                # keep a float marker: the driver's normalizer distinguishes
                # 1435.0 (DuckDB HUGEINT->float64) from 1435 (Spark BIGINT),
                # so an int-valued float must NOT collapse to the int string
                s = f"{v:.6f}".rstrip("0").rstrip(".")
                parts.append(s + ".0" if "." not in s else s)
            elif isinstance(v, bool):
                parts.append(str(int(v)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return len(rows), cols, hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "FAIL", "err": f"spark: {e}"[:200]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            results[name] = {"status": "ROWS-ONLY", "rows": len(sdf)}
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "FAIL", "err": f"duckdb: {e}"[:200]}
            n_fail += 1
            continue
        sn, sc, sh = normalize(sdf)
        on, oc, oh = normalize(odf)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS {name}: {sn} rows")
            results[name] = {"status": "PASS", "rows": sn}
            n_pass += 1
        else:
            print(f"FAIL {name}: spark=({sn} rows, {sc}, {sh}) oracle=({on} rows, {oc}, {oh})")
            results[name] = {
                "status": "FAIL", "spark_rows": sn, "oracle_rows": on,
                "schema_match": sc == oc, "hash_match": sh == oh,
            }
            if sn and on and sc == oc:
                import pandas as pd

                s_sorted = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
                o_sorted = odf[sorted(odf.columns)].astype(str).apply("|".join, axis=1).sort_values().reset_index(drop=True)
                diff = s_sorted.compare(o_sorted) if len(s_sorted) == len(o_sorted) else None
                if diff is not None and len(diff):
                    print(diff.head(4).to_string())
                elif len(s_sorted) != len(o_sorted):
                    print("  spark head:", s_sorted.head(2).tolist())
                    print("  oracle head:", o_sorted.head(2).tolist())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    # committable artifact (VERDICT r5 'next round' #2): $CHECK_ORACLES_JSON
    # gets one row per query so the full-battery result is a checked-in,
    # diffable fact instead of a session anecdote
    out_path = os.environ.get("CHECK_ORACLES_JSON")
    if out_path:
        import json

        Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
