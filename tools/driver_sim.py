"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, sorted column names, and
order-insensitive values (exact for ints/strings, 1e-9 rel-tol for floats so
near-misses are visible before they become hash mismatches).

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
import numpy as np


def compare(name: str, sdf_pd: pd.DataFrame, odf: pd.DataFrame) -> str:
    if sorted(sdf_pd.columns) != sorted(odf.columns):
        return f"SCHEMA MISMATCH spark={sorted(sdf_pd.columns)} duck={sorted(odf.columns)}"
    if len(sdf_pd) != len(odf):
        return f"ROWCOUNT MISMATCH spark={len(sdf_pd)} duck={len(odf)}"
    cols = sorted(sdf_pd.columns)
    a = sdf_pd[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = odf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True):
                bad = np.where(~np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12))[0][:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}"
            if not (av.astype(float).equals(bv.astype(float)) or np.array_equal(
                    av.astype(float).to_numpy(), bv.astype(float).to_numpy(), equal_nan=True)):
                return f"FLOAT NEAR-MISS col={c} (would fail exact hash)"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = (av.astype(str) != bv.astype(str)).to_numpy().nonzero()[0][:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()} spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as E
    from tile_gen_spark.plans.session import get_spark
    from tile_gen_spark.sources.testdata import TABLES

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    t0 = time.time()
    df = E.entry(spark)
    n = df.count()
    print(f"entry: rows={n} schema={[f.name for f in df.schema.fields]} ({time.time()-t0:.1f}s)")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            results[name] = f"SPARK ERROR: {str(ex)[:300]}"
            print(f"{name:28s} {results[name]}")
            continue
        t1 = time.time()
        if name in oracles:
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as ex:
                results[name] = f"DUCK ERROR: {str(ex)[:300]}"
                print(f"{name:28s} {results[name]}")
                continue
            results[name] = compare(name, sdf, odf)
        else:
            results[name] = f"rows-only: {len(sdf)}" + (" EMPTY!" if len(sdf) == 0 else "")
        print(f"{name:28s} {results[name]}  (spark {t1-t0:.1f}s, {len(sdf)} rows)")

    bad = {k: v for k, v in results.items() if v != "OK" and not v.startswith("rows-only")}
    print(f"\n{len(results) - len(bad)}/{len(results)} OK")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
