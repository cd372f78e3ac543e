"""Driver-mimic: run every __spark_entry__ query against its DuckDB
oracle at a given sf dir, compare row counts + order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import functools
print = functools.partial(print, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # data-dependent oracles (trained IVF centroids) must read the
    # same sf the comparison runs at; the driver itself runs sf0.01,
    # which is that oracle's default
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from ocr_compare_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        status = []
        # Driver-hash mimic: the driver's value hash distinguishes 0 from 0.0,
        # so an int column on one side vs float on the other (DuckDB HUGEINT
        # window sums surface as float64) must fail here even though the
        # lenient eq below would pass it.
        for c in set(sdf.columns) & set(odf.columns):
            ka = "f" if np.issubdtype(sdf[c].dtype, np.floating) else "i" if np.issubdtype(sdf[c].dtype, np.integer) else "o"
            kb = "f" if np.issubdtype(odf[c].dtype, np.floating) else "i" if np.issubdtype(odf[c].dtype, np.integer) else "o"
            if ka != kb:
                status.append(f"dtype kind mismatch {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        elif list(a.columns) != list(b.columns):
            status.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        else:
            neq = ~(a.eq(b) | (a.isna() & b.isna()))
            if neq.any().any():
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                status.append(f"values differ in {bad_cols}; first row {idx}:")
                for c in bad_cols[:3]:
                    status.append(f"    {c}: spark={a.loc[idx, c]!r} oracle={b.loc[idx, c]!r}")
        if status:
            print(f"FAIL {name}: " + " | ".join(status))
            failed.append(name)
        else:
            print(f"OK   {name}: {len(a)} rows  ({time.time()-t0:.1f}s)")
    print()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
