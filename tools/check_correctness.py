"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf parquet tables, then compares row count, column-name set,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant decimals before hashing).

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            if math.isinf(v):
                return "inf" if v > 0 else "-inf"
            return f"{v:.9g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x01".join(r).encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return len(rows), cols, h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        if ok:
            print(f"PASS {name}: rows={sn} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {sn} vs {on}; cols {'OK' if sc == oc else f'{sc} vs {oc}'}; hash {'OK' if sh == oh else 'MISMATCH'}")
            if sn == on and sc == oc:
                merged = sdf[sorted(sdf.columns)].round(6).merge(
                    odf[sorted(odf.columns)].round(6), how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(8).to_string())
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak/no-oracle")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
