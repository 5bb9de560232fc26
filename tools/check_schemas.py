#!/usr/bin/env python
"""Round-start schema preflight.

The driver regenerates /root/testdata between rounds and has shipped
schema drift before (events.ts TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)
between rounds 2 and 3, which errored five correctness rows and the whole
round-2 bench). This tool loads EVERY table at every available scale
factor through the same code path the queries use
(``sources.tables.load_table``) and prints the Spark dtypes, so drift is
caught before the gate instead of at it.

Usage: python tools/check_schemas.py [testdata_root]
Exit code 1 if any table fails to load.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fund_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from fund_data_etl_pipeline_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    spark = get_spark()
    failures = 0
    for sf in sorted(os.listdir(root)):
        sf_dir = os.path.join(root, sf)
        if not os.path.isdir(sf_dir):
            continue
        print(f"== {sf_dir}")
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                print(f"  {name:<12} MISSING")
                failures += 1
                continue
            try:
                df = load_table(spark, sf_dir, name)
                dtypes = ", ".join(f"{c}:{t}" for c, t in df.dtypes)
                print(f"  {name:<12} {dtypes}")
            except Exception as exc:  # noqa: BLE001 — preflight reports, not raises
                print(f"  {name:<12} LOAD FAILED: {exc}")
                failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
