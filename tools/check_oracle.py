#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` via DuckDB — row count, sorted column names, and an
order-insensitive value hash over normalized cell values.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name,name]
"""

from __future__ import annotations

import argparse
import decimal
import hashlib
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(value):
    if value is None:
        return ""
    if isinstance(value, bool):
        return "1" if value else "0"
    if isinstance(value, (int,)):
        return str(value)
    if isinstance(value, decimal.Decimal):
        f = float(value)
        return normalize(f)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(round(value, 9))
    if isinstance(value, (bytes, bytearray)):
        return bytes(value).hex()
    if isinstance(value, (list, tuple)):
        return json.dumps([normalize(v) for v in value])
    if isinstance(value, dict):
        return json.dumps({k: normalize(v) for k, v in sorted(value.items())})
    return str(value)


def table_signature(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    normalized = sorted(
        "\x1f".join(normalize(row[i]) for i in order) for row in rows
    )
    digest = hashlib.md5("\x1e".join(normalized).encode("utf-8")).hexdigest()
    return names, len(rows), digest, normalized


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01"))
    parser.add_argument("--only", default="")
    args = parser.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from dss_plugin_google_cloud_vision_spark.session import get_spark

    spark = get_spark(app_name="check-oracle", cores=8)
    con = duckdb.connect()
    for table in TABLES:
        path = f"{args.sf_dir}/{table}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = {name for name in args.only.split(",") if name}
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        started = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = list(sdf.columns)
        except Exception as error:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {error}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle — rows-only check)")
            continue
        try:
            result = con.execute(oracles[name])
            duck_cols = [d[0] for d in result.description]
            duck_rows = result.fetchall()
        except Exception as error:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {error}")
            failures.append(name)
            continue
        s_names, s_count, s_hash, s_rows = table_signature(spark_cols, spark_rows)
        d_names, d_count, d_hash, d_rows = table_signature(duck_cols, duck_rows)
        elapsed = time.time() - started
        if s_names != d_names:
            print(f"FAIL  {name}: schema mismatch spark={s_names} duck={d_names}")
            failures.append(name)
        elif s_count != d_count:
            print(f"FAIL  {name}: row count spark={s_count} duck={d_count}")
            failures.append(name)
        elif s_hash != d_hash:
            diff = [
                (a, b) for a, b in zip(s_rows, d_rows) if a != b
            ][:3]
            print(f"FAIL  {name}: value hash mismatch; first diffs: {diff}")
            failures.append(name)
        else:
            print(f"OK    {name}: {s_count} rows, hash {s_hash[:12]} ({elapsed:.1f}s)")
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
