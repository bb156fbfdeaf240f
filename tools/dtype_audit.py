"""Strict dtype audit: driver hash-mismatch early-warning.

The driver's correctness gate hashes exact values; a column that is
int64 on the Spark side but HUGEINT/float64 on the DuckDB side (e.g.
``SUM(BIGINT)``) hashes differently even when numerically identical
(the ``cleaning_chain`` round-1 red cell). This tool runs every oracle
and the matching Spark query at the given sf and reports any column
whose pandas dtype *kind* differs between the two engines.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb  # noqa: E402


def kind(dtype) -> str:
    k = dtype.kind  # i=int, u=uint, f=float, O=object, b=bool, M=datetime
    return {"u": "i"}.get(k, k)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from fraud_detection_project_spark.session import get_spark

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, sf_dir).limit(200).toPandas()
            opdf = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 200").df()
        except Exception as e:
            bad.append(name)
            print(f"ERR   {name}: {str(e)[:200]}")
            continue
        diffs = []
        for c in sorted(set(spdf.columns) & set(opdf.columns)):
            ks, ko = kind(spdf[c].dtype), kind(opdf[c].dtype)
            # pandas object columns: compare the python types of the
            # first non-null value (Decimal vs int vs str all hash apart)
            if ks == "O" or ko == "O":
                vs = next((type(v).__name__ for v in spdf[c] if v is not None), "none")
                vo = next((type(v).__name__ for v in opdf[c] if v is not None), "none")
                if vs != vo:
                    diffs.append(f"{c}: spark[{vs}] vs duck[{vo}]")
            elif ks != ko:
                diffs.append(f"{c}: spark[{spdf[c].dtype}] vs duck[{opdf[c].dtype}]")
        if diffs:
            bad.append(name)
            print(f"DTYPE {name}: " + "; ".join(diffs))
        else:
            print(f"ok    {name}")

    print(f"\n{len(bad)} dtype risks" + (f": {bad}" if bad else ""))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
