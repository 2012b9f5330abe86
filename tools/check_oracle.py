"""Local stand-in for the driver's DuckDB oracle check.

Runs every __spark_entry__.queries() callable at sf0.01 next to its
oracle_sql() and compares row-count, schema (column names), and an
order-insensitive value hash — the same contract the driver enforces.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as se
    from search_engine_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = []
    only = set(sys.argv[2:]) or None
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        sdt = {c: str(sdf[c].dtype) for c in sdf.columns}
        ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
        if not problems and sdt != ddt:
            problems.append(f"dtypes {sdt} vs {ddt}")
        if not problems and value_hash(sdf) != value_hash(ddf):
            merged = sdf.merge(ddf, how="outer", indicator=True,
                               on=list(sdf.columns)) if list(sdf.columns) else None
            diff = merged[merged._merge != "both"].head(6) if merged is not None else None
            problems.append(f"value hash; sample diff:\n{diff}")
        if problems:
            failures.append((name, "; ".join(p.split(chr(10))[0] for p in problems)))
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
