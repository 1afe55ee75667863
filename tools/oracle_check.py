"""Local replica of the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() in DuckDB on the same parquet tables;
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(lines)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from medacy_spark.session import get_spark

    # default 8 for fast local gating; set SPARK_GRAFT_ORACLE_CPUS=32 to
    # replicate the driver's parallelism (r7's bm25 red row was a
    # local[8]-green / local[32]-red float-rounding tie — run BOTH before
    # shipping float-valued query changes)
    import os

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_ORACLE_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        shash, sn = frame_hash(scols, srows)
        if name not in os_:
            print(f"{name:28s} rows-only  spark_rows={sn}")
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        ohash, on = frame_hash(ocols, orows)
        ok = (sorted(scols) == sorted(ocols)) and shash == ohash and sn == on
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} spark={sn}/{shash} oracle={on}/{ohash}"
              + ("" if sorted(scols) == sorted(ocols) else f" COLS {scols} vs {ocols}"))
        if not ok:
            failures.append(name)
            # show a tiny diff sample
            sset = {tuple(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
            oset = {tuple(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
            for x in list(sset - oset)[:3]:
                print("   spark-only:", x)
            for x in list(oset - sset)[:3]:
                print("   oracle-only:", x)
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
