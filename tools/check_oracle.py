"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()``
twin on the same sf directory, compares row count, column names, and an
order-insensitive value hash. Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                vals.append("true" if v else "false")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif v is None:
                vals.append("\0NULL")
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    h = hashlib.sha256()
    for line in out:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        ocur = con.execute(oracles[name])
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = normalize(srows, scols)
        oh = normalize(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{name:32s} {status} rows={len(srows):7d}/{len(orows):7d} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} hash={'=' if ok_hash else 'DIFF'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                s_set = {}
                for r in srows[:200000]:
                    s_set[tuple(r)] = s_set.get(tuple(r), 0) + 1
                for r in orows[:200000]:
                    key = tuple(r)
                    if key in s_set:
                        s_set[key] -= 1
                        if not s_set[key]:
                            del s_set[key]
                    else:
                        print(f"    oracle-only: {r}")
                        break
                for k, v in list(s_set.items())[:3]:
                    print(f"    spark-only: {k}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
