"""Local stand-in for the driver's DuckDB oracle harness.

Runs every ``queries()`` entry on Spark and (where present) the matching
``oracle_sql()`` on DuckDB over the same parquet, comparing row count, column
names, and an order-insensitive value hash.  Usage:

    python tools/oracle_check.py [--entry] [sf_dir] [only_query ...]

``--entry`` sweeps ``__spark_entry__.queries()/oracle_sql()`` in driver
registration order (the exact surface the ledger records, incl. the er_*
fixture slices and the rotated withheld window) instead of the full catalog.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    def norm(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    entry_mode = "--entry" in argv
    if entry_mode:
        argv.remove("--entry")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from mediachain_indexer_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if entry_mode:
        import __spark_entry__ as mod

        qs = mod.queries()
        oracles = mod.oracle_sql()
    else:
        from mediachain_indexer_spark import catalog

        qs = catalog.queries()
        oracles = catalog.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {s_cols} != {d_cols}")
        else:
            sh, dh = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
            if sh != dh:
                problems.append(f"hash {sh} != {dh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if s_rows and d_rows and "hash" in " ".join(problems):
                srt = sorted(s_cols)
                sset = {
                    tuple(f"{v:.9g}" if isinstance(v, float) else str(v) for v in r)
                    for r in [tuple(r[s_cols.index(c)] for c in srt) for r in s_rows]
                }
                dset = {
                    tuple(f"{v:.9g}" if isinstance(v, float) else str(v) for v in r)
                    for r in [tuple(r[d_cols.index(c)] for c in srt) for r in d_rows]
                }
                print("  spark-only:", list(sset - dset)[:3])
                print("  duck-only :", list(dset - sset)[:3])
            failures += 1
        else:
            print(f"ok   {name}: {len(s_rows)} rows, hash match")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
