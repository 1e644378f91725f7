"""catalog._xxh64_any_cte_chain: the full-length XXH64-in-SQL used by the
er_blocks oracle must equal Spark's xxhash64 (seed 42) bit-for-bit on ASCII
inputs of every structural class (empty, <4, <8, 8..31, exactly 32, stripe
multiples, stripe+tail combinations, 200+)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from mediachain_indexer_spark.catalog import _xxh64_any_cte_chain


def test_xxh64_any_chain_matches_spark(spark):
    rng = random.Random(77)
    lengths = (
        list(range(0, 40))
        + [63, 64, 65, 95, 96, 97, 100, 127, 128, 129, 200, 300]
    )
    strs = [
        "".join(rng.choice("abcdefghij0123456789_ ") for _ in range(L))
        for L in lengths
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    expected = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in strs)
        + ") v(doc_id, tok)",
        [x for i, s in enumerate(strs) for x in (str(i), s)],
    )
    rows = con.execute(
        "WITH "
        + _xxh64_any_cte_chain("src")
        + """ SELECT tok,
              CAST(CAST(xh AS HUGEINT)
                   - CASE WHEN xh >= CAST('0x8000000000000000' AS UBIGINT)
                          THEN CAST('18446744073709551616' AS HUGEINT)
                          ELSE 0 END AS BIGINT)
              FROM src_f"""
    ).fetchall()
    assert len(rows) == len(strs)
    for tok, signed in rows:
        assert signed == expected[tok], f"len={len(tok)}"
