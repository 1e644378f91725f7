"""Driver-surface contract guards.

Round-1 driver failure class: entries returning array-typed columns crash
the driver's pandas canonicalizer (sort_values → unhashable list cells).
Guard every catalog entry's schema: atomic types only."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mediachain_indexer_spark import catalog

SF_DIR = "/root/testdata/sf0.01"

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(catalog.queries()))
def test_catalog_entry_schema_is_atomic(spark, name):
    df = catalog.queries()[name](spark, SF_DIR)
    nested = [f.name for f in df.schema.fields if isinstance(f.dataType, _NESTED)]
    assert nested == [], (
        f"{name} returns nested columns {nested} — the driver canonicalizer "
        "cannot hash list/dict cells; project to scalars at the entry surface"
    )
