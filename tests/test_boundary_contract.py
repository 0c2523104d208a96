"""The registry's OUTPUT-SCHEMA contract: scalars only at the boundary.

Two consecutive driver rounds (r7, r8) failed the SAME query with
provably value-identical results because the cross-engine hasher cannot
normalize DecimalType — and r8 additionally errored on an ARRAY output
column (pandas can't factorize list cells). The fix is a convention,
not a workaround: every registered query emits only hashable scalar
columns (string / numeric / boolean / date / timestamp / binary).
Decimals stay INSIDE the encoder/compiler (that precision work is
load-bearing and tested); arrays/maps/structs serialize (CSV via
array_join, element_at unpacking) in the query's final select.

This sweep builds every registered query's DataFrame at sf0.001 and
asserts the contract on the ANALYZED schema — the exact surface the
driver hashes.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    MapType,
    StructType,
)

from fhir_to_lakehouse_spark.plans import QUERIES

_BANNED = (DecimalType, ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_scalar_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    offenders = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _BANNED)
    ]
    assert not offenders, (
        f"{name} emits non-scalar output columns {offenders}; the driver "
        "hasher cannot compare these across engines — cast decimals to "
        "double and serialize arrays/maps/structs in the final select"
    )
