"""Testdata schema contract: fail LOUDLY and specifically when the
driver regenerates /root/testdata with different column names or types,
instead of letting dozens of queries fail with opaque analysis errors
(round 2 lost its entire bench signal to exactly this).

The contract is what the engine's operators actually rely on; types
list the encodings ``load_table`` knows how to normalize.
"""

from __future__ import annotations

import pytest

from fhir_to_lakehouse_spark.sources.tables import TABLES, load_table

# column -> acceptable Spark dtypes AFTER load_table normalization.
# Integer keys may widen/narrow between generator versions (int vs
# bigint joins fine); value/date columns list the encodings queries and
# oracles are known to agree on.
_INT = {"int", "bigint"}
_MONEY = {"double", "decimal(12,2)"}
# DuckDB oracles compare dates via string forms that tolerate either;
# timestamp_ntz is fine for BATCH date columns (no watermark involved)
_DATEISH = {"date", "timestamp", "timestamp_ntz"}

CONTRACT = {
    "region": {"r_regionkey": _INT, "r_name": {"string"}},
    "nation": {"n_nationkey": _INT, "n_name": {"string"}, "n_regionkey": _INT},
    "customer": {
        "c_custkey": _INT,
        "c_name": {"string"},
        "c_nationkey": _INT,
        "c_acctbal": _MONEY,
        "c_mktsegment": {"string"},
    },
    "supplier": {"s_suppkey": _INT, "s_nationkey": _INT, "s_acctbal": _MONEY},
    "part": {"p_partkey": _INT, "p_type": {"string"}, "p_size": _INT},
    "orders": {
        "o_orderkey": _INT,
        "o_custkey": _INT,
        "o_totalprice": _MONEY,
        "o_orderdate": _DATEISH,
        "o_orderstatus": {"string"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": _INT,
        "l_partkey": _INT,
        "l_suppkey": _INT,
        "l_linenumber": _INT,
        "l_quantity": _MONEY | {"bigint"},
        "l_extendedprice": _MONEY,
        "l_discount": _MONEY,
        "l_tax": _MONEY,
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": _DATEISH,
    },
    "events": {
        "event_id": _INT,
        # load_table must normalize any parquet encoding to TIMESTAMP
        # proper (Spark's watermark contract) — see
        # tests/test_timestamp_encodings.py for the 3-encoding matrix
        "ts": {"timestamp"},
        "user_id": _INT,
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": _INT,
        "source": {"string"},
        "lang": {"string"},
        "text": {"string"},
        "n_chars": _INT,
    },
    "embeddings": {
        "vec_id": _INT,
        "embedding": {"array<float>", "array<double>"},
        "label": _INT,
    },
}


@pytest.mark.parametrize("table", sorted(CONTRACT))
def test_table_matches_contract(spark, sf_dir, table):
    dtypes = dict(load_table(spark, sf_dir, table).dtypes)
    problems = []
    for col, accepted in CONTRACT[table].items():
        if col not in dtypes:
            problems.append(f"column {col!r} MISSING (have: {sorted(dtypes)})")
        elif dtypes[col] not in accepted:
            problems.append(
                f"column {col!r} is {dtypes[col]!r}, engine handles {sorted(accepted)}"
            )
    assert not problems, (
        f"testdata contract broken for {table!r} — the driver likely "
        f"regenerated /root/testdata with a new encoding. Either extend "
        f"load_table normalization or update affected queries. Details: "
        + "; ".join(problems)
    )


def test_all_tables_present(spark, sf_dir):
    for t in TABLES:
        assert load_table(spark, sf_dir, t).columns, t
