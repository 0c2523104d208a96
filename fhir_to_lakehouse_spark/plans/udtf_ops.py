"""Python UDTF (Spark 4) coverage: a table function twin of the
Catalyst chunker, exercised through SQL LATERAL join.

Rounds out the modern-API surface alongside VARIANT
(plans/semistructured.py), the custom Python DataSource
(sources/fhir_datasource.py), and the Arrow pandas paths. The UDTF
row-at-a-time Python loop is NOT the 100 TB path — text_chunk_windows
(plans/llm_extra.py) does the same chunking scan-bound in pure
Catalyst; this twin exists for operators whose per-row expansion logic
genuinely cannot be expressed as sequence/explode (custom tokenizers,
stateful parsers), and shares the Catalyst version's oracle so the
two implementations are value-locked together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir_to_lakehouse_spark.plans.registry import query

_WIDTH = 200
_STRIDE = 150


class _ChunkDocs:
    """UDTF: (doc_id, text, n_chars) -> one row per context window."""

    def eval(self, doc_id: int, text: str, n_chars: int):  # noqa: A002
        if not n_chars or n_chars <= 0:
            return
        for start in range(0, max(n_chars - 1, 0) + 1, _STRIDE):
            yield (
                doc_id,
                start,
                text[start : start + _WIDTH],
                min(_WIDTH, n_chars - start),
            )


@query(
    "text_chunk_udtf",
    oracle="""
    WITH starts AS (
      SELECT doc_id, n_chars, UNNEST(generate_series(0, GREATEST(n_chars - 1, 0), 150))
               AS chunk_start
      FROM documents
    )
    SELECT doc_id,
           CAST(chunk_start AS BIGINT)                   AS chunk_start,
           SUBSTR(text, chunk_start + 1, 200)            AS chunk_text,
           CAST(LEAST(200, n_chars - chunk_start) AS BIGINT) AS chunk_len
    FROM starts JOIN documents USING (doc_id, n_chars)
    WHERE n_chars > 0
    """,
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking via a Python UDTF in a SQL LATERAL join
    — same windows (200 chars, stride 150), same oracle as the
    Catalyst text_chunk_windows, so the UDTF and built-in paths are
    locked to identical output."""
    from pyspark.sql.functions import udtf

    from fhir_to_lakehouse_spark.sources.tables import load_table

    chunker = udtf(
        _ChunkDocs,
        returnType="doc_id: bigint, chunk_start: bigint, "
        "chunk_text: string, chunk_len: bigint",
    )
    spark.udtf.register("chunk_docs", chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_documents"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_start, c.chunk_text, c.chunk_len
        FROM _udtf_documents d,
             LATERAL chunk_docs(d.doc_id, d.text, CAST(d.n_chars AS INT)) c
        """
    )
