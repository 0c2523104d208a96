"""Rank-population semantics of search_hybrid_rrf on a
modality-incomplete corpus: documents without embeddings (and an
embedding without a document) must still occupy lexical (resp.
semantic) rank slots — shifting the ranks of fused docs — while never
appearing in the fused output themselves. sf0.01, where the driver's
oracle runs, has IDENTICAL doc/vec id sets, so this is the only gate
on that path (sf0.1 has 3000 vec-less docs; the single-pass rewrite
must agree with the two-population oracle there and here)."""

from __future__ import annotations

import duckdb
import pytest

from fhir_to_lakehouse_spark.plans import ORACLES, QUERIES
from tools.check_oracles import compare


@pytest.fixture()
def incomplete_corpus(spark, tmp_path):
    # ids 0..9 are documents; ids 0..7 have embeddings; id 100 is an
    # embedding with NO document. Query set = ids % 100 == 0 -> doc 0
    # (both modalities) and vec 100 (semantic only, never fuses).
    docs = [
        (i, " ".join(f"w{j}" for j in range(i, i + 5)), "en", "t", 30)
        for i in range(10)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    embs = [
        (i, [float(i), 1.0, float(i % 3)], i % 2) for i in range(8)
    ] + [(100, [9.0, 9.0, 9.0], 0)]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_fused_set_and_rank_population(spark, incomplete_corpus):
    rows = QUERIES["search_hybrid_rrf"](spark, incomplete_corpus).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    # vec-only query 100 has no lexical side anywhere -> absent
    assert set(by_query) == {0}
    out = {r.doc_id: r for r in by_query[0]}
    # only docs with BOTH modalities fuse (1..7; 8, 9 and 100 excluded)
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # lexical ranks count the FULL document population: docs 8, 9 have
    # no embedding but still consume lexical slots. Doc 1 shares 4 of 5
    # tokens with query 0 -> lex_rank 1; docs 5..9 share none, so the
    # zero-overlap tie breaks by doc_id and docs 8, 9 sit BETWEEN
    # nothing — they take the last slots; doc 5's rank must reflect
    # competing with 9 docs, not 7.
    assert out[1].lex_rank == 1
    assert out[2].lex_rank == 2  # 3 shared tokens
    assert out[5].lex_rank == 5  # zero overlap, doc_id tie-break after 3,4
    assert out[7].lex_rank == 7
    # semantic ranks count the FULL embedding population: vec 100
    # (dot 9*0+9*1+9*0 = 9... vs doc 0 qx=[0,1,0]) outranks low vecs,
    # shifting real docs down even though 100 never fuses.
    # dots vs qx=[0,1,0] are all 1.0 except vec 100's 9.0 -> vec 100
    # holds sem_rank 1, ties 1..7 break by doc_id.
    assert out[1].sem_rank == 2
    assert out[7].sem_rank == 8


def test_matches_duckdb_oracle_on_incomplete_corpus(spark, incomplete_corpus):
    sdf = QUERIES["search_hybrid_rrf"](spark, incomplete_corpus)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark wrote a parquet DIRECTORY; DuckDB reads it via glob
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{incomplete_corpus}/{t}.parquet/*.parquet'"
        )
    cur = con.execute(ORACLES["search_hybrid_rrf"])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    problems, _ = compare(sdf.columns, srows, dcols, drows)
    assert not problems, problems
