"""Cross-engine parity on CRAFTED documents, not just the driver corpus.

The suite rows certify Spark==DuckDB on the fixed testdata; these tests run
the same (builder, oracle) pairs over synthetic documents built to hit the
edges the corpus never exercises — empty text, single tokens, unicode,
maximal repetition, 1-char words — using the verify_local canonicalizer so
a mismatch here is exactly a driver-gate mismatch."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from verify_local import rows_key  # noqa: E402

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (1, "", "en", "s0"),
    (2, "solo", "en", "s0"),
    (3, "a a a a a a a a", "en", "s1"),  # max repetition, 1-char words
    (4, "x y x y x y x y x y", "en", "s1"),  # repeated 2-token chunk
    (5, "öäü ßteßt ünïcode tökens ünïcode tökens", "de", "s2"),
    (6, "word " * 50 + "tail", "en", "s2"),  # long doc, trailing token
    (7, "Aa aA aa AA", "en", "s3"),  # case-distinct tokens
    (8, "supercalifragilisticexpialidocious antidisestablishmentarianism", "en", "s3"),
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory, request):
    import pandas as pd

    d = tmp_path_factory.mktemp("edge_sf")
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, t, lang, src in EDGE_DOCS
        ]
    )
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


def _assert_parity(spark, sf_dir, name):
    from datafusion_table_providers_spark.suite import FULL_SUITE

    case = FULL_SUITE[name]
    df = case.fn(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    cur = con.execute(case.oracle)
    o_cols = [c[0] for c in cur.description]
    o_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (s_cols, o_cols)
    assert rows_key(s_cols, s_rows) == rows_key(o_cols, o_rows), name


@pytest.mark.parametrize(
    "name",
    [
        "d01_exact_dedup",
        "d02b_minhash_lsh_pairs",
        "d03b_simhash_pairs",
        "d04_ngram_jaccard",
        "d07_langid",
        "d08_quality",
        "d09_token_count",
        "d10_fingerprint",
        "d13_decontaminate",
        "d14_stratified_sample",
        "d15_sequence_packing",
        "d19_repetition",
        "d21_bm25",
        "d22_editdist_neardup",
        "d23_phrase_search",
        "d24_pii_scrub",
        "d25_paragraph_dedup",
        "d26_fuzzy_decontaminate",
        "d27_vocab_stats",
        "d28_gopher_rules",
        "d29_bpe_pair_stats",
        "d30_unigram_logprob",
        "d31_intradoc_dedup",
        "d32_mixture_weights",
        "d34_dedup_keep_best",
        "d35_ensemble_neardup",
        "p03_corpus_report",
    ],
)
def test_edge_docs_parity(spark, edge_sf_dir, name):
    _assert_parity(spark, edge_sf_dir, name)
