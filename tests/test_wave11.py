"""Round-11 tests: hand-computed semantics for d27 (exact duplicated-
substring spans). The oracle gate proves Spark==DuckDB; this proves both
equal the intended suffix-array-equivalent math (Lee et al. 2022 coverage
semantics: a token is duplicated iff covered by an L-gram occurring >= 2
times corpus-wide, self-repeats included)."""

from __future__ import annotations

import os

from spark_streaming_logservice_spark import registry

registry.load_all()


def _docs(spark, root, rows):
    df = spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (text, src) in enumerate(rows)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "documents.parquet")
    )


def test_d27_spans_hand_computed(spark, tmp_path):
    """L=5. Docs 0/1/4 share overlapping 5-grams of 'a b c d e f g h';
    doc 2 is a self-repeat ('z'*6 has two identical 5-grams); doc 3 is
    unique (absent); doc 5 has two separated duplicated spans (island
    split across a unique middle)."""
    _docs(
        spark,
        str(tmp_path),
        [
            ("a b c d e f g h", "s1"),                       # 0
            ("x a b c d e f y", "s1"),                       # 1
            ("z z z z z z", "s2"),                           # 2
            ("p q r s t u v w", "s3"),                       # 3
            ("m a b c d e f g h n", "s1"),                   # 4
            ("a b c d e G1 G2 G3 G4 G5 G6 a b c d e", "s2"), # 5
        ],
    )
    out = registry.QUERIES["d27_dup_substring_spans"](spark, str(tmp_path))
    rows = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["longest_span"], r["dup_frac"])
        for r in out.collect()
    }
    # doc 0: hit grams at pos 1..4 -> one island [1, 8] covering all 8 tokens
    assert rows[0] == (1, 8, 8, 1.0)
    # doc 1: hit grams at pos 2,3 -> island [2, 7], 6 of 8 tokens
    assert rows[1] == (1, 6, 6, 0.75)
    # doc 2: self-repeat, grams pos 1,2 identical -> island [1, 6], all 6
    assert rows[2] == (1, 6, 6, 1.0)
    # doc 3: no duplicated gram -> absent
    assert 3 not in rows
    # doc 4: hit grams pos 2..5 -> island [2, 9], 8 of 10 tokens
    assert rows[4] == (1, 8, 8, 0.8)
    # doc 5: hit grams pos 1 and 12, gap > L -> TWO islands [1,5] + [12,16]
    assert rows[5] == (2, 10, 5, 0.625)


def test_d28_removal_hand_computed(spark, tmp_path):
    """Same fixture as d27: the cleaned text is exactly the tokens outside
    every duplicated span — whole-doc removal yields empty text, the
    split-island doc keeps only its unique middle."""
    _docs(
        spark,
        str(tmp_path),
        [
            ("a b c d e f g h", "s1"),                       # 0
            ("x a b c d e f y", "s1"),                       # 1
            ("z z z z z z", "s2"),                           # 2
            ("p q r s t u v w", "s3"),                       # 3
            ("m a b c d e f g h n", "s1"),                   # 4
            ("a b c d e G1 G2 G3 G4 G5 G6 a b c d e", "s2"), # 5
        ],
    )
    out = registry.QUERIES["d28_dup_span_removal"](spark, str(tmp_path))
    rows = {
        r["doc_id"]: (r["n_removed_tokens"], r["n_kept_tokens"], r["cleaned_text"])
        for r in out.collect()
    }
    assert rows[0] == (8, 0, "")
    assert rows[1] == (6, 2, "x y")
    assert rows[2] == (6, 0, "")
    assert 3 not in rows
    assert rows[4] == (8, 2, "m n")
    assert rows[5] == (10, 6, "G1 G2 G3 G4 G5 G6")
