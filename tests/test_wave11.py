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


def test_d29_keeper_election_canonical_copy_survives(spark, tmp_path):
    """Keeper election (Lee et al. semantics): each duplicated gram family
    keeps its min-(doc_id, pos) occurrence. Doc 0 is the canonical copy of
    every shared gram — it must survive INTACT (absent from the output);
    the self-repeat doc 2 keeps its first occurrence's leading token."""
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
    out = registry.QUERIES["d29_dup_span_removal_canonical"](spark, str(tmp_path))
    rows = {
        r["doc_id"]: (r["n_removed_tokens"], r["n_kept_tokens"], r["cleaned_text"])
        for r in out.collect()
    }
    # doc 0 holds the canonical occurrence of every duplicated gram it
    # contains -> zero non-canonical hits -> survives untouched (absent)
    assert 0 not in rows
    # doc 1: non-canonical grams at pos 2,3 -> span [2,7]
    assert rows[1] == (6, 2, "x y")
    # doc 2 self-repeat: canonical pos 1, non-canonical pos 2 -> span
    # [2,6]; the first occurrence's non-overlapped token survives
    assert rows[2] == (5, 1, "z")
    assert 3 not in rows
    # doc 4: non-canonical grams pos 2..5 -> span [2,9]
    assert rows[4] == (8, 2, "m n")
    # doc 5: BOTH its "a b c d e" occurrences are non-canonical (doc 0
    # owns the family) -> two islands [1,5] + [12,16]
    assert rows[5] == (10, 6, "G1 G2 G3 G4 G5 G6")


def test_d28_vs_d29_removal_ordering(spark, tmp_path):
    """Remove-all (d28) strictly dominates keeper-election (d29) in tokens
    removed, and d29's survivors preserve one copy: the corpus-wide kept
    text still contains the duplicated passage exactly where d28's does
    not."""
    _docs(
        spark,
        str(tmp_path),
        [
            ("q u o t e d p a s s a g e", "s1"),             # 0 canonical
            ("intro q u o t e d p a s s a g e outro", "s2"), # 1
        ],
    )
    d28 = {
        r["doc_id"]: r
        for r in registry.QUERIES["d28_dup_span_removal"](
            spark, str(tmp_path)
        ).collect()
    }
    d29 = {
        r["doc_id"]: r
        for r in registry.QUERIES["d29_dup_span_removal_canonical"](
            spark, str(tmp_path)
        ).collect()
    }
    # d28 excises BOTH copies; d29 keeps doc 0 whole
    assert set(d28) == {0, 1} and set(d29) == {1}
    assert d28[0]["cleaned_text"] == ""
    assert d29[1]["cleaned_text"] == d28[1]["cleaned_text"] == "intro outro"
    for doc in d29:
        assert d29[doc]["n_removed_tokens"] <= d28[doc]["n_removed_tokens"]


def _duck_documents(root, sql):
    import duckdb

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('"
        + os.path.join(root, "documents.parquet", "*.parquet")
        + "')"
    )
    res = con.execute(sql)
    rows = res.fetchall()
    con.close()
    return rows


def test_d29_self_overlap_edge_pinned_in_both_engines(spark, tmp_path):
    """r12 VERDICT item 5 + r12 ADVICE: the two documented overlap caveats,
    hand-computed and asserted IDENTICAL in Spark and DuckDB so a refactor
    cannot silently change which tokens survive.

    (a) self-overlap: a self-overlapping repeat keeps only the tokens
        outside the merged non-canonical island — fewer than L.
    (b) cross-family overlap in a non-lowest doc: family B's canonical
        occurrence lives in doc 1, but family A's non-canonical island
        (canonical in doc 0) overlaps it — B's spared copy is clipped, so
        NO intact copy of B survives corpus-wide. The guarantee is per
        gram family, not per maximal passage."""
    _docs(
        spark,
        str(tmp_path),
        [
            # (b): family A = "a b c d e", canonical here (doc 0, pos 1)
            ("a b c d e", "s1"),                 # 0
            # (b): A non-canonical at pos 1 (island [1,5]); family B =
            # "b c d e f" CANONICAL at pos 2 — clipped by A's island
            ("a b c d e f g h i", "s1"),         # 1
            # (b): B non-canonical at pos 2 -> excised
            ("x b c d e f y", "s2"),             # 2
            # (a): 7-token self-repeat, grams pos 1..3 identical; pos 1
            # canonical, pos 2+3 non-canonical -> merged island [2,7]
            ("z z z z z z z", "s3"),             # 3
        ],
    )
    out = registry.QUERIES["d29_dup_span_removal_canonical"](spark, str(tmp_path))
    spark_rows = sorted(
        (r["doc_id"], r["n_removed_tokens"], r["n_kept_tokens"], r["cleaned_text"])
        for r in out.collect()
    )
    # doc 0 canonical copy of A survives intact (absent); doc 1 loses A's
    # island INCLUDING four tokens of B's canonical copy; doc 2 loses its
    # B copy; doc 3 keeps ONE token of the self-repeat, not a full L
    assert spark_rows == [
        (1, 5, 4, "f g h i"),
        (2, 5, 2, "x y"),
        (3, 6, 1, "z"),
    ]
    # the caveat made concrete: no intact "b c d e f" survives anywhere
    assert not any("b c d e f" in r[3] for r in spark_rows)
    # and DuckDB implements the identical election — engines agree exactly
    duck_rows = sorted(
        map(tuple, _duck_documents(
            str(tmp_path), registry.ORACLES["d29_dup_span_removal_canonical"]
        ))
    )
    assert duck_rows == spark_rows


def test_s30_integer_dcg_literals_match_their_formulas():
    """The inlined nDCG constants are shared literals between Spark and
    the oracle SQL — pin them to their defining formulas so an edit to
    one can't silently drift: W_i = floor(1e6/log2(i+1)+0.5) for
    positions 1..TOP_K, gains = 2^g - 1 over the relevance-pool grades."""
    import math

    from spark_streaming_logservice_spark.operators.similarity import (
        NDCG_GAINS,
        NDCG_W,
        S30_REL_POOL,
        TOP_K,
    )

    assert NDCG_W == [
        int(math.floor(1_000_000 / math.log2(i + 1) + 0.5))
        for i in range(1, TOP_K + 1)
    ]
    assert NDCG_GAINS == [2 ** g - 1 for g in range(S30_REL_POOL + 1)]
    # the integer-division identities the query relies on: round-half-up
    # nDCG micro-units and MRR micro-units never leave BIGINT range
    max_dcg = NDCG_GAINS[-1] * sum(NDCG_W)
    assert 2 * max_dcg * 1_000_000 + max_dcg < 2 ** 63
