"""Hash embedder equivalence + text-analysis functions + ML embedder stub
(SURVEY.md §2.10 X1/X3, §2.8 F6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.functions import text as tx
from bob_vector_db_spark.operators import embed


def test_hash_embed_df_matches_column_form(spark):
    df = spark.createDataFrame(
        [(0, "key agg row scan"), (1, "batch window spark order data"), (2, "")],
        "doc_id long, text string")
    col_form = {r["doc_id"]: r["v"] for r in
                df.select("doc_id", embed.hash_embed(F.col("text"), 16).alias("v")).collect()}
    df_form = {r["doc_id"]: r["vec"] for r in
               embed.hash_embed_df(df, dim=16).collect()}
    assert col_form == df_form
    assert sum(df_form[0]) == 4.0  # 4 tokens
    assert sum(df_form[2]) == 0.0  # empty doc → zero vector


def test_ws_and_bpe_tokens(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], "t string")
    row = df.select(
        tx.ws_tokens(F.col("t")).alias("ws"),
        tx.bpe_tokens(F.col("t")).alias("bpe"),
        tx.token_count(F.col("t")).alias("n"),
    ).first()
    assert row["ws"] == ["Hello,", "world!", "42", "times"]
    assert row["bpe"] == ["Hello", ",", "world", "!", "42", "times"]
    assert row["n"] == 4


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    row = df.select(tx.shingles(tx.ws_tokens(F.col("t")), 3).alias("s")).first()
    assert row["s"] == ["a b c", "b c d"]


def test_quality_and_ratios(spark):
    good = "the quick brown fox jumps over a lazy dog and runs far away today"
    bad = "!!! ??? ###"
    df = spark.createDataFrame([(0, good), (1, bad)], "id long, t string")
    rows = {r["id"]: r for r in df.select(
        "id",
        tx.quality_score(F.col("t")).alias("q"),
        tx.stopword_ratio(tx.ws_tokens(F.col("t"))).alias("sw"),
        tx.punct_ratio(F.col("t")).alias("p"),
    ).collect()}
    assert rows[0]["q"] == 1.0
    assert rows[1]["q"] < 0.5
    assert rows[0]["sw"] > 0.1
    assert rows[1]["p"] > 0.5


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "t string")
    fps = [r["f"] for r in df.select(tx.fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1]


def test_ml_embedder_uses_injected_encoder(spark):
    df = spark.createDataFrame([(0, "abc"), (1, "defg")], "doc_id long, document string")
    fake = lambda texts: [[float(len(t)), 1.0] for t in texts]  # noqa: E731
    out = {r["doc_id"]: r["text_vec"] for r in
           embed.embed_documents(df, dim=2, _encode_fn=fake).collect()}
    assert out[0] == [3.0, 1.0]
    assert out[1] == [4.0, 1.0]


def test_ml_embedder_missing_dep_raises_not_implemented(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, document string")
    out = embed.embed_documents(df, ml_model="sentence-transformers/all-MiniLM-L6-v2")
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "sentence-transformers" in str(ei.value)


def test_gopher_rules_each_rule_fires(spark):
    """Gopher battery edge cases the parquet fixture can't exercise (it
    has no newlines or symbols): each rule fails exactly on its crafted
    violator while a clean document passes everything."""
    from pyspark.sql import functions as F

    from bob_vector_db_spark.functions.text import gopher_rules

    good = "the quick brown fox jumps over the lazy dog and runs away"
    docs = spark.createDataFrame(
        [
            (0, good),                                    # passes all
            (1, "the of and"),                            # too few words
            (2, "a " * 12 + "the of"),                    # mean len < 3
            (3, ("the fox " * 6) + "# # # #"),            # symbol ratio
            (4, "\n".join(["- the fox runs"] * 5)),       # bullets
            (5, "\n".join(["the fox runs..."] * 5)),      # ellipsis ends
            (6, ("123 456 789 " * 4) + "the of"),         # alpha frac
            (7, "quick brown fox jumps over lazy dogs " * 2),  # no req
        ],
        "doc_id long, text string",
    )
    flags = gopher_rules(F.col("text"), min_words=5, min_required_words=1)
    out = {r["doc_id"]: r.asDict() for r in docs.select(
        "doc_id", *[v.alias(k) for k, v in flags.items()]).collect()}
    assert out[0]["passes"] is True
    assert out[1]["n_words_ok"] is False
    assert out[2]["mean_len_ok"] is False
    assert out[3]["symbol_ok"] is False
    assert out[4]["bullet_ok"] is False
    assert out[5]["ellipsis_ok"] is False
    assert out[6]["alpha_ok"] is False
    assert out[7]["required_ok"] is False
    for i in range(1, 8):
        assert out[i]["passes"] is False
    # empty text: everything length-gated fails, nothing crashes
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    e = empty.select(*[v.alias(k) for k, v in gopher_rules(
        F.col("text")).items()]).first()
    assert e["passes"] is False and e["n_words_ok"] is False


def test_gopher_codegen_equals_hof_twin(spark, sf_dir):
    """Round 15: gopher_rules is rewritten as pure regexp/string codegen
    primitives — pin flag-for-flag equality against the retained HOF twin
    on the parquet fixture PLUS the edge cases where the regex semantics
    could drift (tab-only lines, \\r line ends, bullet/ellipsis
    whitespace, punctuation-glued required words, empty/NULL text)."""
    from pyspark.sql import functions as F

    from bob_vector_db_spark.functions.text import (
        _gopher_rules_hof,
        gopher_rules,
    )
    from bob_vector_db_spark.sources import load_table

    edge = spark.createDataFrame(
        [
            (1000, "\t\t\nthe fox\n   \n\t- not a bullet after tab"),
            (1001, "line one\r\nthe two...\r\n- spaced bullet "),
            (1002, "  - bullet with leading spaces\n\t* tab bullet"),
            (1003, "ends with dots...   \nplain line\n..."),
            (1004, "the. of, and! that?"),          # glued punctuation
            (1005, "The OF aNd tHaT have"),          # case folding
            (1006, ""),
            (1007, None),
            (1008, " \n \n "),
            (1009, "•bullet no space\n• bullet with space"),
            (1010, "a.b.c ... d...e\n...... the end"),
        ],
        "doc_id long, text string",
    )
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").unionByName(edge))
    new = gopher_rules(F.col("text"), min_words=5, min_required_words=1)
    old = _gopher_rules_hof(F.col("text"), min_words=5,
                            min_required_words=1)
    cmp = docs.select(
        "doc_id",
        *[new[k].alias(f"n_{k}") for k in new],
        *[old[k].alias(f"o_{k}") for k in old])
    bad = cmp.filter(
        " OR ".join(f"(n_{k} IS DISTINCT FROM o_{k})" for k in new))
    assert bad.count() == 0, bad.limit(5).collect()


def test_lang_scores_text_equals_hof_form(spark, sf_dir):
    """Round 15: lang_scores_text (codegen regexp token-boundary counts)
    must equal the HOF token-array form on the fixture plus crafted edge
    cases — markers as substrings of longer tokens, adjacent markers,
    case folding, punctuation-glued markers, NULL/empty text."""
    from pyspark.sql import functions as F

    from bob_vector_db_spark.functions.text import (
        LANG_MARKERS,
        lang_scores,
        lang_scores_text,
        ws_tokens,
    )
    from bob_vector_db_spark.sources import load_table

    edge = spark.createDataFrame(
        [
            (1000, "the theatre of and sand is island"),  # substrings
            (1001, "the the the a a of"),                 # adjacent repeats
            (1002, "The A OF And IS"),                    # case folding
            (1003, "the. ,a (of) and, is!"),              # glued punct
            (1004, "le la les et est der die das und ist"),
            (1005, ""),
            (1006, None),
            (1007, "  the\t a \n of  "),                  # mixed whitespace
        ],
        "doc_id long, text string",
    )
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").unionByName(edge))
    new = lang_scores_text(F.col("text"))
    old = lang_scores(ws_tokens(F.col("text")))
    cmp = docs.select(
        "doc_id",
        *[new[lg].alias(f"n_{lg}") for lg in LANG_MARKERS],
        *[old[lg].alias(f"o_{lg}") for lg in LANG_MARKERS])
    bad = cmp.filter(
        " OR ".join(f"(n_{lg} IS DISTINCT FROM o_{lg})"
                    for lg in LANG_MARKERS))
    assert bad.count() == 0, bad.limit(5).collect()


def test_quality_score_codegen_equals_token_form(spark, sf_dir):
    """Round 15: quality_score / stopword_ratio_text (codegen regexp) vs
    the token-array arithmetic, value-for-value."""
    from pyspark.sql import functions as F

    from bob_vector_db_spark.functions.text import (
        punct_ratio,
        quality_score,
        stopword_ratio,
        stopword_ratio_text,
        ws_tokens,
    )
    from bob_vector_db_spark.sources import load_table

    edge = spark.createDataFrame(
        [(1000, "the a of and is " * 3), (1001, "xxx yyy zzz"),
         (1002, "!!! ??? ..."), (1003, ""), (1004, None),
         (1005, "the. of, and!")],
        "doc_id long, text string")
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").unionByName(edge))
    toks = ws_tokens(F.col("text"))
    old_q = (F.when((F.size(toks) >= 10) & (F.size(toks) <= 1000), 0.4)
             .otherwise(0.0)
             + F.when(stopword_ratio(toks) >= 0.05, 0.3).otherwise(0.0)
             + F.when(punct_ratio(F.col("text")) <= 0.2, 0.3)
             .otherwise(0.0))
    cmp = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("n_q"), old_q.alias("o_q"),
        stopword_ratio_text(F.col("text")).alias("n_sw"),
        stopword_ratio(toks).alias("o_sw"))
    bad = cmp.filter("(n_q IS DISTINCT FROM o_q) "
                     "OR (n_sw IS DISTINCT FROM o_sw)")
    assert bad.count() == 0, bad.limit(5).collect()
