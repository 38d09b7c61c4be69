"""Unit tests for the scalar cleaning + text function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.functions import (
    blank_as_null,
    clean_phone_number,
    collapse_whitespace,
    detect_language,
    document_fingerprint,
    instr_any,
    null_if_before_year,
    quality_score,
    token_count,
)
from etl_pipeline_4handling_listings_spark.functions.text import (
    char_shingles,
    word_shingles,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(expr.alias("y")).collect()[0]["y"]


def test_clean_phone_number(spark):
    cases = {
        "(303) 555-1234": "3035551234",
        "1-303-555-1234": "3035551234",
        "303.555.1234 x99": "3035551234",
        "000-555-1234": None,  # implausible prefix
        "123": None,  # too short
        "30355512345678": None,  # too long
    }
    for raw, want in cases.items():
        assert _one(spark, raw, clean_phone_number("x")) == want, raw


def test_blank_and_whitespace(spark):
    assert _one(spark, "", blank_as_null("x")) is None
    assert _one(spark, "v", blank_as_null("x")) == "v"
    assert _one(spark, "  a   b \t c  ", collapse_whitespace("x")) == "a b c"


def test_instr_any(spark):
    assert _one(spark, "city well water", instr_any("x", ["well", "cistern"])) is True
    assert _one(spark, "public", instr_any("x", ["well", "cistern"])) is False


def test_null_if_before_year(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.date(1875, 1, 1),), (datetime.date(1999, 5, 5),)], ["x"]
    )
    out = [r["y"] for r in df.select(null_if_before_year("x").alias("y")).collect()]
    assert out[0] is None
    assert out[1] == datetime.date(1999, 5, 5)


def test_token_count(spark):
    assert _one(spark, "one two  three", token_count("x")) == 3
    assert _one(spark, "   ", token_count("x")) == 0
    assert _one(spark, "", token_count("x")) == 0


def test_detect_language(spark):
    assert _one(spark, "the cat and the dog sat in the yard", detect_language("x")) == "en"
    assert _one(spark, "el perro y la casa de los gatos", detect_language("x")) == "es"
    assert _one(spark, "le chat et les maisons du village est", detect_language("x")) == "fr"
    assert _one(spark, "der Hund und die Katze ist ein Tier", detect_language("x")) == "de"
    assert _one(spark, "zzz qqq xxx", detect_language("x")) == "und"


def test_fingerprint_normalizes(spark):
    a = _one(spark, "Hello   World", document_fingerprint("x"))
    b = _one(spark, "hello world", document_fingerprint("x"))
    c = _one(spark, "hello worlds", document_fingerprint("x"))
    assert a == b
    assert a != c


def test_quality_score_range(spark):
    for text in ["good clean prose here", "!!!???...", "x", "a" * 500]:
        v = _one(spark, text, quality_score("x"))
        assert 0.0 <= v <= 1.0, text


def test_shingles(spark):
    ch = _one(spark, "abcdef", char_shingles("x", 3))
    assert ch == ["abc", "bcd", "cde", "def"]
    wd = _one(spark, "a b c d", word_shingles("x", 2))
    assert wd == ["a b", "b c", "c d"]
    # shorter than n: single truncated shingle, never empty
    assert _one(spark, "ab", char_shingles("x", 5)) == ["ab"]


def test_redact_pii_masks_and_counts(spark):
    from etl_pipeline_4handling_listings_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or call (303) 555-1234"),
            (2, "digits 123456789012 are not a phone"),
            (3, "two mails a@b.co c@d.io and 303.555.0000"),
            (4, ""),
        ],
        "id INT, t STRING",
    )
    n_e, n_p = pii_counts("t")
    out = {
        r["id"]: r
        for r in df.select(
            "id", redact_pii("t").alias("red"), n_e.alias("ne"), n_p.alias("np")
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> or call <PHONE>"
    assert (out[1]["ne"], out[1]["np"]) == (1, 1)
    # the pattern intentionally over-matches inside long digit runs
    # (recall over precision for a PII scrubber): the first 10 digits
    # of a 12-digit run are masked
    assert out[2]["red"] == "digits <PHONE>12 are not a phone"
    assert (out[2]["ne"], out[2]["np"]) == (0, 1)
    assert out[3]["ne"] == 2 and out[3]["np"] == 1
    assert "<EMAIL>" in out[3]["red"] and "<PHONE>" in out[3]["red"]
    assert out[4]["red"] == ""


def test_split_sentences_udtf(spark):
    from etl_pipeline_4handling_listings_spark.operators.udtfs import (
        split_sentences,
    )

    spark.udtf.register("split_sentences", split_sentences)
    df = spark.createDataFrame(
        [
            (1, "First one. Second here! Third? done lower."),
            (2, ""),
            (3, None),
        ],
        "doc_id LONG, text STRING",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM udtf_docs, "
        "LATERAL split_sentences(text) s ORDER BY doc_id, sent_idx"
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"], r["n_words"]) for r in rows]
    # 'Third? done lower.' stays one sentence: boundary needs a
    # following upper-case letter
    assert got == [
        (1, 0, "First one.", 2),
        (1, 1, "Second here!", 2),
        (1, 2, "Third? done lower.", 3),
    ]
