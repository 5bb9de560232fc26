"""Behavior tests for the text-pipeline operators on synthetic rows (the
sf corpora are word-soup, so redaction/repetition edges need fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.plans.textops import (
    EMAIL_RE,
    LONGNUM_RE,
    URL_RE,
)


def _scrub(spark, text):
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", URL_RE, "[URL]"), EMAIL_RE, "[EMAIL]"
        ),
        LONGNUM_RE,
        "[NUM]",
    )
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(clean.alias("c")).first()["c"]


def test_scrub_redacts_each_kind(spark):
    out = _scrub(
        spark,
        "mail a.b+c@example.org or see https://ex.com/p?q=1 acct 123456789!",
    )
    assert out == "mail [EMAIL] or see [URL] acct [NUM]!"


def test_scrub_url_swallows_embedded_email(spark):
    # URL runs first, so a user:pass@host URL never half-redacts as email
    assert _scrub(spark, "go https://u@ex.com/x now") == "go [URL] now"


def test_scrub_short_numbers_kept(spark):
    assert _scrub(spark, "call 12345678 ok") == "call 12345678 ok"


def test_repetition_filter_flags_degenerate_doc(spark, tmp_path, monkeypatch):
    import fund_data_etl_pipeline_spark.plans.textops as T

    rows = [
        (1, "spam spam spam spam spam spam", "en", "t", 30),
        (2, "all words here are fully distinct tokens", "en", "t", 40),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in T.text_repetition_filter(spark, str(tmp_path)).collect()
    }
    assert not out[1]["keep"] and out[1]["uniq_word_frac"] < 0.2
    assert out[2]["keep"] and out[2]["uniq_word_frac"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
