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


def test_pack_sequences_offsets_consistent(spark, sf_dir):
    """Packing invariants: within each shard in doc_id order, every doc's
    (seq_bin, pack_offset) equals the running token total before it."""
    from fund_data_etl_pipeline_spark.operators.sampling import pack_sequences
    from fund_data_etl_pipeline_spark.functions.text import BPE_TOKEN_RE
    from fund_data_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pack_sequences(
        docs, token_count=F.regexp_count("text", F.lit(BPE_TOKEN_RE)), capacity=256
    ).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["pack_shard"], r["doc_id"])):
        by_shard.setdefault(r["pack_shard"], []).append(r)
    assert len(by_shard) > 1
    for rows in by_shard.values():
        cum = 0
        for r in rows:
            assert r["seq_bin"] == cum // 256
            assert r["pack_offset"] == cum % 256
            cum += r["n_tokens"]


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    """Per-language rates land within binomial tolerance; zh (rate 1.0)
    is kept whole; assignment is deterministic across runs."""
    from fund_data_etl_pipeline_spark.operators.sampling import stratified_sample
    from fund_data_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.3, "de": 0.8, "es": 0.8, "fr": 0.8}
    out = stratified_sample(docs, rates).collect()
    totals = {
        r["lang"]: r["c"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    kept: dict[str, int] = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    assert kept["zh"] == totals["zh"]
    assert 0.1 <= kept["en"] / totals["en"] <= 0.5
    again = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    assert again == {r["doc_id"] for r in out}
