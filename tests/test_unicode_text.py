"""Unicode/CJK hardening of the text path (functions/text.py):
script-aware tokenization and NFC-before-fingerprint on literal
mixed-script fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_via_flink_spark.functions.text import (
    nfc_normalize,
    tokens,
    tokens_unicode,
)


def test_tokens_unicode_splits_cjk_keeps_latin(spark):
    df = spark.createDataFrame(
        [("深度学习 deep learning モデル 한국어",)], "t string"
    )
    got = df.select(tokens_unicode(F.col("t")).alias("tk")).collect()[0].tk
    assert got == [
        "深", "度", "学", "习", "deep", "learning", "モ", "デ", "ル", "한", "국", "어",
    ]
    # the Latin-only tokenizer sees unsegmented CJK as ONE token — the
    # failure mode tokens_unicode exists to fix
    latin = df.select(tokens(F.col("t")).alias("tk")).collect()[0].tk
    assert "深度学习" in latin


def test_tokens_unicode_latin_passthrough(spark):
    df = spark.createDataFrame([("Hello  World foo-bar",)], "t string")
    got = df.select(tokens_unicode(F.col("t")).alias("tk")).collect()[0].tk
    assert got == df.select(tokens(F.col("t")).alias("tk")).collect()[0].tk


def test_nfc_collapses_nfd_spelling(spark):
    nfd = "café français"  # combining marks
    nfc = "café français"  # precomposed
    df = spark.createDataFrame([(nfd, nfc)], "a string, b string")
    row = df.select(
        (F.col("a") == F.col("b")).alias("raw_eq"),
        (nfc_normalize(F.col("a")) == nfc_normalize(F.col("b"))).alias("norm_eq"),
        (F.md5(nfc_normalize(F.col("a"))) == F.md5(nfc_normalize(F.col("b")))).alias(
            "fp_eq"
        ),
    ).collect()[0]
    assert not row.raw_eq
    assert row.norm_eq and row.fp_eq


def test_nfc_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(nfc_normalize(F.col("t")).alias("n")).collect()[0].n is None
