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


def test_winnowing_density_guarantee(spark):
    """Winnowing's defining property (Schleimer et al. 2003): every
    window of W consecutive grams selects at least one fingerprint,
    so no gap between selected positions exceeds W — checked on the
    fixture corpus per document."""
    from pyspark.sql import Window as W_, functions as F

    from cdc_via_flink_spark.functions.hashing import P, token_int
    from cdc_via_flink_spark.functions.text import shingles_from_tokens, tokens
    from cdc_via_flink_spark.plans.text_queries import _WINNOW_K, _WINNOW_W
    from cdc_via_flink_spark.sources.tables import load_table
    from tests.conftest import SF0001

    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    toks = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    grams = toks.select(
        "doc_id",
        F.posexplode(shingles_from_tokens(F.col("tk"), _WINNOW_K)).alias("p", "g"),
    ).select(
        "doc_id",
        (F.col("p") + 1).alias("pos"),
        (token_int(F.col("g")) % F.lit(P)).alias("h"),
    )
    enc = grams.select(
        "doc_id",
        "pos",
        (F.col("h") * 1024 + (1023 - F.pmod(F.col("pos"), F.lit(1024)))).alias("e"),
    )
    win = W_.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WINNOW_W - 1)
    sel = (
        enc.select("doc_id", F.min("e").over(win).alias("se"))
        .distinct()
        .select(
            "doc_id",
            (1023 - F.pmod(F.col("se"), F.lit(1024))).alias("sel_pos"),
        )
    )
    lag_w = W_.partitionBy("doc_id").orderBy("sel_pos")
    gaps = sel.select(
        "doc_id",
        (F.col("sel_pos") - F.lag("sel_pos", 1, 0).over(lag_w)).alias("gap"),
    )
    max_gap = gaps.agg(F.max("gap")).head()[0]
    assert max_gap <= _WINNOW_W, max_gap
    # and the sketch is a real subsample, not everything
    n_sel = sel.count()
    n_grams = grams.count()
    assert n_sel < n_grams

    # the production MAP-SIDE selection (_winnow_selected, higher-order
    # exprs, no doc_id shuffle) must equal this straightforward
    # windowed-SQL construction row for row
    from cdc_via_flink_spark.plans.text_queries import _winnow_selected

    fast = sorted(
        (r.doc_id, r.se)
        for r in _winnow_selected(d).collect()
    )
    slow = sorted(
        (r.doc_id, r.se)
        for r in enc.select("doc_id", F.min("e").over(win).alias("se"))
        .distinct()
        .collect()
    )
    assert fast == slow


def test_incremental_winnow_equals_monolithic_restricted(spark, tmp_path):
    """incremental_winnow_pairs (stored index + new batch) must equal
    the monolithic pair computation over the whole corpus restricted
    to new-involving pairs — including when the batch RE-INGESTS
    documents already indexed (no degenerate self-pairs, no
    double-counted shared fingerprints across the new×new / new×old
    branches)."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.winnow import (
        WINNOW_MIN_SHARED,
        incremental_winnow_pairs,
        save_winnow_index,
        winnow_fingerprints,
    )
    from cdc_via_flink_spark.sources.tables import load_table
    from tests.conftest import SF0001

    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    new = d.filter(F.pmod(F.col("doc_id"), 4) == 0)
    old = d.subtract(new)
    # re-ingestion: the batch also re-sends some already-indexed docs
    batch = new.unionByName(d.filter(F.pmod(F.col("doc_id"), 10) == 1))

    # monolithic reference over old ∪ batch (= d plus re-ingested ids
    # collapsing to the same fingerprints)
    fp = winnow_fingerprints(d)
    keep = (
        fp.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= 256))
        .select("fh")
    )
    pruned = fp.join(keep, "fh", "left_semi")
    mono = (
        pruned.alias("a")
        .join(
            pruned.alias("b"),
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )
    batch_ids = {r.doc_id for r in batch.collect()}
    expected = sorted(
        tuple(r)
        for r in mono.collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    )

    path = str(tmp_path / "winnow_idx")
    save_winnow_index(old, path)
    got = sorted(
        tuple(r) for r in incremental_winnow_pairs(batch, path).collect()
    )
    assert got == expected and len(got) > 0


def test_winnow_index_meta_validation(spark, tmp_path):
    """A winnow index saved at different sizing/version must refuse the
    probe loudly (the dedup-index meta recipe)."""
    import pytest

    from cdc_via_flink_spark.operators import winnow
    from cdc_via_flink_spark.sources.tables import load_table
    from tests.conftest import SF0001

    d = load_table(spark, SF0001, "documents").select("doc_id", "text").limit(30)
    path = str(tmp_path / "wi")
    winnow.save_winnow_index(d, path)
    # matching build probes fine
    assert winnow.incremental_winnow_pairs(d.limit(5), path).count() >= 0
    with pytest.raises(ValueError, match="not a"):
        winnow.incremental_winnow_pairs(d.limit(5), str(tmp_path / "nope"))
    orig = winnow.WINNOW_VERSION
    winnow.WINNOW_VERSION = orig + 1
    try:
        with pytest.raises(ValueError, match="stores"):
            winnow.incremental_winnow_pairs(d.limit(5), path)
    finally:
        winnow.WINNOW_VERSION = orig


def _winnow_reference(text: str, k: int, w: int) -> set[int]:
    """Independent pure-Python winnowing (md5 token_int % P, the same
    published recipe) — the cross-check oracle for the higher-order
    expression implementation."""
    import hashlib
    import re

    P = 1_000_000_007
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P for g in grams
    ]
    enc = [h * 1024 + (1023 - ((i + 1) % 1024)) for i, h in enumerate(hs)]
    return {min(enc[i : i + w]) for i in range(len(enc))}


def test_winnow_selected_matches_python_reference(spark):
    """Property check: the map-side higher-order-expression selection
    equals an independently-written Python winnowing on randomized
    word documents (short docs below the gram width included)."""
    import random

    from cdc_via_flink_spark.operators.winnow import (
        WINNOW_K,
        WINNOW_W,
        winnow_selected,
    )

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    for i in range(60):
        n = rng.choice([1, 2, 3, 4, 5, 8, 13, 21, 40, 80])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_selected(df).collect():
        got.setdefault(r.doc_id, set()).add(r.se)
    for i, t in rows:
        assert got[i] == _winnow_reference(t, WINNOW_K, WINNOW_W), (i, t)


def test_negative_sampling_distribution_properties(spark):
    """text_negative_sampling_table: probabilities from an
    independent pandas recompute; effective vocab <= raw vocab;
    temperature flattens (p_neg of the top term < its raw share)."""
    import pandas as pd

    from cdc_via_flink_spark.plans.registry import load_all

    sf = "/root/testdata/sf0.001"
    rows = load_all()["text_negative_sampling_table"].fn(spark, sf).collect()
    d = pd.read_parquet(f"{sf}/documents.parquet")["text"]
    import re
    from collections import Counter

    cnt: Counter = Counter()
    for t in d:
        norm = re.sub(r"\s+", " ", t).strip().lower()
        for w in norm.split(" "):
            if w:
                cnt[w] += 1
    z = sum(c**0.75 for c in cnt.values())
    total = sum(cnt.values())
    top = rows[0]
    assert top["cnt"] == max(cnt.values())
    assert abs(top["p_neg"] - cnt[top["term"]] ** 0.75 / z) < 1e-6
    assert top["vocab"] == len(cnt)
    assert 1.0 <= top["effective_vocab"] <= top["vocab"]
    # 0.75 tempering must shrink the head's share
    assert top["p_neg"] < cnt[top["term"]] / total


def test_lognormal_fit_numpy_reference(spark):
    """text_length_lognormal_fit == numpy method-of-moments on
    ln(lengths); heavy-tail diagnostic: model mean >= model median."""
    import numpy as np
    import pandas as pd

    from cdc_via_flink_spark.plans.registry import load_all

    sf = "/root/testdata/sf0.001"
    row = load_all()["text_length_lognormal_fit"].fn(spark, sf).collect()[0]
    n = pd.read_parquet(f"{sf}/documents.parquet")["n_chars"]
    n = n[n > 0].to_numpy(float)
    lx = np.round(np.log(n), 12)
    mu, var = lx.mean(), lx.var()
    assert row["n"] == len(n)
    assert abs(row["mu_log"] - mu) < 1e-6
    assert abs(row["sigma_log"] - np.sqrt(var)) < 1e-6
    assert abs(row["median_model"] - np.exp(mu)) < 1e-2 * np.exp(mu)
    assert abs(row["mean_model"] - np.exp(mu + var / 2)) < 1e-2 * np.exp(mu)
    assert abs(row["mean_observed"] - n.mean()) < 0.01
    assert row["mean_model"] >= row["median_model"]
