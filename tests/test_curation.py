"""Unit tests for operators/curation.py: PII scrubbing, quality
rules, and span-level dedup on crafted inputs where the expected
output is computable by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from adsmasterpipeline_spark.operators.curation import (
    quality_rules, scrub_pii, span_dedup)


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at bob@example.com or alice@sub.domain.org thanks"),
         (2, "server 192.168.1.200 and 10.0.0.1 port"),
         (3, "call 555-0123 now"),
         (4, "nothing sensitive here")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 0
    assert out[1]["clean_text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["clean_text"] == "server <IP> and <IP> port"
    assert out[3]["n_phone"] == 1
    assert out[3]["clean_text"] == "call <PHONE> now"
    assert out[4]["clean_text"] == "nothing sensitive here"
    assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0


def test_scrub_pii_email_wins_over_ipv4(spark):
    # The local part and domain contain digit runs; the email rule must
    # consume them before the IPv4 rule ever sees the text.
    df = spark.createDataFrame([(1, "x 1.2.3.4@99.88.77.66.com y")],
                               ["doc_id", "text"])
    row = scrub_pii(df).collect()[0]
    assert row["clean_text"] == "x <EMAIL> y"
    assert row["n_email"] == 1


def test_quality_rules_flags(spark):
    ok = "the " + " ".join(f"word{i}" for i in range(30))        # passes all
    short = "the cat"                                            # word_count
    no_stop = " ".join(f"tok{i}" for i in range(25))             # stopword
    repetitive = "the " + "spam " * 40 + "egg"                   # unique_ratio
    long_words = "the " + " ".join("x" * 30 for _ in range(25))  # mean_word_len
    df = spark.createDataFrame(
        [(1, ok), (2, short), (3, no_stop), (4, repetitive), (5, long_words)],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_rules(df).collect()}
    assert out[1]["keep"] and out[1]["fail_reasons"] == ""
    assert not out[2]["keep"] and "word_count" in out[2]["fail_reasons"]
    assert not out[3]["keep"] and out[3]["fail_reasons"] == "stopword"
    assert not out[4]["keep"] and "unique_ratio" in out[4]["fail_reasons"]
    assert not out[5]["keep"] and "mean_word_len" in out[5]["fail_reasons"]
    # fail_reasons is sorted, '|'-joined
    parts = out[2]["fail_reasons"].split("|")
    assert parts == sorted(parts)


def test_span_dedup_within_and_across_docs(spark):
    a = " ".join(f"w{i}" for i in range(10))      # span A
    b = " ".join(f"v{i}" for i in range(10))      # span B
    c = " ".join(f"u{i}" for i in range(5))       # short trailing span C
    df = spark.createDataFrame(
        [(1, f"{a} {b}"),        # doc 1: A B   -> both kept (first)
         (2, f"{b} {a} {c}"),    # doc 2: B A C -> only C kept
         (3, a),                 # doc 3: A     -> nothing kept
         (4, c)],                # doc 4: C     -> nothing (doc 2 pos 2 first? no: key (2,2)=2*64+2 < 4*64)
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           span_dedup(df, span_words=10, max_spans=64).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == f"{a} {b}"
    assert out[2]["n_spans"] == 3 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == c
    assert out[3]["n_spans"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["clean_text"] == ""
    assert out[4]["n_spans"] == 1 and out[4]["n_kept"] == 0


def test_span_dedup_md5_twin_matches_xxhash(spark):
    # Hash choice must not change survivorship.
    rows = [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(25)))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = span_dedup(df, hash_fn=F.xxhash64).orderBy("doc_id").collect()
    slow = span_dedup(df, hash_fn=F.md5).orderBy("doc_id").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


def test_span_dedup_no_text_shuffle_key(spark):
    # The first aggregation must group on the 64-bit hash, not the
    # span string: the plan's hashpartitioning key is 'h'.
    df = spark.createDataFrame([(1, "a b c"), (2, "d e f")],
                               ["doc_id", "text"])
    plan = span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(h#" in plan
