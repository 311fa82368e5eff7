"""Semantic tests for the training-corpus curation queries
(queries/training.py) on crafted documents — hand-computed expected
values, independent of the DuckDB oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.queries.training import (
    benchmark_contamination, corpus_token_stats, repetition_quality,
    sequence_pack, stratified_sample,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def test_repetition_quality_hand_computed(spark, tmp_path):
    # "a a a b": 4 words, 2 distinct, top word 3x; bigrams
    # [a a, a a, a b]: top 2 of 3
    sf = _write_docs(spark, tmp_path, [
        (1, "a a a b", "en", "s", 7),
        (2, "x", "en", "s", 1),          # single word: no bigrams
    ])
    out = {r["doc_id"]: r for r in repetition_quality(spark, sf).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4 and r1["n_distinct_words"] == 2
    assert r1["dup_word_ppm"] == 500000
    assert r1["top_word_ppm"] == 750000
    assert r1["top_bigram_ppm"] == 666666
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["dup_word_ppm"] == 0
    assert r2["top_bigram_ppm"] == 0


def test_sequence_pack_boundaries(spark, tmp_path):
    # one shard (doc_id % 8 == 0 for ids 0,8,16,24), budget 2048:
    # token counts 2000, 100, 2000, 10 -> cumulative-before
    # 0, 2000, 2100, 4100 -> packs 0,0,1,2 offsets 0,2000,52,4
    rows = [(i * 8, " ".join(["w"] * n), "en", "s", 0)
            for i, n in enumerate([2000, 100, 2000, 10])]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in sequence_pack(spark, sf).collect()}
    assert [out[i * 8]["pack_id"] for i in range(4)] == [0, 0, 1, 2]
    assert [out[i * 8]["pack_offset"] for i in range(4)] == [0, 2000, 52, 4]
    assert all(out[i * 8]["shard"] == 0 for i in range(4))


def test_sequence_pack_shards_independent(spark, tmp_path):
    # shard 1 ids: packing restarts (doc 1 at offset 0)
    sf = _write_docs(spark, tmp_path, [
        (0, " ".join(["w"] * 3000), "en", "s", 0),
        (1, " ".join(["w"] * 5), "en", "s", 0),
    ])
    out = {r["doc_id"]: r for r in sequence_pack(spark, sf).collect()}
    assert out[1]["shard"] == 1 and out[1]["pack_id"] == 0
    assert out[1]["pack_offset"] == 0


def test_stratified_sample_deterministic_subset(spark, tmp_path):
    rows = [(i, f"text {i}", lang, "s", 0)
            for i in range(400)
            for lang in (["en"] if i % 2 == 0 else ["de"])]
    sf = _write_docs(spark, tmp_path, rows)
    a = sorted(r["doc_id"] for r in stratified_sample(spark, sf).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(spark, sf).collect())
    assert a == b, "sampling must be deterministic"
    kept = stratified_sample(spark, sf)
    n_en = kept.where("lang = 'en'").count()
    n_de = kept.where("lang = 'de'").count()
    assert n_de == 200, "de keeps everything ('ffff' threshold)"
    # en rate is 1/4 of the 16-bit prefix space; 200 draws -> well
    # inside [10%, 40%]
    assert 20 <= n_en <= 80


def test_benchmark_contamination_planted(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta"
    # doc 10 shares the trigram "beta gamma delta"; doc 11 is disjoint
    sf = _write_docs(spark, tmp_path, [
        (1, bench_text, "en", "src0", 0),
        (10, "one two beta gamma delta three four", "en", "src1", 0),
        (11, "unrelated words only here nothing shared", "en", "src1", 0),
    ])
    out = {r["doc_id"]: r for r in benchmark_contamination(spark, sf).collect()}
    assert 10 in out and 11 not in out
    assert out[10]["n_contaminated"] == 1
    assert out[10]["n_shingles"] == 5
    assert out[10]["contamination_ppm"] == 200000


def test_corpus_token_stats_percentiles(spark, tmp_path):
    # en docs with 10, 20, 30 tokens: p50 = 20, p90 interpolates to 28
    rows = [(i, " ".join(["w"] * n), "en", "s", 0)
            for i, n in enumerate([10, 20, 30])]
    sf = _write_docs(spark, tmp_path, rows)
    r = corpus_token_stats(spark, sf).collect()[0]
    assert r["n_docs"] == 3 and r["total_tokens"] == 60
    assert r["p50_tokens_e3"] == 20000
    assert r["p90_tokens_e3"] == 28000


def test_chunk_documents_no_redundant_tail(spark, tmp_path):
    """A tail whose tokens are fully contained in the previous chunk
    must not be emitted: 60 tokens = one 60-token chunk (the old
    formula emitted chunk 1 = tokens 49-60, a strict subset of chunk
    0); 65 tokens = two chunks, the second covering new token 65."""
    from adsmasterpipeline_spark.queries.training import chunk_documents
    sf = _write_docs(spark, tmp_path, [
        (1, " ".join(f"w{i}" for i in range(60)), "en", "s", 60),
        (2, " ".join(f"w{i}" for i in range(65)), "en", "s", 65),
        (3, " ".join(f"w{i}" for i in range(64)), "en", "s", 64),
        (4, "solo", "en", "s", 4),
    ])
    out = {}
    for r in chunk_documents(spark, sf).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert len(out[1]) == 1 and out[1][0]["n_tokens"] == 60
    assert len(out[3]) == 1 and out[3][0]["n_tokens"] == 64
    assert len(out[4]) == 1
    assert len(out[2]) == 2
    c1 = next(r for r in out[2] if r["chunk_idx"] == 1)
    assert c1["start_tok"] == 48 and c1["n_tokens"] == 17
    # every non-first chunk covers at least one new token
    for rows in out.values():
        for r in rows:
            if r["chunk_idx"] > 0:
                assert r["n_tokens"] > 16


def test_learn_bpe_hand_computed_merges(spark):
    """Sennrich-style toy corpus: 'aaab' x3 + 'ab' x2. Pairs round 1:
    (a,a) c=6, (a,b) c=5 -> merge (a,a). Round 2 symbols: aaab ->
    [aa,a,b] (greedy left-to-right), ab -> [a,b]; pairs: (aa,a) 3,
    (a,b) 5 -> merge (a,b). Round 3: [aa,ab] / [ab]; (aa,ab) c=3.
    Ties and the c<2 stop are covered by the ababa type below."""
    from adsmasterpipeline_spark.operators.bpe import learn_bpe
    wc = spark.createDataFrame(
        [("aaab", 3), ("ab", 2)], "word string, cnt long")
    merges, types = learn_bpe(wc, n_merges=10)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    out = {r["word"]: r["sym"] for r in types.collect()}
    assert out["aaab"] == ["aaab"]
    assert out["ab"] == ["ab"]


def test_learn_bpe_greedy_overlap_and_stop(spark):
    """'ababa': greedy left-to-right on merge (a,b) gives [ab, ab, a]
    — overlapping occurrences merge like the canonical BPE scan, and
    learning stops when no pair repeats."""
    from adsmasterpipeline_spark.operators.bpe import learn_bpe
    wc = spark.createDataFrame([("ababa", 1)], "word string, cnt long")
    merges, types = learn_bpe(wc, n_merges=10)
    # round 1: (a,b) c=2 merges; [ab, ab, a] then has no pair with
    # weighted count >= 2 -> stop
    assert merges == [("a", "b")]
    assert types.collect()[0]["sym"] == ["ab", "ab", "a"]


def test_bpe_pair_argmax_is_distributed_topk(spark):
    """Each learning round's argmax must compile to
    TakeOrderedAndProject (per-partition heaps), never a
    single-partition global sort of the pair space."""
    from adsmasterpipeline_spark.operators.bpe import pair_counts
    from adsmasterpipeline_spark.plans.explain import (
        single_partition_exchanges, takeordered_count)
    types = spark.createDataFrame(
        [("ab", 1, ["a", "b"])], "word string, cnt long, sym array<string>")
    top1 = (pair_counts(types)
            .orderBy(F.col("c").desc(), "a", "b").limit(1))
    assert takeordered_count(top1) >= 1
    assert single_partition_exchanges(top1) == 0


@pytest.mark.slow
def test_learn_bpe_driver_and_distributed_paths_agree(spark):
    """The size-adaptive driver-side merge loop (r11) must produce the
    same merges and symbol tables as the distributed TopK loop
    (driver_cap=0 forces the distributed path)."""
    from adsmasterpipeline_spark.operators.bpe import learn_bpe
    corpora = [
        [("aaab", 3), ("ab", 2)],
        [("ababa", 1)],
        [("abab", 2), ("ba", 3), ("aa", 1)],
    ]
    for wc in corpora:
        df = spark.createDataFrame(wc, "word string, cnt long")
        m_drv, t_drv = learn_bpe(df, n_merges=6)
        m_dst, t_dst = learn_bpe(df, n_merges=6, driver_cap=0)
        assert m_drv == m_dst
        got_d = {r["word"]: r["sym"] for r in t_drv.collect()}
        got_x = {r["word"]: r["sym"] for r in t_dst.collect()}
        assert got_d == got_x


def _bpe_model(word_counts, n_merges):
    """Independent pure-Python BPE: same spec as operators/bpe.py
    (weighted pair counts, count-desc/(a,b)-lexicographic argmax,
    greedy left-to-right merge, stop below weighted count 2)."""
    types = {w: list(w) for w, _ in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, c in word_counts:
            sym = types[w]
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        for w in types:
            out = []
            for x in types[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            types[w] = out
    return merges, types


@pytest.mark.slow
def test_learn_bpe_property_vs_model(spark):
    """learn_bpe must agree with the independent dict-fold model on
    merge ORDER and final symbol tables across adversarial tiny
    corpora (overlapping merges, ties, repeated chars)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from adsmasterpipeline_spark.operators.bpe import learn_bpe

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=3)),
        min_size=1, max_size=4, unique_by=lambda t: t[0])

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(wc=corpus)
    def check(wc):
        df = spark.createDataFrame(wc, "word string, cnt long")
        got_merges, got_types = learn_bpe(df, n_merges=4)
        want_merges, want_types = _bpe_model(wc, 4)
        assert got_merges == want_merges
        got = {r["word"]: r["sym"] for r in got_types.collect()}
        assert got == want_types

    check()
