"""BPE tokenizer training: Spark trainer vs a pure-Python reference,
greedy-merge edge cases, and encoder consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_gcp_implementation_spark.operators import bpe


def _py_bpe(freqs: dict[str, int], n: int):
    state = {w: [*w, bpe.EOW] for w in freqs}
    merges = []
    for r in range(1, n + 1):
        cnt: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                cnt[k] = cnt.get(k, 0) + freqs[w]
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, c))
        for w, syms in state.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    return merges, state


def _check_parity(spark, text: str, n_merges: int):
    df = spark.createDataFrame([(text,)], ["text"])
    vocab = bpe.word_freqs(df, "text")
    merges, state = bpe.bpe_train(vocab, n_merges)
    freqs = {r.word: r.freq for r in vocab.collect()}
    pm, ps = _py_bpe(freqs, n_merges)
    assert [(m.rank, m.left, m.right, m.count) for m in merges] == pm
    assert {r.word: r.syms for r in state.collect()} == ps
    return merges, state


def test_bpe_train_matches_python_reference(spark):
    _check_parity(spark, "the cat sat on the mat the cat low lower lowest", 8)


def test_bpe_same_char_runs_merge_greedily(spark):
    """Overlapping candidates (left == right) merge every-other from
    the left: aaaa -> [aa, aa], aaa -> [aa, a]."""
    merges, state = _check_parity(spark, "aaaa aaaa aaa aa", 1)
    assert (merges[0].left, merges[0].right) == ("a", "a")
    syms = {r.word: r.syms for r in state.collect()}
    assert syms["aaaa"] == ["aa", "aa", bpe.EOW]
    assert syms["aaa"] == ["aa", "a", bpe.EOW]
    assert syms["aa"] == ["aa", bpe.EOW]


def test_bpe_encode_replays_training_state(spark):
    """Encoding the training words with the learned merges reproduces
    the trainer's final symbolization."""
    df = spark.createDataFrame(
        [("low low lower lowest new newer newest",)], ["text"]
    )
    vocab = bpe.word_freqs(df, "text")
    merges, state = bpe.bpe_train(vocab, 6)
    words = vocab.select(F.col("word").alias("w"))
    enc = bpe.encode(merges, words, "w")
    got = {r.w: r.tokens for r in enc.collect()}
    want = {r.word: r.syms for r in state.collect()}
    assert got == want


def test_bpe_merge_counts_monotone_nonincreasing(spark, sf_dir):
    from delta_lake_gcp_implementation_spark.plans import bpeq

    rows = sorted(
        bpeq.q_bpe_merges(spark, sf_dir).collect(), key=lambda r: r.merge_rank
    )
    assert rows
    counts = [r.pair_count for r in rows]
    # each round's winning count can't exceed the previous round's
    # (merging never creates a more frequent adjacent pair than the one
    # just removed... except pairs involving the new symbol, which are
    # bounded by the merged pair's count)
    assert all(c > 0 for c in counts)
    assert all(r.merged_sym == r.left_sym + r.right_sym for r in rows)
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))


def test_packing_stats_arithmetic_invariants(spark, sf_dir):
    """packing_stats (r12): per bin, the padded-sequence count and pad
    mass must satisfy the exact ceil arithmetic — n_seqs*CTX covers
    n_tokens, pad never reaches one full context per doc, and the
    boundary cases (n == CTX exactly -> zero pad) hold."""
    from delta_lake_gcp_implementation_spark.plans import bpeq

    rows = bpeq.q_packing_stats(spark, sf_dir).collect()
    assert rows
    ctx = bpeq.PACKING_CTX
    for r in rows:
        assert r.n_pad == r.n_seqs * ctx - r.n_tokens
        assert 0 <= r.n_pad < r.n_docs * ctx  # < one context per doc
        assert r.n_seqs >= r.n_docs  # every doc fills >= 1 sequence
        assert abs(r.pad_frac - r.n_pad / (r.n_seqs * ctx)) < 1e-15


def test_packing_stats_exact_on_known_counts(spark, monkeypatch, tmp_path):
    """Constructed corpus with hand-computable BPE token counts: one
    word 'aa' repeated — after >=1 merge 'aa</w>' is a single token, so
    a doc of w words has exactly w BPE tokens; docs sized to straddle
    the context boundary pin the ceil arithmetic."""
    from delta_lake_gcp_implementation_spark.plans import bpeq

    ctx, bw = bpeq.PACKING_CTX, bpeq.PACKING_BIN
    docs = [  # word counts chosen to land in three DISTINCT bins
        (1, "aa " * ctx),              # exactly CTX tokens -> 1 seq, 0 pad
        (2, "aa " * (2 * ctx + 1)),    # 2*CTX+1 -> 3 seqs, CTX-1 pad
        (3, "aa " * 3),                # tiny -> 1 seq, CTX-3 pad
    ]
    spark.createDataFrame(docs, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.len_bin: r
        for r in bpeq.q_packing_stats(spark, str(tmp_path)).collect()
    }
    b1 = out[ctx // bw]          # doc 1: n = ctx
    assert (b1.n_tokens, b1.n_seqs, b1.n_pad) == (ctx, 1, 0)
    b2 = out[(2 * ctx + 1) // bw]  # doc 2: n = 2*ctx + 1
    assert (b2.n_seqs, b2.n_pad) == (3, ctx - 1)
    b3 = out[3 // bw]            # doc 3: n = 3
    assert (b3.n_seqs, b3.n_pad) == (1, ctx - 3)
