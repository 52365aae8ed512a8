"""BPE trainer/encoder (functions/bpe.py): hand-computed merge sequences,
determinism, and the Arrow-batched counting kernel."""

from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.functions import bpe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts_top_n_and_ties(spark):
    df = _docs(spark, [(1, "b b a a c"), (2, "a b")])
    wc = bpe.word_counts(df, "text", top_n=2)
    # a and b both occur 3 times; tie broken by word asc
    assert wc == [("a", 3), ("b", 3)]


def test_train_bpe_hand_sequence(spark):
    # corpus: aa x3, ab x1.  Pair counts round 1: (a,a)=3, (a,</w>)=3,
    # (a,b)=1, (b,</w>)=1; count tie (a,a) vs (a,</w>) breaks to the
    # lexicographically larger pair ('a','a') since 'a' > '<'.
    df = _docs(spark, [(1, "aa aa aa ab")])
    merges = bpe.train_bpe(df, "text", n_merges=3, min_freq=1)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("aa", bpe.END)
    assert merges[2] == ("b", bpe.END)
    # min_freq=2 stops after the frequency-3 merges
    assert bpe.train_bpe(df, "text", n_merges=3, min_freq=2) == merges[:2]


def test_train_bpe_deterministic(spark):
    df = _docs(
        spark,
        [(i, f"scan agg row w{i % 5} merge batch value") for i in range(60)],
    )
    m1 = bpe.train_bpe(df, "text", n_merges=20)
    m2 = bpe.train_bpe(df, "text", n_merges=20)
    assert m1 == m2 and len(m1) == 20


def test_encode_word_applies_rank_order():
    ranks = {("a", "a"): 0, ("aa", bpe.END): 1, ("b", bpe.END): 2}
    assert bpe.encode_word("aa", ranks) == ["aa" + bpe.END]
    assert bpe.encode_word("ab", ranks) == ["a", "b" + bpe.END]
    assert bpe.encode_word("ba", ranks) == ["b", "a", bpe.END]


def test_bpe_token_counts_kernel(spark):
    df = _docs(spark, [(1, "aa aa ab"), (2, "ba")])
    merges = [("a", "a"), ("aa", bpe.END), ("b", bpe.END)]
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_token_counts(df, "doc_id", "text", merges).collect()
    }
    assert out[1] == (3, 4)  # aa->1, aa->1, ab->2
    assert out[2] == (1, 3)  # b,a,</w> — no merge applies


def test_trained_tokenizer_compresses_corpus(spark):
    # end-to-end: training on the corpus must shorten its own encoding vs
    # the untrained (character-level) baseline
    df = _docs(
        spark,
        [(i, "transform aggregate window partition shuffle") for i in range(20)],
    )
    merges = bpe.train_bpe(df, "text", n_merges=40, min_freq=1)
    out = bpe.bpe_token_counts(df, "doc_id", "text", merges).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    baseline = bpe.bpe_token_counts(df, "doc_id", "text", []).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    assert out < baseline / 2


def test_greedy_equals_sequential_for_trained_merges(spark):
    """The bpe_tokens_fixed oracle relies on this: for a WELL-FORMED merge
    list (produced by train_bpe, so compound symbols exist before any later
    merge uses them), greedy lowest-rank-first encoding (encode_word) equals
    applying each merge exhaustively in rank order — the form that unrolls
    to chained string replaces in SQL."""

    def sequential(word, merges):
        sym = list(word) + [bpe.END]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    df = _docs(
        spark,
        [(i, "the quick brown foxes jumped over lazy rivers repeatedly "
             "partition shuffle window aggregate lulu pasta paris inner")
         for i in range(10)],
    )
    merges = bpe.train_bpe(df, "text", n_merges=60, min_freq=1)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    words = ("the quick brown foxes jumped over lazy rivers repeatedly "
             "partition shuffle window aggregate lulu pasta paris inner "
             "unseen zyzzyva transformers").split()
    for w in words:
        assert bpe.encode_word(w, ranks) == sequential(w, merges), w
