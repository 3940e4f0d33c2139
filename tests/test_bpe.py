"""BPE tokenizer training/encoding (operators/bpe.py, driver queries
tk1/tk2): merges pinned against a pure-Python reference implementation
(per-round weighted pair count, deterministic argmax, greedy
left-to-right non-overlapping merge), plus the overlap edge case the
double-separator replace format exists for."""

from __future__ import annotations

from collections import Counter

from crawler_spark.operators.bpe import (
    encode_token_counts, train_merges, word_counts,
)


def _ref_train(word_freq: dict[str, int], k: int):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for w, f in word_freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low lower lower"),
    (2, "newest newest newest newest newest newest"),
    (3, "widest widest widest low"),
    (4, "aaaa aaaa aa"),          # overlap: merge (a,a) must be greedy
    (5, "don't keep-me"),         # non-alnum words are excluded
]

WORD_FREQ = {
    "low": 4, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2, "aa": 1,
}


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_word_counts_filters_and_weights(spark):
    got = {r.word: r.wcount for r in word_counts(_df(spark)).collect()}
    assert got == WORD_FREQ


def test_train_matches_reference_bpe(spark):
    k = 5
    got = [(r.left_sym, r.right_sym, r.pair_count)
           for r in sorted(train_merges(_df(spark), k=k).collect(),
                           key=lambda r: r.merge_rank)]
    exp, _ = _ref_train(WORD_FREQ, k)
    assert got == exp


def test_overlapping_merge_is_greedy(spark):
    # corpus where (a, a) is the first merge: "aaaa" -> [aa, aa] (2
    # symbols, never 3) and "aa" -> [aa] (1)
    df = spark.createDataFrame([(1, "aaaa aa b")],
                               "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in encode_token_counts(df, k=1).collect()}
    assert got == {1: 2 + 1 + 1}


def test_encode_matches_reference(spark):
    k = 5
    got = {r.doc_id: r.n_bpe_tokens
           for r in encode_token_counts(_df(spark), k=k).collect()}
    _, vocab = _ref_train(WORD_FREQ, k)
    exp: dict[int, int] = {}
    for doc_id, text in CORPUS:
        n = sum(len(vocab[w]) for w in text.lower().split() if w in vocab)
        if n:
            exp[doc_id] = n
    assert got == exp


def test_encode_word_stats_consistent_with_token_counts(spark):
    """tk3's per-doc sums must agree with encode_token_counts on tokens
    and with direct word arithmetic on words/chars."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.bpe import (
        encode_token_counts, encode_word_stats,
    )
    rows = [(1, "the cat sat on the mat"),
            (2, "aaaa aaaa bbbb Mixed-Case! 99 bottles"),
            (3, "punctuation only !!! ???")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r["doc_id"]: r for r in encode_word_stats(df, k=3).collect()}
    tc = {r["doc_id"]: r["n_bpe_tokens"]
          for r in encode_token_counts(df, k=3).collect()}
    assert {d: r["n_bpe_tokens"] for d, r in st.items()} == tc
    # doc 3: only 'punctuation' and 'only' survive the ^[a-z0-9]+$
    # word filter ('!!!' and '???' drop). chars/words by hand:
    assert st[3]["n_words"] == 2
    assert st[3]["n_chars"] == len("punctuation") + len("only")
    for r in st.values():
        assert r["n_bpe_tokens"] >= r["n_words"]     # merges never cross words
        assert r["n_chars"] >= r["n_bpe_tokens"]     # a token is >= 1 char


def test_oov_rate_vocab_fit_on_train_only(spark):
    """The vocab must come from the TRAIN slice: a word frequent in the
    held-out slice but absent from train counts as OOV no matter how
    common it is in val."""
    from crawler_spark.operators.bpe import oov_rate
    import hashlib
    # find doc ids whose md5 coin puts them in the 5% held-out slice
    def is_val(source, doc_id):
        h = hashlib.md5(f"{source}/{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 1000 < 50
    val_ids = [i for i in range(2000) if is_val("s", i)][:3]
    train_ids = [i for i in range(2000) if not is_val("s", i)][:6]
    rows = ([(i, "common words here", "en", "s") for i in train_ids]
            + [(i, "valonly valonly common", "en", "s") for i in val_ids])
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = oov_rate(d, v=3).collect()
    assert len(out) == 1
    r = out[0]
    # val tokens: 3 per doc x 3 docs = 9; 'valonly' (6 occurrences) is
    # not in the train vocab {'common','words','here'} -> 6 OOV
    assert r["n_words"] == 9 and r["n_oov"] == 6
    assert r["oov_rate"] == round(6 / 9, 4)


def test_oov_rate_full_vocab_zero(spark):
    """With v large enough to hold every train word and identical
    val text, OOV is zero."""
    from crawler_spark.operators.bpe import oov_rate
    import hashlib
    def is_val(source, doc_id):
        h = hashlib.md5(f"{source}/{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 1000 < 50
    val_id = next(i for i in range(2000) if is_val("s", i))
    train_id = next(i for i in range(2000) if not is_val("s", i))
    d = spark.createDataFrame(
        [(train_id, "a b c", "en", "s"), (val_id, "a b c", "en", "s")],
        "doc_id long, text string, lang string, source string")
    r = oov_rate(d, v=10).collect()[0]
    assert r["n_oov"] == 0 and r["oov_rate"] == 0.0
