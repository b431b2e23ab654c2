"""BPE trainer parity: the distributed merge sequence must EXACTLY
equal a pure-Python classic-BPE reference (same greedy-left regex
application, same count-desc/pair-asc tiebreak), on a hand example and
on the sf0.001 documents corpus."""

import re
from collections import Counter

from pyspark.sql import functions as F

from sparkprep.operators import bpe


# --- pure-Python reference (Sennrich-style, word-level) ---------------

def _py_vocab(texts):
    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    return {" ".join(list(w)) + " " + bpe.END_OF_WORD: n for w, n in words.items()}


def _py_pairs(vocab):
    pairs = Counter()
    for sym, n in vocab.items():
        s = sym.split(" ")
        for a, b in zip(s, s[1:]):
            pairs[(a, b)] += n
    return pairs


def _py_apply(vocab, pair):
    a, b = pair
    pat = re.compile(rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)")
    return {pat.sub(lambda _: a + b, sym): n for sym, n in vocab.items()}


def py_bpe_train(texts, num_merges, min_count=2):
    vocab = _py_vocab(texts)
    merges = []
    for _ in range(num_merges):
        pairs = _py_pairs(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = _py_apply(vocab, (a, b))
    return merges


def py_bpe_encode(text, merges):
    toks = []
    for w in text.split():
        if not w:
            continue
        sym = " ".join(list(w)) + " " + bpe.END_OF_WORD
        for m in merges:
            a, b = m[0], m[1]
            pat = re.compile(rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)")
            sym = pat.sub(lambda _: a + b, sym)
        toks.extend(sym.split(" "))
    return toks


# --- tests ------------------------------------------------------------

def test_hand_example_merge_sequence(spark):
    # the classic low/lower/newest/widest example
    texts = ["low low low low low lower lower newest newest newest",
             "newest newest newest widest widest widest"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    vocab = bpe.word_vocab(df, "text")
    got = bpe.bpe_train(vocab, num_merges=8)
    want = py_bpe_train(texts, num_merges=8)
    assert got == want
    # sanity: 'e s' dominates (6x newest + 3x widest = 9)
    assert got[0][:2] == ("e", "s") and got[0][2] == 9


def test_merge_with_regex_metachars(spark):
    # words containing regex specials must merge literally, not as
    # patterns ($, ., *, backslash in symbols and replacements)
    texts = ["a$b a$b a$b x.y x.y x.y"] * 2
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe.bpe_train(bpe.word_vocab(df, "text"), num_merges=4)
    want = py_bpe_train(texts, num_merges=4)
    assert got == want


def test_corpus_merge_sequence_and_encode(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    texts = [r.text for r in docs.select("text").collect()]
    vocab = bpe.word_vocab(docs, "text")
    got = bpe.bpe_train(vocab, num_merges=12)
    want = py_bpe_train(texts, num_merges=12)
    assert got == want
    assert len(got) == 12  # corpus is large enough to support 12 merges
    # encode parity on a sample of documents
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe.bpe_encode(docs, "text", "doc_id", got)
        .limit(50).collect()
    }
    by_id = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, toks in enc.items():
        assert toks == py_bpe_encode(by_id[doc_id], got)
    # compression: learned merges shorten the char-level stream
    one = next(iter(enc))
    n_chars_plus_words = sum(len(w) + 1 for w in by_id[one].split())
    assert len(enc[one]) < n_chars_plus_words


def test_early_stop_below_min_count(spark):
    # every word unique -> every pair count 1 -> no merge at min_count=2
    df = spark.createDataFrame([("ab cd ef",)], ["text"])
    got = bpe.bpe_train(bpe.word_vocab(df, "text"), num_merges=5, min_count=2)
    assert got == []
