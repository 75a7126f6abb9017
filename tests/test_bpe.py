"""BPE training/encoding (operators/bpe.py) pinned against an independent
pure-Python reference implementation (the repo's contract for iterative
ops SQL can't express): exact merge-sequence equality and exact
segmentation equality, plus determinism under re-sharding."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    train_bpe,
    word_freqs,
)

# ---------------------------------------------------------------- reference


def _ref_words(texts):
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    return c


def _ref_pairs(symtab):
    pc = Counter()
    for syms, freq in symtab:
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += freq
    return pc


def _ref_merge(syms, left, right):
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _ref_train(texts, n_merges, min_pair_count=2):
    symtab = [
        (list(w) + [END_OF_WORD], f) for w, f in sorted(_ref_words(texts).items())
    ]
    merges = []
    for _ in range(n_merges):
        pc = _ref_pairs(symtab)
        if not pc:
            break
        # count DESC, pair ASC — the operator's deterministic tiebreak
        (left, right), count = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < min_pair_count:
            break
        merges.append((left, right, count))
        symtab = [(_ref_merge(s, left, right), f) for s, f in symtab]
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
        syms = list(w) + [END_OF_WORD]
        for left, right, *_ in merges:
            syms = _ref_merge(syms, left, right)
        toks.extend(syms)
    return toks


CORPUS = [
    "the lower the newer the lowest",
    "new newer newest lower lowest low",
    "the new low new low the the",
    "wider wide widest lower",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )


def test_word_freqs_match_reference(docs):
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == dict(_ref_words(CORPUS))


def test_merge_sequence_matches_reference_exactly(docs):
    got = train_bpe(docs, n_merges=12)
    want = _ref_train(CORPUS, n_merges=12)
    assert got == want
    assert len(got) >= 8  # the corpus genuinely supports this many merges


def test_early_stop_below_min_pair_count(spark):
    d = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once ⇒ nothing reaches min_pair_count=2
    assert train_bpe(d, n_merges=5) == []


def test_segmentation_matches_reference(docs):
    merges = train_bpe(docs, n_merges=10)
    got = {r.doc_id: (r.tokens, r.n_tokens) for r in apply_bpe(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        want = _ref_encode(text, merges)
        assert got[i][0] == want, f"doc {i}"
        assert got[i][1] == len(want)


def test_lossless_roundtrip(docs):
    merges = train_bpe(docs, n_merges=10)
    enc = apply_bpe(docs, merges)
    back = enc.select(
        "doc_id",
        F.array_join(F.col("tokens"), "").alias("joined"),
    ).collect()
    for r in back:
        words = "".join(re.findall(r"[a-z0-9]+", CORPUS[r.doc_id].lower()))
        assert r.joined.replace(END_OF_WORD, "") == words


def test_training_deterministic_under_resharding(docs):
    a = train_bpe(docs, n_merges=8)
    b = train_bpe(docs.repartition(7), n_merges=8)
    assert a == b


def test_encode_map_and_join_paths_identical(docs):
    # map_vocab_max=0 forces the posexplode+join reassembly path; both
    # encode strategies must produce identical segmentations, including
    # the empty-doc zero-fill
    merges = train_bpe(docs, n_merges=10)
    spark = docs.sparkSession
    with_empty = docs.unionByName(
        spark.createDataFrame([(99, ""), (100, None)], "doc_id long, text string")
    )
    a = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in apply_bpe(with_empty, merges).collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in apply_bpe(with_empty, merges, map_vocab_max=0).collect()
    )
    assert a == b
    assert (99, (), 0) in a and (100, (), 0) in a


def test_driver_and_distributed_paths_identical(docs):
    # driver_vocab_max=0 forces the distributed rounds; both paths must
    # train the identical merge sequence (the count-gate is an execution
    # strategy, never a semantics change)
    fast = train_bpe(docs, n_merges=10)
    dist = train_bpe(docs, n_merges=10, driver_vocab_max=0)
    assert fast == dist == _ref_train(CORPUS, n_merges=10)


def test_empty_and_null_docs(spark):
    d = spark.createDataFrame(
        [(0, "aa aa bb"), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = train_bpe(d, n_merges=3, min_pair_count=2)
    out = {r.doc_id: r.n_tokens for r in apply_bpe(d, merges).collect()}
    assert out[1] == 0 and out[2] == 0 and out[0] > 0


def test_incremental_trainer_matches_naive_loop(spark):
    # the lazy-heap incremental trainer must emit the identical merge
    # sequence as the O(n_merges x vocab) full-rescan loop — same counts,
    # same (count DESC, pair ASC) tiebreak — on a corpus rich enough to
    # exercise count collisions and pair re-creation
    import random

    from tabbyld_spark.operators.bpe import _train_driver_side

    rng = random.Random(7)
    alphabet = "abcd"
    wf = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 7)))
            for _ in range(300)
        }
    )
    wf = [(w, rng.randrange(1, 9)) for w in wf]

    def naive(wf, n_merges, min_pair_count):
        symtab = [(list(w) + [END_OF_WORD], f) for w, f in wf]
        merges = []
        for _ in range(n_merges):
            counts = {}
            for syms, f in symtab:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            (left, right), count = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if count < min_pair_count:
                break
            merges.append((left, right, count))
            symtab = [
                (_ref_merge(s, left, right), f) for s, f in symtab
            ]
        return merges

    for n_merges in (5, 40, 400):
        assert _train_driver_side(wf, n_merges, 2) == naive(wf, n_merges, 2)


def test_arrow_greedy_encoder_matches_expression_path(docs):
    # expr_merges_max=0 forces the Arrow mapInPandas greedy encoder; the
    # segmentation must be byte-identical to the in-expression replay (and
    # hence to the pure-Python reference), including empty/null docs
    merges = train_bpe(docs, n_merges=10)
    spark = docs.sparkSession
    with_empty = docs.unionByName(
        spark.createDataFrame([(99, ""), (100, None)], "doc_id long, text string")
    )
    expr = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in apply_bpe(with_empty, merges).collect()
    )
    arrow = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in apply_bpe(with_empty, merges, expr_merges_max=0).collect()
    )
    assert expr == arrow
    # and via the join reassembly path too (both gates forced at once)
    arrow_join = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in apply_bpe(
            with_empty, merges, expr_merges_max=0, map_vocab_max=0
        ).collect()
    )
    assert expr == arrow_join


def _rich_corpus(spark, n_docs=3000, words_per_doc=40, n_types=30_000, seed=11):
    # deterministic synthetic corpus with a vocabulary rich enough to
    # support a production-scale merge schedule
    import random

    rng = random.Random(seed)
    types = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randrange(3, 12)))
        for _ in range(n_types)
    ]
    docs = [
        (i, " ".join(types[min(int(rng.expovariate(1.0) * n_types / 8), n_types - 1)]
                      for _ in range(words_per_doc)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_production_scale_32k_merges(spark):
    # the verdict-gating case: train a 32k-merge tokenizer and ENCODE with
    # it — impossible on the expression path (O(n_merges) plan depth), the
    # whole point of the Arrow greedy encoder.  Checks: the schedule
    # actually reaches 32k merges, encode completes, output is lossless,
    # and the same encode is deterministic under resharding.
    d = _rich_corpus(spark)
    merges = train_bpe(d, n_merges=32_000, min_pair_count=2)
    assert len(merges) == 32_000
    enc = apply_bpe(d.filter(F.col("doc_id") < 300), merges)
    rows = enc.select(
        "doc_id", F.array_join("tokens", "").alias("joined"), "n_tokens"
    ).collect()
    assert len(rows) == 300
    texts = {r.doc_id: r.text for r in d.filter(F.col("doc_id") < 300).collect()}
    for r in rows:
        want = "".join(re.findall(r"[a-z0-9]+", texts[r.doc_id].lower()))
        assert r.joined.replace(END_OF_WORD, "") == want
    a = sorted(
        (r.doc_id, r.n_tokens)
        for r in apply_bpe(
            d.filter(F.col("doc_id") < 300).repartition(13), merges
        ).collect()
    )
    b = sorted((r.doc_id, r.n_tokens) for r in rows)
    assert a == b
