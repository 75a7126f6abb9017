"""Distributed BPE tokenizer training — byte-pair merges over a corpus.

Sennrich et al. 2016 (arXiv:1508.07909) train subword vocabularies by
repeatedly merging the most frequent adjacent symbol pair.  The classic
scale trick — and the one that makes this tractable at 100 TB — is that
merges are a function of the WORD-TYPE frequency table, not of every token
occurrence: one corpus pass aggregates (word, freq), and every merge round
after that runs on the word-type table (≈ vocabulary-sized, millions of
rows at web scale — not trillions).

Per round, everything is columnar:

* adjacent pairs: one in-expression ``zip_with`` of the symbol array with
  its own tail — no explode until the (pair)-grain count, which map-side
  combines to the tiny distinct-pair table;
* winner: (count DESC, pair ASC) — the deterministic tiebreak makes the
  whole merge sequence a pure function of the corpus, so retries,
  re-shards, and re-runs train the identical tokenizer (the same
  determinism contract as every other operator here).  One 1-row collect
  per round — the driver-loop fixpoint pattern of ``operators/closure.py``;
* merge application: a single left-fold (``F.aggregate``) over each symbol
  array — append-or-fuse against the winning pair, never per-offset
  substring;
* lineage: cut every ``cut_every`` rounds (the symbol table is re-derived
  through N chained folds otherwise — the plan-depth trap
  ``plans/webcorpus.py`` documents).

Verification: SQL cannot express a data-dependent N-round recursion, so
(per the repo's contract for iterative ops) training is pinned against an
independent pure-Python reference implementation in ``tests/test_bpe.py``
— exact merge-sequence and segmentation equality — instead of a DuckDB
twin; the per-round pair-count aggregation itself is trivially the same
shape the twinned n-gram operators already prove out.

``apply_bpe`` encodes ONCE PER DISTINCT WORD (a word's segmentation
depends only on the word — the same word-type trick as training), then
maps occurrences through the encoded vocabulary: a single broadcast MAP
value for bounded vocabularies (zero corpus shuffle), or posexplode +
vocab equi-join + positional reassembly beyond that.  The per-word encode
itself is count-gated: an in-expression merge-replay fold for small merge
lists (zero Python), and past ``expr_merges_max`` the Arrow
``mapInPandas`` greedy encoder against broadcast merge ranks — the same
executor-side-Python pattern as ``multimodal.py`` — which is what lets a
production 32k–50k-merge tokenizer run (an O(n_merges)-deep expression
chain breaks Catalyst long before data size matters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut

__all__ = ["word_freqs", "train_bpe", "apply_bpe", "END_OF_WORD"]

# end-of-word marker (Sennrich): lets merges distinguish suffixes from
# mid-word sequences; chosen outside the [a-z0-9] word alphabet
END_OF_WORD = "▁"

WORD_RE = r"[a-z0-9]+"


def _words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(WORD_RE), 0)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the ONE corpus-scale pass.  Everything after
    runs at word-type grain."""
    return (
        docs.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) → (word, freq, syms): chars + the end-of-word marker."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )


def _adjacent_pair_counts(symtab: DataFrame) -> DataFrame:
    """(word, freq, syms) → (left, right, count): freq-weighted adjacent
    pair counts.  Pairs are built in-expression; the explode lands directly
    on the count whose map-side combine shrinks it to distinct pairs."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("syms", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        symtab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("count"))
    )


def _fuse(syms: Column, left: str, right: str) -> Column:
    """One merge applied to a symbol array: left-fold append-or-fuse."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """One merge applied left-to-right — the reference fold semantics."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _train_driver_side(
    wf: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """The same algorithm on a collected (word, freq) table — used when the
    vocabulary fits the driver (see train_bpe).  Deterministic tiebreak
    identical to the distributed rounds.

    Incremental (the subword-nmt trainer shape): pair counts and a
    pair→containing-words index are maintained under each merge — only the
    words that CONTAIN the winning pair are re-segmented, and the winner
    comes off a lazy max-heap keyed (count DESC, pair ASC), so a
    production 32k-merge schedule is O(touched words) per round instead of
    O(vocabulary) — the naive full-rescan loop is O(n_merges × vocab) and
    cannot reach 32k merges in reasonable time.  Exact-output equivalence
    with the naive loop is pinned in tests/test_bpe.py (same counts, same
    tiebreak — the heap is an execution strategy, not a semantics
    change)."""
    import heapq
    from collections import Counter

    words = [list(w) + [END_OF_WORD] for w, _ in wf]
    freqs = [f for _, f in wf]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(idx)
    # lazy heap: (-count, pair) tuples — heap min IS (count DESC, pair ASC);
    # every count update pushes a fresh entry, stale entries are skipped on
    # pop (entry count ≠ current count)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < int(n_merges) and heap:
        negc, p = heapq.heappop(heap)
        count = -negc
        if counts.get(p, 0) != count:
            continue  # stale
        if count < min_pair_count:
            break
        left, right = p
        merges.append((left, right, count))
        touched: set[tuple[str, str]] = set()
        for idx in where.get(p, set()).copy():
            syms, f = words[idx], freqs[idx]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _merge_word(syms, left, right)
            new = Counter(zip(new_syms, new_syms[1:]))
            words[idx] = new_syms
            for q in old.keys() | new.keys():
                d = new.get(q, 0) - old.get(q, 0)
                if d == 0:
                    continue
                counts[q] = counts.get(q, 0) + d * f
                touched.add(q)
                if counts[q] <= 0:
                    del counts[q]
                    where.pop(q, None)
                elif new.get(q, 0) > 0:
                    where.setdefault(q, set()).add(idx)
            for q in old.keys() - new.keys():
                if q in where:
                    where[q].discard(idx)
        for q in touched:
            if q in counts:
                heapq.heappush(heap, (-counts[q], q))
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    cut_every: int = 4,
    driver_vocab_max: int = 200_000,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges → [(left, right, count)] in rank
    order.  Stops early when no pair reaches ``min_pair_count``.  The merge
    list is deterministic (count DESC, pair ASC tiebreak) either way.

    Count-gated hybrid (the ``count_gated_hint`` pattern): the word-type
    table is vocabulary-sized, so when its EXACT row count is at most
    ``driver_vocab_max`` the merge loop runs driver-side on the collected
    table — same algorithm, same tiebreak, identical output — instead of
    paying ~2 Spark jobs per round for a few-thousand-row frame.  A true
    web-scale vocabulary (tens of millions of types) exceeds the gate and
    takes the distributed rounds, where each round is one map-side-combined
    pair count + a 1-row TakeOrdered collect."""
    wf_df = word_freqs(docs, text_col)
    wf_df = cut(wf_df)
    n_types = wf_df.count()
    if n_types <= int(driver_vocab_max):
        wf = sorted((r["word"], int(r["freq"])) for r in wf_df.collect())
        return _train_driver_side(wf, n_merges, min_pair_count)
    symtab = cut(_initial_symbols(wf_df))
    merges: list[tuple[str, str, int]] = []
    for rnd in range(int(n_merges)):
        top = (
            _adjacent_pair_counts(symtab)
            .orderBy(F.col("count").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["count"] < min_pair_count:
            break
        left, right, count = top[0]["left"], top[0]["right"], int(top[0]["count"])
        merges.append((left, right, count))
        symtab = symtab.select("word", "freq", _fuse(F.col("syms"), left, right).alias("syms"))
        if (rnd + 1) % cut_every == 0:
            symtab = cut(symtab)
    return merges


def _greedy_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-priority BPE encode of one word — the huggingface/GPT-2
    encode loop: repeatedly apply the LOWEST-RANKED pair present (all its
    occurrences, left-to-right), until none remains.

    For merge lists produced by BPE TRAINING this is exactly equivalent to
    replaying every merge in rank order: a merge's two symbols must already
    exist when it is learned, so any pair a merge round creates can only
    involve symbols minted at lower ranks — the lowest-ranked pair present
    is always the next one sequential replay would apply, and within one
    rank the left-to-right pass matches the replay fold.  (Equality is
    pinned against the expression path and the pure-Python reference in
    tests/test_bpe.py.)  O(len²·log) per word against O(n_merges·len) for
    replay — independent of vocabulary size, which is what makes a
    32k-merge encode tractable."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair[0], best_pair[1])
    return syms


def _encode_vocab_arrow(
    vocab: DataFrame, merges: list[tuple[str, str, int]] | list[tuple[str, str]]
) -> DataFrame:
    """(word) vocabulary table → (word, toks) via the Arrow ``mapInPandas``
    greedy encoder — the production path for realistic merge counts, where
    the expression-chain replay would be an O(n_merges)-deep Catalyst plan
    (codegen/analysis limits break near a few hundred merges, a 32k-merge
    tokenizer is ~100× past that).  The merge ranks broadcast once per
    executor; per-batch work is pure Python over word TYPES (vocabulary
    grain — the corpus never enters Python), Arrow both ways."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    bc = vocab.sparkSession.sparkContext.broadcast(ranks)

    def encode_batches(batches):
        import pandas as pd

        r = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": [_greedy_encode_word(w, r) for w in pdf["word"]],
                }
            )

    return vocab.mapInPandas(encode_batches, "word string, toks array<string>")


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    map_vocab_max: int = 100_000,
    expr_merges_max: int = 96,
) -> DataFrame:
    """→ (doc_id, tokens, n_tokens): segment every document with the
    trained merges.  Tokens from different words never fuse: each word
    carries its own end-of-word marker.

    A word's segmentation depends only on the word, so the N-fold merge
    replay runs ONCE PER DISTINCT WORD (vocabulary grain — the same
    word-type trick as training; higher-order-function folds are
    interpreted, so paying them per occurrence is the difference between
    seconds and hours at corpus scale).  Occurrences then map through the
    encoded vocabulary:

    * vocab ≤ ``map_vocab_max``: the word→tokens table collapses into a
      single broadcast MAP value and every doc is one zero-shuffle
      projection (``element_at`` per word + flatten).
    * larger vocab: posexplode occurrences, equi-join the encoded
      vocabulary (Catalyst broadcasts it while it fits), reassemble in
      position order — one doc-grain shuffle, never a per-occurrence fold.

    Count-gated ENCODE shape: up to ``expr_merges_max`` merges the replay
    is an in-expression ``_fuse`` chain (whole-stage codegen, zero
    Python); past the gate — production tokenizers run 32k–50k merges,
    where an O(n_merges)-deep expression tree breaks codegen/analysis —
    the vocabulary encodes through the Arrow greedy encoder
    (:func:`_encode_vocab_arrow`), exact-output-identical by the rank
    argument on :func:`_greedy_encode_word`.
    """

    def _encode_word(w: Column) -> Column:
        syms = F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))
        for m in merges:
            syms = _fuse(syms, m[0], m[1])
        return syms

    base = docs.select(F.col(id_col).alias("doc_id"), _words(text_col).alias("ws"))
    vocab = base.select(F.explode("ws").alias("word")).distinct()
    if len(merges) <= int(expr_merges_max):
        enc = vocab.select("word", _encode_word(F.col("word")).alias("toks"))
    else:
        enc = _encode_vocab_arrow(vocab, merges)
    n_vocab = enc.count()
    if n_vocab <= int(map_vocab_max):
        vocab_map = enc.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("word"), F.col("toks")))
            ).alias("m")
        )
        return (
            base.crossJoin(F.broadcast(vocab_map))
            .select(
                "doc_id",
                F.flatten(
                    F.transform("ws", lambda w: F.element_at(F.col("m"), w))
                ).alias("tokens"),
            )
            .withColumn("n_tokens", F.size("tokens"))
        )
    occ = base.select("doc_id", F.posexplode("ws").alias("pos", "word"))
    rebuilt = (
        occ.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
    )
    return (
        base.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
