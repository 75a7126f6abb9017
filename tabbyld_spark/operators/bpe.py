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

``apply_bpe`` replays the merge list in rank order (N chained folds).
That is the right shape for bounded merge counts (the common "train a
small domain tokenizer" case); a production 50k-merge encode would hop to
an Arrow ``mapInPandas`` greedy encoder against the broadcast merge ranks
— the documented Python seam, same pattern as ``multimodal.py``.
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


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    cut_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges → [(left, right, count)] in rank
    order.  Stops early when no pair reaches ``min_pair_count``.  The merge
    list is deterministic (count DESC, pair ASC tiebreak) and bounded —
    one 1-row collect per round against the word-TYPE table."""
    symtab = cut(_initial_symbols(word_freqs(docs, text_col)))
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


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, tokens, n_tokens): segment every document with the
    trained merges, replayed in rank order (N chained folds — see module
    docstring for the large-N seam).  Tokens from different words never
    fuse: each word carries its own end-of-word marker."""
    def _encode_word(w: Column) -> Column:
        syms = F.concat(F.split(w, ""), F.array(F.lit(END_OF_WORD)))
        for m in merges:
            syms = _fuse(syms, m[0], m[1])
        return syms

    tokens = F.flatten(F.transform(_words(text_col), _encode_word))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens.alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))
