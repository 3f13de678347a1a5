"""Text analysis operators for large-scale corpus pipelines:
tokenization, shingling, quality scoring, language-ID heuristic,
document fingerprints, SimHash.

Design rule: every operator is a composition of built-in JVM-side
``pyspark.sql.functions`` (no Python UDFs in the hot path), and each
primitive has an exactly-equivalent DuckDB SQL formulation (shared
hashing base: ``int(md5(x)[:8], 16)``) so the driver's oracle can
verify results value-for-value. At 100 TB these run as narrow
map-side column expressions inside whole-stage codegen — no shuffle
except for the final aggregation a caller adds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Fixed stopword list (shared with the oracle SQL).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Marker vocabularies for the deterministic language-ID heuristic.
# (The heuristic is the operator under test — a production system
# would plug a real model into the same shape.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "fast", "query", "join"),
    "de": ("der", "und", "nicht", "schnell", "gruppe"),
    "es": ("el", "la", "los", "rapido", "consulta"),
    "fr": ("le", "la", "les", "vite", "jointure"),
    "zh": ("shi", "bu", "wo", "kuai", "biao"),
}

PUNCT_CLASS = "[.,;:!?]"
_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties filtered.

    DuckDB twin: ``list_filter(regexp_split_to_array(lower(trim(x)),
    '\\s+'), t -> t != '')``.
    """
    return F.filter(
        F.split(F.lower(F.trim(col)), _WS), lambda t: t != F.lit("")
    )


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles joined by single spaces (distinct set).

    Built by zipping the token array with its own shifted slices:
    ``zip_with`` evaluates each array argument ONCE PER ROW, whereas
    the natural ``transform(sequence, i -> element_at(tok, i+j))``
    formulation re-inlines the whole tokenize expression per element
    (Catalyst project collapse), i.e. O(len²) per document. Trailing
    partial grams surface as nulls (zip_with pads the shorter side)
    and are filtered — texts shorter than n tokens yield [].

    DuckDB twin: ``list_distinct(list_transform(range(1,
    greatest(len(w)-(n-2), 1)), i -> w[i] || ' ' || ... w[i+n-1]))``.
    """
    grams = tok
    for j in range(1, n):
        shifted = F.slice(tok, j + 1, F.greatest(F.size(tok) - j, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.array_distinct(F.filter(grams, lambda x: x.isNotNull()))


def explode_nonnull(df: DataFrame, arr, alias: str, *, keep=()) -> DataFrame:
    """Explode an EXPENSIVE computed array without waking Catalyst's
    ``InferFiltersFromGenerate``.

    A plain (non-outer) explode of a projected ATTRIBUTE lets the
    optimizer infer ``size(arr) > 0 AND isnotnull(arr)`` and push it
    below any exchange into the scan stage, where project collapse
    inlines the array's whole computing pipeline (tokenize / shingle /
    md5 / segment) into the filter — an extra 2× evaluation per row,
    often on the single-task pre-shuffle side (round-14 §16-17 finding;
    duplicate_span_removal went 3.3 s → 1.0 s on this alone).
    ``explode_outer`` admits no such inference, and the ``isNotNull``
    filter on the GENERATED column keeps the row set identical —
    an outer explode emits exactly one null element for the null /
    empty arrays a plain explode drops — provided array ELEMENTS are
    never null, which every call site's builder guarantees
    (tests/test_llm_ops.py pins it for shingles / hashed_shingles).

    Use for attribute explodes of expensive arrays. For INLINE
    expression explodes the inference never fires and plain explode
    is marginally faster (decontamination_overlap, round-15 A/B).

    ``keep``: columns/names projected alongside the exploded value.
    """
    cols = [c if isinstance(c, Column) else F.col(c) for c in keep]
    return df.select(
        *cols, F.explode_outer(arr).alias(alias)
    ).filter(F.col(alias).isNotNull())


def md5_int(col: Column) -> Column:
    """Deterministic 32-bit integer hash shared with DuckDB:
    ``CAST(('0x' || substr(md5(x),1,8)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_int60(col: Column) -> Column:
    """60-bit variant (15 hex chars): collision odds ~n²/2^61 — used
    where a set of hashed values must behave exactly like the set of
    originals (e.g. Jaccard on hashed shingles)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int_lo(col: Column) -> Column:
    """Second 32-bit word of the md5 (hex chars 9-16) — with
    :func:`md5_int` this yields 64 independent hash bits as two
    engine-portable halves (a single signed BIGINT cannot carry bit
    63 in DuckDB, whose ``1 << 63`` overflows)."""
    return F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, restricted to constructs that
# behave identically in Java regex (Spark) and RE2 (DuckDB): no
# lookahead, explicit ASCII classes, leftmost-first alternation.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Token count under a BPE-ish pre-tokenization (contractions,
    space-prefixed words/numbers/punct runs, whitespace runs) — the
    cheap proxy for "how many LLM tokens is this document" used to
    budget training data. Pure JVM regex, one pass; ``regexp_count``
    counts matches without materializing the match array."""
    return F.regexp_count(col, F.lit(BPE_PATTERN))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars per char (guard: 0 for empty text)."""
    n = F.length(col)
    pc = F.regexp_count(col, F.lit(PUNCT_CLASS))
    return F.when(n > 0, pc / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    tok = tokens(col)
    n = F.size(tok)
    sw = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))
    return F.when(n > 0, sw / n).otherwise(F.lit(0.0))


def mean_token_len(col: Column) -> Column:
    tok = tokens(col)
    total = F.aggregate(
        F.transform(tok, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(F.size(tok) > 0, total / F.size(tok)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, some
    stopwords, few punctuation bursts, sane word lengths — the
    standard pre-training cheap filter shape."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.least(sw / F.lit(0.2), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 10)
    mtl = mean_token_len(col)
    mtl_score = F.when((mtl >= 3) & (mtl <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score + sw_score + punct_score + mtl_score) / 4


def bow_fingerprint(col: Column) -> Column:
    """Order-invariant bag-of-words fingerprint: md5 of the sorted
    distinct token set (near-dup invariant to shuffling)."""
    tok = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.concat_ws(" ", tok))


def lang_scores(col: Column) -> list[Column]:
    """Per-language marker-hit counts over the distinct token set.

    Column form — deriving all 5 from one raw text column re-inlines
    the tokenize pipeline per language via project collapse; prefer
    :func:`lang_id_df` on DataFrames (tokenizes once per row)."""
    tok = F.array_distinct(tokens(col))
    return [
        F.size(F.filter(tok, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def once_per_row(df: DataFrame, exprs: dict[str, Column]) -> DataFrame:
    """Append columns whose expressions are guaranteed to evaluate
    ONCE per row, shielded from Catalyst project collapse.

    ``explode(array(e1, ..., ek))`` would multiply rows; instead each
    expression is wrapped in a single-element array and a struct, and
    one ``explode(array(struct(...)))`` Generate node materializes all
    of them.  A Generate is a projection barrier: downstream projects
    reference its output attributes and cannot re-inline the producing
    expressions — the documented fix shape for the k-fold
    project-collapse recompute hazard (lambda-bearing expressions are
    also excluded from codegen subexpression elimination, so the
    barrier is the only reliable guard for higher-order-function
    pipelines like tokenize).

    Narrow, zero-shuffle, whole-stage-codegen friendly; the arity of
    the outer array is exactly 1, so row count is preserved (including
    empty/null inputs).
    """
    payload = F.explode(
        F.array(F.struct(*[e.alias(name) for name, e in exprs.items()]))
    ).alias("__once")
    out = df.select("*", payload)
    for name in exprs:
        out = out.withColumn(name, F.col(f"__once.{name}"))
    return out.drop("__once")


def with_pred_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``pred_lang``: argmax of per-language marker hits over
    the distinct token set, first-wins tiebreak in LANG_MARKERS order.
    Tokenizes ONCE per row (map-side, zero shuffle) behind a
    :func:`once_per_row` barrier; the round-1 column form paid a
    5-fold tokenize recompute via project collapse."""
    base = once_per_row(
        df, {"__tok": F.array_distinct(tokens(F.col(text_col)))}
    )
    tok = F.col("__tok")
    scored = once_per_row(
        base,
        {
            f"score_{lang}": F.size(
                F.filter(tok, lambda t: t.isin(*markers))
            )
            for lang, markers in LANG_MARKERS.items()
        },
    )
    mx = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    expr = None
    for lang in LANG_MARKERS:
        cond = F.col(f"score_{lang}") == mx
        expr = (
            F.when(cond, F.lit(lang))
            if expr is None
            else expr.when(cond, F.lit(lang))
        )
    scored = scored.withColumn("pred_lang", expr)
    return scored.drop(
        "__tok", *[f"score_{lang}" for lang in LANG_MARKERS]
    )


def lang_id_df(
    df: DataFrame, id_col: str, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Language-ID result frame: id, pred_lang, is_match (pred vs the
    labeled lang column).  See :func:`with_pred_lang`."""
    pred = with_pred_lang(df.select(id_col, lang_col, text_col), text_col)
    return pred.select(
        F.col(id_col),
        F.col("pred_lang"),
        (F.col("pred_lang") == F.col(lang_col)).alias("is_match"),
    )


SIMHASH_BITS = 60  # 15 md5 hex chars; see the scale note below


def simhash60(col: Column) -> Column:
    """60-bit SimHash over the distinct token set (Column form for
    small inputs; prefer :func:`simhash_signatures` on DataFrames —
    the per-bit array filters here re-scan the hash array 60 times).

    bit j of the result is 1 iff the majority of tokens have bit j
    set in their md5-based hash (ties -> 0).

    WHY 60 bits, not 32: banded-LSH candidate volume is
    ``n² × bands / 2^(bits/bands)`` REGARDLESS of similarity — with a
    32-bit hash and 4 bands every band key has only 256 values, so
    buckets grow linearly with the corpus and candidate pairs
    quadratically (an 8× scale probe measured 18.5× runtime). 60 bits
    gives 15-bit band keys (32768 values) — 128× lower per-band
    collision rate — while staying portable: 15 md5 hex chars fit a
    signed BIGINT in Spark, Python and DuckDB alike (``md5_int60``).
    """
    tok = F.array_distinct(tokens(col))
    hashes = F.transform(tok, md5_int60)
    n = F.size(tok)
    bits = []
    for j in range(SIMHASH_BITS):
        ones = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << j)) != 0)
        )
        bits.append(F.when(ones * 2 > n, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per row, explode + one hash aggregation (see
    :func:`simhash60` for the width rationale).

    Tokens are hashed ONCE; the 60 per-bit majority votes are 60 sum
    aggregates over the exploded rows (the Column form re-scans the
    hash array per bit; Catalyst's project collapse makes that a
    60-fold recompute of the tokenize/md5 pipeline). Rows with no
    tokens drop out, matching the SQL twin's unnest.
    """
    hv = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    ).select(F.col(id_col), md5_int60(F.col("t")).alias("hv"))
    # SQL-string form, not per-bit Column builders: every Column op is
    # a synchronous py4j round-trip (~0.4 ms), and 60 votes built op
    # by op cost ~400 of them — measured 0.8 s of pure driver latency
    # constructing this one plan. One expr() parse per vote and ONE
    # for the 60-term reassembly fold produce the identical analyzed
    # plan (same functions, same literals) for ~65 round-trips.
    votes = [
        F.expr(f"sum((shiftright(hv, {j}) & 1) * 2 - 1) AS b{j}")
        for j in range(SIMHASH_BITS)
    ]
    bits = hv.groupBy(id_col).agg(*votes)
    out = F.expr(
        "CAST(0 AS BIGINT) + "
        + " + ".join(
            f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(SIMHASH_BITS)
        )
    )
    return bits.select(F.col(id_col), out.alias("simhash"))


def simhash_signatures_wide(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """64-bit SimHash as TWO 32-bit halves ``(sim_hi, sim_lo)`` — the
    100-TB form SCALE.md names (16-bit band keys over 64 hash bits =
    65536-value bands, 2x lower per-band collision rate than the
    60-bit/15-bit default). Two halves instead of one BIGINT because
    bit 63 of a signed 64-bit value is not constructible in DuckDB
    SQL (``1::BIGINT << 63`` overflows), and the oracle must replay
    the signature bit-exactly; Hamming distance is simply the sum of
    the halves' distances. Same one-pass explode + 64 vote aggregates
    plan as :func:`simhash_signatures`."""
    hv = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    ).select(
        F.col(id_col),
        md5_int(F.col("t")).alias("hhi"),
        md5_int_lo(F.col("t")).alias("hlo"),
    )
    # expr-string form for the same reason as simhash_signatures: 64
    # per-bit Column builders cost ~400 py4j round-trips of pure
    # driver latency; the parsed plan is identical.
    votes = [
        F.expr(f"sum((shiftright({h}, {j}) & 1) * 2 - 1) AS {tag}{j}")
        for tag, h in (("a", "hhi"), ("b", "hlo"))
        for j in range(32)
    ]
    bits = hv.groupBy(id_col).agg(*votes)
    out = {}
    for tag, name in (("a", "sim_hi"), ("b", "sim_lo")):
        out[name] = F.expr(
            "CAST(0 AS BIGINT) + "
            + " + ".join(
                f"(CASE WHEN {tag}{j} > 0 THEN {1 << j} ELSE 0 END)"
                for j in range(32)
            )
        )
    return bits.select(
        F.col(id_col), out["sim_hi"].alias("sim_hi"),
        out["sim_lo"].alias("sim_lo"),
    )


def text_stats_df(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document text statistics, fully MAP-SIDE: one narrow
    projection, zero shuffle.  The token array is materialized once
    per row behind a :func:`once_per_row` Generate barrier (the
    per-column expression form in :func:`with_text_stats` re-runs the
    split for every stat via project collapse; the round-1 explode +
    groupBy shape shuffled every token of the corpus just to rebuild
    the per-document fingerprint).  At 100 TB this runs inside the
    scan stage — nothing moves.

    Output: id, n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio,
    mean_token_len, fingerprint.
    """
    c = F.col(text_col)
    base = once_per_row(
        df.select(
            F.col(id_col),
            F.length(c).alias("__n_chars"),
            F.regexp_count(c, F.lit(PUNCT_CLASS)).alias("__pc"),
            bpe_token_count(c).alias("n_bpe_tokens"),
            c.alias("__text"),
        ),
        {"__tok": tokens(F.col("__text"))},
    )
    tok = F.col("__tok")
    n = F.size(tok)
    sw = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))
    tl = F.aggregate(
        F.transform(tok, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return base.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens"),
        F.round(
            F.when(
                F.col("__n_chars") > 0, F.col("__pc") / F.col("__n_chars")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.when(n > 0, sw.cast("long") / n).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n > 0, tl.cast("long") / n).otherwise(F.lit(0.0)), 6
        ).alias("mean_token_len"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tok)))
        ).alias("fingerprint"),
    )


def max_multiplicity(arr: Column) -> Column:
    """Largest multiplicity of any element of a string array, computed
    MAP-SIDE: sort the array so equal elements are contiguous, then one
    ``F.aggregate`` left fold tracks (prev, current run, best run).
    The distributed alternative (explode + groupBy + max(count)) ships
    every token of the corpus through a shuffle just to answer a
    per-row question — this stays inside the scan stage at any scale.
    Empty arrays yield 0."""
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(srt, init, step, lambda acc: acc["best"])


def bigrams(tok: Column) -> Column:
    """Word 2-grams WITH multiplicity (unlike :func:`shingles`, which
    dedups) — repetition signals need the counts. Same zip-with-shift
    construction; trailing null pad filtered."""
    shifted = F.slice(tok, 2, F.greatest(F.size(tok) - 1, F.lit(0)))
    grams = F.zip_with(tok, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(grams, lambda x: x.isNotNull())


def repetition_stats_df(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document, fully
    map-side (zero shuffle): highly repetitive documents (keyword
    stuffing, boilerplate, degenerate generations) are the first thing
    a pre-training curation pass drops.

    Output per row:
    - ``dup_token_frac``  — 1 - distinct/total tokens (0 if empty);
    - ``top_token_frac``  — multiplicity of the most frequent token
      over total tokens;
    - ``top_bigram_frac`` — multiplicity of the most frequent word
      2-gram over total 2-grams (0 if fewer than 2 tokens).

    One tokenize pass per row behind a :func:`once_per_row` barrier;
    the multiplicity maxima use :func:`max_multiplicity` (sorted-array
    run length), NOT explode+groupBy — nothing leaves the scan stage.
    """
    base = once_per_row(
        df.select(F.col(id_col), F.col(text_col).alias("__text")),
        {"__tok": tokens(F.col("__text"))},
    )
    mids = once_per_row(
        base,
        {
            "__n": F.size(F.col("__tok")),
            "__nd": F.size(F.array_distinct(F.col("__tok"))),
            "__mt": max_multiplicity(F.col("__tok")),
            "__g2": bigrams(F.col("__tok")),
        },
    )
    out = once_per_row(
        mids,
        {"__ng": F.size(F.col("__g2")), "__mg": max_multiplicity(F.col("__g2"))},
    )
    n, nd = F.col("__n"), F.col("__nd")
    ng = F.col("__ng")
    return out.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(
            F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("dup_token_frac"),
        F.round(
            F.when(n > 0, F.col("__mt").cast("double") / n).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("top_token_frac"),
        F.round(
            F.when(ng > 0, F.col("__mg").cast("double") / ng).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_frac"),
    )


# ------------------------------------------- Gopher rule-based filter
# Thresholds from the Gopher corpus-filtering heuristics (Rae et al.
# 2021, "Scaling Language Models: ...", Appendix A — public paper),
# shared between the Spark plan and the DuckDB oracle.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WORDLEN = 3.0
GOPHER_MAX_WORDLEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_SYMBOL_RATIO = 0.1
# '#' or '...' — the two "symbol" markers the paper counts.
GOPHER_SYMBOL_RE = r"#|\.\.\."


def gopher_quality_flags_df(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher rule-based document filter: per-document quality
    signals, one boolean per rule, and the conjunctive ``keep``
    decision. Complements :func:`repetition_stats_df` (the paper's
    repetition rules) with the length/lexical rules:

    - word count within [50, 100k];
    - mean word length within [3, 10];
    - symbol-to-word ratio ('#' / '...') at most 0.1;
    - at least 80% of words contain an alphabetic character;
    - at least 2 distinct stopwords present.

    All signals are array expressions over one tokenize pass — fully
    map-side, zero shuffle, no UDF; every arithmetic step is a single
    integer-exact division so the DuckDB oracle matches bit-for-bit.
    """
    base = once_per_row(
        df.select(F.col(id_col), F.col(text_col).alias("__text")),
        {"__tok": tokens(F.col("__text"))},
    )
    mids = once_per_row(
        base,
        {
            "__n": F.size(F.col("__tok")),
            "__sumlen": F.aggregate(
                F.col("__tok"),
                F.lit(0),
                lambda a, x: a + F.length(x),
            ),
            "__nalpha": F.size(
                F.filter(F.col("__tok"), lambda x: x.rlike("[a-z]"))
            ),
            "__nstop": F.size(
                F.array_intersect(
                    F.array_distinct(F.col("__tok")),
                    F.array(*[F.lit(s) for s in STOPWORDS]),
                )
            ),
            "__nsym": F.size(
                F.regexp_extract_all(
                    F.col("__text"), F.lit(GOPHER_SYMBOL_RE), F.lit(0)
                )
            ),
        },
    )
    n = F.col("__n")
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    mwl = F.round(F.col("__sumlen").cast("double") / safe_n, 6)
    alpha = F.round(F.col("__nalpha").cast("double") / safe_n, 6)
    symr = F.round(F.col("__nsym").cast("double") / safe_n, 6)
    p_words = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    p_wordlen = (mwl >= GOPHER_MIN_WORDLEN) & (mwl <= GOPHER_MAX_WORDLEN)
    p_alpha = alpha >= GOPHER_MIN_ALPHA_FRAC
    p_stop = F.col("__nstop") >= GOPHER_MIN_STOPWORDS
    p_sym = symr <= GOPHER_MAX_SYMBOL_RATIO
    return mids.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_frac"),
        F.col("__nstop").cast("int").alias("n_stopwords"),
        symr.alias("symbol_ratio"),
        p_words.alias("pass_words"),
        p_wordlen.alias("pass_wordlen"),
        p_alpha.alias("pass_alpha"),
        p_stop.alias("pass_stopwords"),
        p_sym.alias("pass_symbols"),
        (p_words & p_wordlen & p_alpha & p_stop & p_sym).alias("keep"),
    )


# ------------------------------------------------------------------ PII
# Patterns restricted to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): explicit ASCII classes, bounded
# repetition, no lookaround, no backreferences.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-ish 3-3-4 with -, . or space separators
    "phone": r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    # dotted quad (no boundary anchors: RE2 \b differs from Java's)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
# Redaction order matters (a dotted phone must be consumed before the
# ipv4 pattern can nibble at it); both engines apply the same order.
PII_ORDER = ("email", "phone", "ipv4")


def pii_scan_df(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document PII detection + redaction, pure JVM regex, zero
    shuffle: counts per pattern family and the md5 of the redacted
    text (each match replaced by ``<FAMILY>`` in :data:`PII_ORDER`).
    The md5 (not the redacted text) is returned so the result stays
    narrow; a production scrub pass would write the redacted column.
    """
    c = F.col(text_col)
    red = c
    counts = []
    for fam in PII_ORDER:
        pat = PII_PATTERNS[fam]
        counts.append(F.regexp_count(c, F.lit(pat)).alias(f"n_{fam}"))
        red = F.regexp_replace(red, pat, f"<{fam.upper()}>")
    return df.select(
        F.col(id_col), *counts, F.md5(red).alias("redacted_md5")
    )


def text_profile_df(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    families: tuple[str, ...] = ("stats", "lang"),
) -> DataFrame:
    """Per-document text stats and/or language-ID fused into ONE pass:
    a single tokenize barrier feeds every derived column, so the text
    is split exactly once per row (separate :func:`text_stats_df` +
    :func:`with_pred_lang` calls each re-scan and re-tokenize the
    corpus). Map-side only, zero shuffle.

    ``families`` selects the column families actually materialized:
    ``"stats"`` -> n_tokens, n_bpe_tokens, punct_ratio,
    stopword_ratio, mean_token_len, fingerprint; ``"lang"`` ->
    pred_lang.  A stats-only caller must not pay for the five
    language-score array filters it would drop (and vice versa) —
    Catalyst prunes unused *columns* but the score expressions live
    behind a Generate barrier whose output the pruner keeps whole,
    so the selection has to happen at plan-construction time.  The
    curation pipeline passes both families and keeps the fully fused
    shape.

    Output: id, ``keep_cols``, then the selected families' columns.
    """
    want_stats = "stats" in families
    want_lang = "lang" in families
    if not (want_stats or want_lang):
        raise ValueError("families must include 'stats' and/or 'lang'")
    c = F.col(text_col)
    stats_inputs = (
        [
            F.length(c).alias("__n_chars"),
            F.regexp_count(c, F.lit(PUNCT_CLASS)).alias("__pc"),
            bpe_token_count(c).alias("n_bpe_tokens"),
        ]
        if want_stats
        else []
    )
    base = once_per_row(
        df.select(
            F.col(id_col),
            *[F.col(k) for k in keep_cols],
            *stats_inputs,
            c.alias("__text"),
        ),
        {"__tok": tokens(F.col("__text"))},
    )
    tok = F.col("__tok")
    n = F.size(tok)
    sw = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))
    tl = F.aggregate(
        F.transform(tok, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stat_exprs = (
        {
            "n_tokens": n.cast("long"),
            "punct_ratio": F.round(
                F.when(
                    F.col("__n_chars") > 0, F.col("__pc") / F.col("__n_chars")
                ).otherwise(F.lit(0.0)),
                6,
            ),
            "stopword_ratio": F.round(
                F.when(n > 0, sw.cast("long") / n).otherwise(F.lit(0.0)), 6
            ),
            "mean_token_len": F.round(
                F.when(n > 0, tl.cast("long") / n).otherwise(F.lit(0.0)), 6
            ),
        }
        if want_stats
        else {}
    )
    stats = once_per_row(
        base, {**stat_exprs, "__dtok": F.array_distinct(tok)}
    )
    dtok = F.col("__dtok")
    fp_exprs = (
        {"fingerprint": F.md5(F.concat_ws(" ", F.array_sort(dtok)))}
        if want_stats
        else {}
    )
    score_exprs = (
        {
            f"__score_{lang}": F.size(
                F.filter(dtok, lambda t: t.isin(*markers))
            )
            for lang, markers in LANG_MARKERS.items()
        }
        if want_lang
        else {}
    )
    scored = once_per_row(stats, {**fp_exprs, **score_exprs})
    if want_lang:
        mx = F.greatest(*[F.col(f"__score_{lang}") for lang in LANG_MARKERS])
        expr = None
        for lang in LANG_MARKERS:
            cond = F.col(f"__score_{lang}") == mx
            expr = (
                F.when(cond, F.lit(lang))
                if expr is None
                else expr.when(cond, F.lit(lang))
            )
        scored = scored.withColumn("pred_lang", expr)
    return scored.drop(
        "__text",
        "__tok",
        "__dtok",
        "__n_chars",
        "__pc",
        *[f"__score_{lang}" for lang in LANG_MARKERS],
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "punct_ratio": F.round(punct_ratio(c), 6),
            "stopword_ratio": F.round(stopword_ratio(c), 6),
            "mean_token_len": F.round(mean_token_len(c), 6),
            "quality": F.round(quality_score(c), 6),
            "fingerprint": bow_fingerprint(c),
        }
    )


def window_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    width: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Fixed-width character-window fingerprints per document — the
    substring-granular dedup primitive (the batch form of rolling-hash
    fingerprinting: a sequential CPU slides one hash in O(1) per
    position; a columnar engine hashes each window directly inside the
    scan stage, which is the same set of fingerprints without the
    sequential dependency).  Windows start every ``stride`` chars;
    documents shorter than ``width`` contribute none.

    Output: one (id, fp) row per DISTINCT window fingerprint per
    document — dedup'd inside the row's array before the explode so
    the downstream shuffle never carries within-document repeats.
    """
    c = F.col(text_col)
    positions = F.when(
        F.length(c) >= width,
        F.sequence(F.lit(1), F.length(c) - width + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    fps = F.array_distinct(
        F.transform(positions, lambda i: F.md5(c.substr(i, F.lit(width))))
    )
    return df.select(F.col(id_col), F.explode(fps).alias("fp"))


def bigram_nll_df(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Perplexity-style quality signal from a SELF-TRAINED bigram LM:
    score(doc) = mean over its bigrams (w1, w2) of
    ``-ln((c(w1 w2) + 1) / (c(w1) + V))`` (add-one smoothing,
    V = corpus vocabulary size). Documents whose word transitions are
    atypical for the corpus — boilerplate, gibberish, wrong-language
    contamination — score high; it is the classic cheap stand-in for
    a neural-perplexity filter.

    Two passes, both bounded: (1) unigram + bigram counts — explode,
    hash agg with map-side partial combine, so the shuffle carries at
    most vocab / bigram-vocab partials per partition, NOT one row per
    token; (2) scoring — the doc's bigrams explode and join the count
    tables. The count tables are NOT broadcast-hinted: bigram
    vocabulary grows with the corpus, so a forced broadcast would OOM
    at scale — AQE broadcasts them when they measure small and falls
    back to a shuffled hash join on the uniform ``bg``/``w1`` keys
    when they don't. Only the one-row V aggregate is pinned
    broadcast. Output per doc: ``n_bigrams``, ``avg_nll`` (rounded
    6dp).

    Docs with fewer than 2 tokens have no bigrams and drop out,
    matching the SQL twin.
    """
    tok = tokens(F.col(text_col))
    bg = df.select(
        F.col(id_col), F.explode(bigrams(tok)).alias("bg")
    ).select(
        F.col(id_col),
        F.col("bg"),
        F.split(F.col("bg"), " ", 2).getItem(0).alias("w1"),
    )
    uni = (
        df.select(F.explode(tok).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("V"))
    big = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        bg.join(big, on="bg")
        .join(uni, on="w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (-F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("V")))).alias(
                "nll"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )
