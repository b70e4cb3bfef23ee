"""Text-analysis operators for LLM training-data pipelines.

No reference counterpart (the reference is ETL-only; SURVEY.md §2.2) — this
is the BASELINE.json north-star surface: language ID, quality scoring,
token counting, document fingerprinting.

Everything is built-in column expressions (split/filter/aggregate/regexp),
JVM-side and codegen-friendly: per-row cost is O(words), no Python UDFs, no
shuffles — these scale embarrassingly to 100 TB as pure map stages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately tiny and deterministic — the heuristic's value at scale is
# being a cheap pure-map pre-filter, not SOTA accuracy.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "dans", "un", "une"),
    "es": ("el", "los", "de", "que", "es", "un", "una", "y"),
}

_HASH_MOD = 1_000_000_007


def words_of(text: Column) -> Column:
    return F.split(text, " ")


def stopword_count(words: Column, lang: str) -> Column:
    """Occurrences of ``lang``'s stopwords (with multiplicity)."""
    stops = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*stops)))


def language_id(words: Column) -> Column:
    """Argmax of per-language stopword hit counts; fixed tie order
    en > de > fr > es; 'und' (undetermined) when nothing matches."""
    counts = {lang: stopword_count(words, lang) for lang in STOPWORDS}
    en, de, fr, es = counts["en"], counts["de"], counts["fr"], counts["es"]
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, stopword ratio, punctuation
    ratio, mean word length. Fixed evaluation order => bit-identical doubles
    for identical inputs in any engine that mirrors the formula."""
    words = words_of(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    stop_ratio = stopword_count(words, "en").cast("double") / n_words
    punct_chars = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    punct_ratio = punct_chars.cast("double") / n_chars
    avg_word_len = (n_chars - (n_words - F.lit(1))).cast("double") / n_words
    length_component = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    word_len_component = F.when((avg_word_len >= 3.0) & (avg_word_len <= 10.0), 1.0).otherwise(0.5)
    return (
        length_component * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
        + word_len_component * 0.1
    )


# Whitespace tokens plus a BPE-ish fallback segmentation: runs of letters,
# runs of digits, or single non-alphanumeric symbols.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_counts(text: Column) -> tuple[Column, Column]:
    ws = F.size(F.split(text, " "))
    bpe_ish = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))
    return ws, bpe_ish


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized (lowercased, trimmed) text."""
    return F.md5(F.lower(F.trim(text)).cast("binary"))


def fingerprint_rolling(words: Column) -> Column:
    """Polynomial rolling hash over word-level features, mod 1e9+7.

    Word feature = (ascii(first char) * 31 + length) — engine-portable (no
    reliance on a specific string-hash builtin), so an oracle can mirror it.
    """
    word_feats = F.transform(words, lambda w: (F.ascii(w) * 31 + F.length(w)) % _HASH_MOD)
    return F.aggregate(
        word_feats,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _HASH_MOD,
    )


# PII scrubbing: a real training-data pipeline redacts contact info before
# anything downstream sees it. Regexes are deliberately RE2-compatible (no
# backreferences/lookaround) so the same pattern runs in Spark (Java regex)
# and any RE2-based engine with identical matches.
EMAIL_RE = "[a-z0-9.]+@[a-z0-9.-]+"
PHONE_RE = "[0-9][0-9-]{3,}[0-9]"


def redact_pii(text: Column) -> Column:
    """Replace email addresses then phone-like digit runs with placeholder
    tags. Order matters: emails can contain digits, so they go first."""
    return F.regexp_replace(F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<NUM>")


def chunk_documents(
    df,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into overlapping token-window chunks — the step
    between corpus curation and sequence packing in a training-data
    pipeline (packing consumes whole docs; long docs must be chunked to
    the context window first).

    Windows start every ``stride = chunk_tokens - overlap`` tokens and stop
    as soon as one reaches the end of the document (a later start would be
    a pure suffix of the previous chunk — duplicated training data); the
    last window may be short; a doc no longer than one window yields
    exactly one chunk. All arithmetic is integer (start index, window
    count) with the subtraction clamped non-negative BEFORE the division —
    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors, so
    negative numerators would diverge between engine and oracle. Plan
    shape: pure map + in-task explode fan-out — NO shuffle, which is what
    makes chunking free at 100 TB (the expansion factor ~ n_tokens/stride
    rides inside each task).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), words.alias("_w"), F.size(words).alias("n_words"))
    # last start index: ceil(max(0, n - chunk_tokens) / stride)
    last = F.expr(f"(greatest(0, n_words - {chunk_tokens}) + {stride - 1}) div {stride}")
    exploded = base.select(
        id_col,
        "_w",
        "n_words",
        F.posexplode(
            # the sequence bound references the materialized n_words
            # attribute (safe to re-reference — computed once; see
            # spark-perf-traps)
            F.transform(F.sequence(F.lit(0).cast("long"), last), lambda i: i * stride)
        ).alias("chunk_id", "chunk_start"),
    )
    return exploded.select(
        id_col,
        "n_words",
        "chunk_id",
        "chunk_start",
        F.least(F.lit(chunk_tokens), F.col("n_words") - F.col("chunk_start")).alias("chunk_len"),
        F.array_join(F.slice(F.col("_w"), F.col("chunk_start") + 1, chunk_tokens), " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable approximate frequency table)
# ---------------------------------------------------------------------------


def countmin_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Build a Count-Min sketch of item frequencies as a (depth x width)
    counter table: one row per (row_idx, bucket) with its counter.

    Each of the ``depth`` rows uses an independently-seeded xxhash64; an
    item increments one counter per row. The build is a single groupBy over
    (row, bucket) — map-side combinable, shuffle carries at most
    depth*width counter rows per map task — and two sketches merge by
    adding counters (the mergeability HLL has for distinct counts, here
    for frequencies). Estimate = min over rows of the item's counters:
    never an underestimate, overestimate bounded by e*N/width with
    probability 1 - (1/e)^depth.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row_idx")
    items = df.select(F.col(item_col).alias("item")).select("item", rows)
    return (
        items.select(
            "row_idx",
            (
                F.abs(F.xxhash64(F.col("item"), F.col("row_idx") + F.lit(seed)))
                % F.lit(width)
            ).alias("bucket"),
        )
        .groupBy("row_idx", "bucket")
        .agg(F.count("*").alias("counter"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Estimate the frequency of each probe item from a
    :func:`countmin_sketch` table: recompute the item's (row, bucket)
    coordinates, join the counter table (depth*width rows — broadcast at
    any scale), and take the min counter per item. Missing buckets count
    as zero."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row_idx")
    coords = probes.select(F.col(item_col).alias("item")).select("item", rows).select(
        "item",
        "row_idx",
        (
            F.abs(F.xxhash64(F.col("item"), F.col("row_idx") + F.lit(seed)))
            % F.lit(width)
        ).alias("bucket"),
    )
    return (
        coords.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("est_count"))
    )
