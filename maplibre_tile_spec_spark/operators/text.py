"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Pure Catalyst expressions (no Python), each with a
DuckDB-expressible twin so the driver's oracle can verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small deterministic stopword profiles (top function words per language)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "de", "que", "en", "los", "se", "del", "las", "por"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order

TOKEN_RE = r"\s+"
WORD_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE)


def spread_small_scan(docs: DataFrame) -> DataFrame:
    """Conditionally spread a small-scan corpus before heavy per-row work.

    Single-row-group parquet files cannot be split, so everything upstream
    of the first exchange runs on as many tasks as there are row groups —
    one, for the driver's test tables — and the per-token expression work
    below serializes. When the scan offers fewer partitions than the
    cluster, repartition round-robin; a corpus with enough splits passes
    through untouched, so no shuffle is ever added at scale (same rationale
    as the unconditional spread in dedup.minhash_signatures, made
    conditional because these operators are otherwise shuffle-free)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par * 2)
    return docs


def lang_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-language stopword hit counts + argmax language (n-gram-free
    heuristic; ties broken by LANG_ORDER)."""
    docs = spread_small_scan(docs)
    toks = _tokens(text_col)
    cols = [F.col(id_col)]
    for lang in LANG_ORDER:
        hits = F.aggregate(
            F.transform(toks, lambda t: F.when(t.isin(*STOPWORDS[lang]), 1).otherwise(0)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        cols.append(hits.alias(f"hits_{lang}"))
    scored = docs.select(*cols)
    best = F.lit(LANG_ORDER[-1])
    best_hits = F.col(f"hits_{LANG_ORDER[-1]}")
    for lang in reversed(LANG_ORDER[:-1]):
        cond = F.col(f"hits_{lang}") >= best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    return scored.select(
        id_col,
        *[F.col(f"hits_{lang}").cast("long") for lang in LANG_ORDER],
        F.when(best_hits > 0, best).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rule-based quality flags (Gopher-style ratios, exact arithmetic):
    token count, mean word length ×100 (integer), punctuation count,
    alpha-token count, and a 0-4 integer score."""
    docs = spread_small_scan(docs)
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,!?;:]", ""))
    n_alpha = F.aggregate(
        F.transform(toks, lambda t: F.when(t.rlike("^[a-z]+$"), 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sum_tok_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    # floor, not cast: Spark's double→long cast truncates while DuckDB's
    # rounds — floor() is identical in both
    mwl_x100 = F.floor(sum_tok_len * 100 / F.greatest(n_tok, F.lit(1))).cast("long")
    score = (
        F.when((n_tok >= 5) & (n_tok <= 100000), 1).otherwise(0)
        + F.when((mwl_x100 >= 200) & (mwl_x100 <= 1200), 1).otherwise(0)
        + F.when(n_punct * 5 <= n_chars, 1).otherwise(0)
        + F.when(n_alpha * 2 >= n_tok, 1).otherwise(0)
    )
    return docs.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        mwl_x100.alias("mean_word_len_x100"),
        n_punct.cast("long").alias("n_punct"),
        n_alpha.cast("long").alias("n_alpha_tokens"),
        score.cast("long").alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (regex word/punct split
    with a ceil(len/4) continuation term, exact integer arithmetic)."""
    docs = spread_small_scan(docs)
    ws = F.size(_tokens(text_col))
    pieces = F.split(F.trim(F.col(text_col)), r"\s+")
    bpe_ish = F.aggregate(
        F.transform(pieces, lambda p: (F.length(p) + 3).cast("long") / 4),
        F.lit(0).cast("double"),
        lambda acc, x: acc + F.floor(x),
    ).cast("long")
    return docs.select(
        id_col,
        ws.cast("long").alias("n_ws_tokens"),
        bpe_ish.alias("n_bpe_est"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of full text, md5 of the first 8 tokens
    (prefix fingerprint), and a 15-nibble rolling-style numeric digest."""
    # no spread here: two md5s per document are cheaper than the shuffle
    # a spread would add (measured 0.18 s plain vs 0.29 s spread at sf0.1)
    toks = _tokens(text_col)
    head = F.concat_ws(" ", F.slice(toks, 1, 8))
    return docs.select(
        id_col,
        F.md5(F.col(text_col)).alias("fp_full"),
        F.md5(head).alias("fp_head8"),
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long").alias("fp_num"),
    )
