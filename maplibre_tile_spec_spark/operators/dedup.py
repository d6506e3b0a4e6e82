"""Deduplication operators for large-scale training-data pipelines.

All hot paths are declarative Spark expressions (JVM-side, codegen'd):

* exact dedup        — md5 hash-groupBy
* MinHash + LSH      — shingle → minhash → band → bucket self-join.
  The hash family is ``md5(h ':' shingle)`` with *lexicographic* min —
  chosen deliberately so the DuckDB oracle can reproduce signatures
  byte-for-byte (MinHash needs only a uniform hash order, not integers).
  A faster xxhash64 family is provided for production scale.
* SimHash            — 60-bit fingerprint from per-token md5-derived
  integers, majority vote per bit; hamming-bucket candidate join.
* n-gram Jaccard     — exact similarity on shingle sets via an inverted-
  index join (explode → join on shingle → count ratios).

At 100 TB the LSH band join is the scale path: the band signature is the
shuffle key, so each bucket is tiny and AQE's skew split handles pathological
buckets (e.g. boilerplate documents sharing a band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_HASHES = 16
DEFAULT_BAND_SIZE = 4
DEFAULT_SHINGLE = 3


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: (text_hash, rep id, n_copies)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("rep_doc_id"), F.count("*").alias("n_copies"))
    )


def _shingles(text_col: str, k: int):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])  # noqa: E731
    return F.array_distinct(F.transform(idx, gram)), F.size(toks)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    shingle_size: int = DEFAULT_SHINGLE,
    fast: bool = False,
) -> DataFrame:
    """(id, mhs array<string|long>) — md5 family (oracle-exact) or xxhash64
    family (fast path for production)."""
    # small-file inputs arrive as 1-2 splits; the signature computation is
    # the expensive part, so spread it across the cluster first
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
    sh, ntok = _shingles(text_col, shingle_size)
    if fast:
        mh = F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda h: F.array_min(F.transform(F.col("_sh"), lambda s: F.xxhash64(s, h))),
        )
    else:
        mh = F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda h: F.array_min(
                F.transform(F.col("_sh"), lambda s: F.md5(F.concat(h.cast("string"), F.lit(":"), s)))
            ),
        )
    return (
        docs.select(F.col(id_col).alias("id"), sh.alias("_sh"), ntok.alias("_n"))
        .filter(F.col("_n") >= shingle_size)
        .select("id", mh.alias("mhs"))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = DEFAULT_N_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_size: int = DEFAULT_SHINGLE,
    fast: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs (doc_a < doc_b) sharing ≥1 LSH band."""
    n_bands = n_hashes // band_size
    # persist: Catalyst does no common-subexpression elimination across
    # lambda bodies, so without a materialization boundary the full
    # n_hashes×shingles md5 computation inlines into every band AND both
    # self-join sides (~32× recompute observed at bench scale)
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_size, fast).persist()
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.concat_ws(",", F.slice(F.col("mhs"), b * band_size + 1, band_size))),
    )
    bdf = sigs.select("id", F.posexplode(bands).alias("band", "sig"))
    a = bdf.alias("a")
    b = bdf.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = DEFAULT_SHINGLE,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact Jaccard over shingle sets via inverted-index join:
    (doc_a, doc_b, jaccard) for pairs ≥ threshold. Integer counts + one
    division → bit-identical across engines."""
    sh, ntok = _shingles(text_col, shingle_size)
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
    base = (
        docs.select(F.col(id_col).alias("id"), sh.alias("_sh"), ntok.alias("_n"))
        .filter(F.col("_n") >= shingle_size)
        .select("id", F.size("_sh").alias("n_sh"), F.explode("_sh").alias("shingle"))
    )
    a = base.alias("a")
    b = base.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first("a.n_sh").alias("na"),
            F.first("b.n_sh").alias("nb"),
        )
    )
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """60-bit SimHash: per-token hash from md5 hex (first 15 nibbles → long),
    per-bit majority vote across tokens. (id, simhash long)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok_hash = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    base = docs.select(F.col(id_col).alias("id"), F.explode(tok_hash).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = base.groupBy("id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim.bitwiseOR(F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(0) * F.lit(2**i).cast("long"))
    return agg.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    bits: int = 60,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` bits: block the fingerprint into
    n_blocks (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 blocks equal), join per
    block, verify hamming exactly with bit_count."""
    sh = simhash(docs, text_col, id_col, bits).persist()
    block_bits = bits // n_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), i * block_bits)
                .bitwiseAND(F.lit(2**block_bits - 1))
                .alias("key"),
            )
            for i in range(n_blocks)
        ]
    )
    bdf = sh.select("id", "simhash", F.explode(blocks).alias("b")).select(
        "id", "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key")
    )
    a = bdf.alias("a")
    b = bdf.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.key") == F.col("b.key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"), ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
