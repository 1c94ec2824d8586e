"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-architected for 100 TB:

- exact          : hash-groupBy on a content fingerprint (md5). One shuffle
                   on the hash — the canonical dedup.
- ngram_jaccard  : EXACT near-dup pairs via an inverted shingle index
                   (explode shingles → self-join on shingle → count common →
                   Jaccard). Never materializes the O(n²) pair space — only
                   pairs sharing ≥1 shingle, which is the similarity-join
                   standard (cf. Vernica et al., SIGMOD'10 prefix filtering).
- minhash_lsh    : APPROXIMATE candidate pairs: k minhashes → b bands →
                   equi-join on (band, band-hash). Scales to corpora where
                   even the inverted index is too hot; tunable recall.
- simhash        : 64-bit locality hash per doc; near-dups share the hash
                   (or differ in few bits — banded by 16-bit chunks).

All JVM-side: xxhash64 / md5 / explode / groupBy — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(text_col="text", n: int = 3):
    """n-token shingles as an array<string> column."""
    t = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(t) - n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]))
    )


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Keep the lowest id per exact content fingerprint."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, id_col="doc_id", text_col="text", n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard-similar pairs over n-token shingles.

    Plan shape: explode (narrow) → shuffle on shingle (the inverted index) →
    pair-count agg → broadcast-join doc sizes → filter. Skewed shingles
    (boilerplate) would hot-spot the index at scale; mitigation is dropping
    top-frequency shingles (stop-shingles) — exposed via `max_df`.
    """
    sh = docs.select(
        F.col(id_col).alias("i"), F.explode(shingles(text_col, n)).alias("s")
    ).persist()  # the inverted index feeds both self-join sides AND the
    # per-doc sizes — materialize once (MEMORY_AND_DISK, spills at scale)
    # instead of re-exploding the corpus three times
    sizes = sh.groupBy(F.col("i").alias("_id")).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("_id").alias("i"), F.col("n_sh").alias("n_i"))
    nb = sizes.select(F.col("_id").alias("j"), F.col("n_sh").alias("n_j"))
    return (
        common.join(na, "i")
        .join(nb, "j")
        .withColumn("jac", F.col("c") / (F.col("n_i") + F.col("n_j") - F.col("c")))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", "jac")
    )


def minhash_signatures(
    docs: DataFrame, id_col="doc_id", text_col="text", n: int = 3, k: int = 32
) -> DataFrame:
    """k minhash values per doc: min over shingles of xxhash64(shingle, seed).

    Shape: explode shingles → one hash aggregate computing all k mins.
    The k hash computations per exploded row and the k min-accumulators all
    live in one whole-stage-codegen'd partial agg — one shuffle on doc_id,
    map-side combined. (A per-row `transform` fold re-walks the shingle
    array k times per doc — measured ~10× slower.)
    """
    sh = docs.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
    )
    return sh.groupBy(id_col).agg(
        F.array(*[F.min(F.xxhash64("s", F.lit(seed))) for seed in range(k)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH candidate pairs: split the k-minhash signature into `bands`
    bands of k/bands rows; docs agreeing on any full band are candidates.

    Shuffle key is (band_idx, band_hash) — uniform by construction, so no
    skew; the candidate join is a plain equi self-join.
    """
    rows = k // bands
    sig = minhash_signatures(docs, id_col, text_col, n, k)
    banded = sig.select(
        F.col(id_col).alias("i"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"hash(slice(sig, b * {rows} + 1, {rows})) as bh))"
            )
        ).alias("e"),
    ).select("i", "e.band", "e.bh").persist()
    # persist: both sides of the candidate self-join read the banded
    # signatures — without it the minhash agg runs twice
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .select(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame, id_col="doc_id", text_col="text", n: int = 3, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc — per-bit majority vote over shingle xxhash64s.

    Shape: explode shingles → hash each once → ONE aggregate computing all
    64 per-bit popcounts (+ a shingle count); bit b of the output is set iff
    more than half the shingle hashes have bit b set (the sign-of-±1-votes
    rule of classic SimHash). The popcounts are packed 2-per-long in 32-bit
    lanes, so the aggregate has 33 buffer columns — under Spark's
    codegen.maxFields=100 cutoff, keeping the whole partial agg in
    whole-stage codegen. 32-bit lanes can't overflow below 2^32 shingles
    per doc. (Two rejected shapes, both measured at sf0.1: 64 × `F.aggregate`
    folds in one projection blew the codegen limit and ran interpreted,
    ~90× slower; 64 separate sum columns tripped maxFields and fell back
    to interpreted agg, ~2× slower.)

    Docs with no shingles get signature 0.
    """
    assert bits == 64, "simhash is a 64-bit signature"
    sh = docs.select(
        F.col(id_col), F.explode_outer(shingles(text_col, n)).alias("s")
    ).select(
        id_col,
        # hash once per shingle; null shingle (empty doc) → null hash, so the
        # lane sums skip it and count("h") stays 0
        F.when(F.col("s").isNotNull(), F.xxhash64("s")).alias("h"),
    )

    def lane(g: int):
        # bits 2g and 2g+1, packed at lane offsets 0 and 32 of one long
        lo = F.shiftright("h", 2 * g).bitwiseAND(F.lit(1))
        hi = F.shiftleft(F.shiftright("h", 2 * g + 1).bitwiseAND(F.lit(1)), 32)
        return F.sum(lo + hi).alias(f"_g{g}")

    cnt = sh.groupBy(id_col).agg(
        F.count("h").alias("_n"), *[lane(g) for g in range(bits // 2)]
    )
    out = F.lit(0).cast("long")
    for b in range(bits):
        c = F.shiftright(f"_g{b // 2}", 32 * (b % 2)).bitwiseAND(F.lit(0xFFFFFFFF))
        mask = (1 << b) if b < 63 else -(1 << 63)  # bit 63 = sign bit of long
        out = out.bitwiseOR(
            F.when(c * 2 > F.col("_n"), F.lit(mask).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return cnt.select(F.col(id_col), out.alias("sh"))


def simhash_near_dup_pairs(
    docs: DataFrame, id_col="doc_id", text_col="text", band_bits: int = 16
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash band (Hamming
    distance ≤ 3 of 64 guarantees ≥1 identical band — pigeonhole)."""
    d = simhash_signatures(docs, id_col, text_col).select(
        F.col(id_col).alias("i"), "sh"
    )
    bands = 64 // band_bits
    banded = d.select(
        "i",
        "sh",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"shiftright(sh, b * {band_bits}) & {(1 << band_bits) - 1} as bv))"
            )
        ).alias("e"),
    ).select("i", "sh", "e.band", "e.bv").persist()
    # persist: the simhash agg is the expensive input to both join sides
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            F.col("a.sh").alias("sh_i"),
            F.col("b.sh").alias("sh_j"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j")))
    return pairs.withColumn("hamming", hamming.cast("int")).select("i", "j", "hamming")
