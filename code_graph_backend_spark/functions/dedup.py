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

Exact/Jaccard/MinHash run JVM-side (xxhash64 / md5 / explode / groupBy).
SimHash signatures are the one Arrow-batched kernel: the computation is
per-row, so a map-only mapInPandas beats shuffling exploded shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scratch import scratch_persist
from ..session import fan_out


def shingles(text_col="text", n: int = 3):
    """n-token shingles as an array<string> column.

    Docs with fewer than n tokens yield an EMPTY array: sequence(0, size-n)
    would count downward for short docs and element_at(t, 0) then throws, so
    the whole expression is gated on size(t) >= n.
    """
    t = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(t) - n)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]))
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Keep the lowest id per exact content fingerprint."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over n-token shingles.

    Plan shape: explode (narrow) → shuffle on shingle (the inverted index) →
    pair-count agg → broadcast-join doc sizes → filter. Skewed shingles
    (boilerplate) hot-spot the index at scale: one shingle shared by k docs
    produces k² join rows. `max_df` caps that — shingles appearing in more
    than `max_df` documents are dropped from BOTH the index and the per-doc
    sizes, so the result is exact Jaccard over the non-boilerplate shingle
    space (the standard stop-shingle semantics). Default None = off, exact
    Jaccard over all shingles.

    `shingles_df` (columns [id_col, s], already persisted by the caller)
    lets a composed pipeline that needs the shingle table more than once
    (e.g. dedup_lsh_eval: LSH path + truth path) build it ONE time.
    """
    if shingles_df is not None:
        sh = shingles_df.select(F.col(id_col).alias("i"), F.col("s"))
    else:
        sh = scratch_persist(fan_out(docs).select(
            F.col(id_col).alias("i"), F.explode(shingles(text_col, n)).alias("s")
        ))  # the inverted index feeds both self-join sides AND the
        # per-doc sizes — materialize once (MEMORY_AND_DISK, spills at
        # scale) instead of re-exploding the corpus three times
    if max_df is not None:
        # Hot shingles are few by definition (high df ⇒ boilerplate), so the
        # stop-list broadcast-anti-joins against the index without a shuffle.
        hot = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("s")
        )
        sh = scratch_persist(sh.join(F.broadcast(hot), "s", "left_anti"))
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


def containment_pairs(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    n: int = 3,
    threshold_milli: int = 800,
    max_df: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """DIRECTIONAL shingle containment C(i→j) = |S_i ∩ S_j| / |S_i| —
    the long-document near-dup channel Jaccard misses: a short doc
    pasted verbatim inside a long one scores tiny Jaccard (union is
    huge) but containment ~1.0 in the short→long direction (the gate
    Lee et al. 2022 / CCNet apply beside symmetric similarity).

    Same inverted-shingle-index machinery as `ngram_jaccard_pairs`
    (one explode, self-join on shingle, never all-pairs; `max_df`
    stop-shingle cap available identically) but the pair join keeps
    BOTH directions (i≠j, not i<j) and divides by the CONTAINED side
    only. The decision and the reported score are integer-milli
    (c*1000 div n_i), so the result is engine-exact with no float
    channel. Output (i, j, cont_milli): i is contained in j.
    """
    if shingles_df is not None:
        sh = shingles_df.select(F.col(id_col).alias("i"), F.col("s"))
    else:
        sh = scratch_persist(fan_out(docs).select(
            F.col(id_col).alias("i"), F.explode(shingles(text_col, n)).alias("s")
        ))
    if max_df is not None:
        hot = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("s")
        )
        sh = scratch_persist(sh.join(F.broadcast(hot), "s", "left_anti"))
    sizes = sh.groupBy(F.col("i").alias("_id")).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.i") != F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("_id").alias("i"), F.col("n_sh").alias("n_i"))
    return (
        common.join(na, "i")
        .filter(F.col("c") * 1000 >= F.lit(threshold_milli) * F.col("n_i"))
        .select(
            F.col("i").cast("long"),
            F.col("j").cast("long"),
            # integer floor-div, not float-divide-then-cast: a double
            # quotient a hair under an integer rounds UP to it and the
            # cast then overstates the floor ((h) in the exactness notes)
            F.expr("CAST((c * 1000) DIV n_i AS BIGINT)").alias("cont_milli"),
        )
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
    sh = fan_out(docs).select(
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
    ).select("i", "e.band", "e.bh")
    banded = scratch_persist(banded)
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
    """64-bit SimHash per doc — per-bit majority vote over shingle hashes.

    MAP-ONLY: one Arrow-batched `mapInPandas` kernel computes the whole
    signature per doc — tokenize, shingle, hash (blake2b/8-byte,
    deterministic across workers), majority-vote all 64 bits in a single
    numpy reduction. No explode, no shuffle: simhash is per-row math, so the
    scalable plan is linear embarrassing parallelism over input partitions.

    (Rejected shape, measured: explode shingles → groupBy(doc) with 33
    packed popcount aggregates. It's JVM-side, but it shuffles every shingle
    of the corpus — at 100 TB that's a multi-TB exchange for a map-only
    computation — and its 64-bit-extraction aggregate costs ~4 s of codegen
    compile per session before the first row. Two other all-column variants
    fell out of whole-stage codegen entirely, 2-90× slower.)

    Docs with no shingles get signature 0.
    """
    assert bits == 64, "simhash is a 64-bit signature"
    import hashlib

    import numpy as np
    import pandas as pd

    def kernel(batches):
        shift = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            # hash every shingle of the batch into one flat array, keeping
            # per-doc segment lengths — all 64-bit vote math then runs as
            # batch-level numpy (one (total_shingles × 64) bit matrix +
            # reduceat over the segment boundaries), not per-doc small-array
            # calls whose per-call overhead dominates at ~50 shingles/doc
            blobs: list[bytes] = []
            lens = np.zeros(len(pdf), dtype=np.int64)
            for row, text in enumerate(pdf[text_col]):
                toks = (text or "").split(" ")
                ss = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
                lens[row] = len(ss)
                blobs.append(
                    b"".join(
                        hashlib.blake2b(s.encode(), digest_size=8).digest()
                        for s in ss
                    )
                )
            hs = np.frombuffer(b"".join(blobs), dtype=np.uint64)
            bits = ((hs[:, None] >> shift) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nonempty = lens > 0
            votes = np.zeros((len(pdf), 64), dtype=np.int64)
            if hs.size:
                # reduceat over the offsets of NON-EMPTY docs only: those
                # are strictly increasing and strictly < len(hs), so every
                # segment is exactly one doc's shingles. (Clamping all-doc
                # offsets instead shifts the last doc's boundary whenever a
                # batch ends with empty docs — wrong signatures.)
                seg = np.add.reduceat(bits, starts[nonempty], axis=0)
                votes[nonempty] = seg
            sigs = np.bitwise_or.reduce(
                ((votes * 2 > lens[:, None]).astype(np.uint64)) << shift, axis=1
            )
            sigs[~nonempty] = 0
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sh": sigs.astype(np.int64)}
            )

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        kernel, f"{id_col} long, sh long"
    )


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
    ).select("i", "sh", "e.band", "e.bv")
    banded = scratch_persist(banded)
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


# ---------------------------------------------------------------------------
# Exact-twin companions (r4): the SAME banded-LSH pipelines with an
# md5-based hash family, chosen because DuckDB can replicate md5 exactly —
# so the approximate families' MACHINERY (signature agg, banding, candidate
# join, majority vote) gets a true hash-checked oracle row. The production
# variants above keep their faster hash families (xxhash64 / blake2b);
# recall properties stay pytest-asserted (tests/test_dedup_similarity.py).
# ---------------------------------------------------------------------------


def _banded_md5(
    docs: DataFrame, id_col: str, text_col: str, n: int, k: int, bands: int,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(i, band, bh) banded md5-minhash signatures — the ANSI-replicable
    hash family shared by the exact twin and the incremental variant:
    explode shingles → one hash-agg computing all k mins → md5 band keys.
    `shingles_df` (columns [id_col, s]) skips the explode when the caller
    already built the table."""
    rows = k // bands
    if shingles_df is not None:
        sh = shingles_df
    else:
        sh = fan_out(docs).select(
            F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
        )
    sig = sh.groupBy(id_col).agg(
        F.array(
            *[
                F.min(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("s"))))
                for seed in range(k)
            ]
        ).alias("sig")
    )
    return sig.select(
        F.col(id_col).alias("i"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"md5(concat_ws('|', slice(sig, b * {rows} + 1, {rows}))) as bh))"
            )
        ).alias("e"),
    ).select("i", "e.band", "e.bh")


def minhash_lsh_candidates_exact(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact twin of `minhash_lsh_candidates`: identical explode → one
    hash-agg k-mins → banded equi-join plan, but hash = md5(seed ':' s)
    compared as hex strings and band key = md5 of the '|'-joined band
    slice — every step replicable in ANSI SQL. Output (i, j) pairs."""
    banded = scratch_persist(
        _banded_md5(docs, id_col, text_col, n, k, bands, shingles_df)
    )
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


def minhash_incremental_candidates(
    docs: DataFrame,
    is_new,
    id_col="doc_id",
    text_col="text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental-ingest LSH dedup: the daily-batch pattern at 100 TB.

    A standing corpus keeps its banded minhash signatures persisted as the
    dedup INDEX; each arriving batch computes signatures for its own docs
    only, then probes batch-vs-index plus batch-vs-batch — the index side
    is never re-shingled, so per-day cost is O(batch), not O(corpus). Here
    the index side is the `is_new`-false slice (signatures scratch-persisted,
    standing in for the parquet-backed index a deployment would
    `save_range_indexed` by band hash) and the probe side is the new slice.

    Emitted pairs (i, j, j_is_new-side) are exactly the full-corpus LSH
    candidates that involve ≥1 new doc — verified against a full-recompute
    oracle: same md5 hash family as `minhash_lsh_candidates_exact`, so the
    DuckDB twin replays the whole pipeline and filters to new-involving
    pairs. Shuffle profile: one signature agg over the BATCH only + one
    equi-join on (band, bh) against the index.
    """
    tagged = docs.select(F.col(id_col), F.col(text_col), is_new.alias("_new"))
    banded_new = _banded_md5(
        tagged.filter(F.col("_new")), id_col, text_col, n, k, bands
    )
    banded_old = scratch_persist(
        _banded_md5(tagged.filter(~F.col("_new")), id_col, text_col, n, k, bands)
    )
    banded_new = scratch_persist(banded_new)
    nw, old = banded_new.alias("nw"), banded_old.alias("old")
    # new-vs-index: every (old, new) candidate, ordered (min, max)
    vs_index = (
        nw.join(
            old,
            (F.col("nw.band") == F.col("old.band"))
            & (F.col("nw.bh") == F.col("old.bh")),
        )
        .select(
            F.least(F.col("nw.i"), F.col("old.i")).alias("i"),
            F.greatest(F.col("nw.i"), F.col("old.i")).alias("j"),
        )
        .filter(F.col("i") != F.col("j"))
    )
    # new-vs-new within the batch
    n2 = banded_new.alias("b")
    vs_batch = (
        nw.join(
            n2,
            (F.col("nw.band") == F.col("b.band"))
            & (F.col("nw.bh") == F.col("b.bh"))
            & (F.col("nw.i") < F.col("b.i")),
        )
        .select(F.col("nw.i").alias("i"), F.col("b.i").alias("j"))
    )
    return vs_index.unionByName(vs_batch).distinct()


def simhash_signatures_exact(
    docs: DataFrame, id_col="doc_id", text_col="text", n: int = 3
) -> DataFrame:
    """Exact twin of `simhash_signatures` (32-bit, md5 hash family): the
    same per-bit majority vote, computed as explode → ONE hash-agg with 32
    packed bit-sum aggregates (this is the shape the production kernel
    deliberately avoids at scale — acceptable here because the twin is a
    correctness companion, not the 100 TB path). Output (doc_id, sig)."""
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long")
    sh = fan_out(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
    ).withColumn("h", h)
    aggs = [F.count("*").alias("cnt")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
        for b in range(32)
    ]
    voted = sh.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(32):
        term = F.when(
            F.col(f"b{b}") * 2 > F.col("cnt"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return voted.select(F.col(id_col), sig.alias("sig"))


def ngram_novelty(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    n-gram shingles whose corpus-wide first occurrence (min doc id in
    ingestion order) is this document. The marginal-new-content curve
    data-ordering and crawl-dedup diagnostics plot (the complement of
    Lee et al.'s duplicated-span mass, aggregated per doc instead of
    per span).

    Shape: one shingle explode (md5-keyed so the shuffle carries 32-byte
    keys, never 13-gram text) -> ONE hash-agg computing min(doc_id) per
    shingle -> join back to the per-doc shingle list -> per-doc count
    rollup. Two shuffles total, both on bounded-width keys; no
    self-join, no all-pairs. Docs with < n tokens have zero shingles and
    report novelty 0 with n_shingles = 0 (integer-milli, floor-divide,
    engine-exact).
    """
    sh = scratch_persist(
        fan_out(docs)
        .select(F.col(id_col), F.explode(shingles(text_col, n)).alias("s"))
        .select(id_col, F.md5(F.col("s")).alias("h"))
    )
    first_seen = sh.groupBy("h").agg(F.min(id_col).alias("first_doc"))
    per_doc = (
        sh.join(first_seen, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                (F.col("first_doc") == F.col(id_col)).cast("long")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select(F.col(id_col).cast("long"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            F.coalesce(
                F.expr("(1000 * n_novel) DIV n_shingles"), F.lit(0)
            ).cast("long").alias("novelty_milli"),
        )
        .orderBy(id_col)
    )
