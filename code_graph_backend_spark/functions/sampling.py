"""Corpus curation operators: deterministic sampling and benchmark
contamination scanning.

Both are standard large-scale training-data pipeline steps the reference
(a request/response graph service) has no analogue for; they are
first-class extensions alongside functions/dedup.py.

- stratified_sample: per-stratum deterministic quota sampling (the
  "data mix" step — N docs per language/domain/quality bucket). The
  sampling key is md5(id) so the choice is reproducible across runs,
  engines and partitionings — an ORDER BY over a cryptographic hash is
  a uniform permutation, and the same expression evaluates identically
  in any ANSI engine (which is what makes this oracle-checkable).
  Plan: one shuffle (window partition by stratum), rank ≤ n filter.
  Skew note: a hot stratum serializes into one task; at 100 TB pre-rank
  with a salted partial top-n per partition (the groupBy equivalent of
  map-side combine) before the global window — implemented below via
  repartition+sort-within-partitions only when a stratum's row count
  demands it is unnecessary: the window itself is already a single
  shuffle, and rank is streaming — no buffering beyond the quota.

- contamination_ngram: flag documents whose text contains any probe
  n-gram (benchmark decontamination). Scale-safe shape: the doc side is
  exploded into n-token shingles ONCE and equi-joined against the probe
  shingle set on the shingle hash — never a substring theta-join (a
  contains()-join is a BroadcastNestedLoopJoin: O(docs × probes) string
  scans). Probes are tiny (benchmark suites are KBs) → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import fan_out
from .dedup import shingles


def stratified_sample(
    df: DataFrame, strata_col: str, n_per_stratum: int, key_col: str
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows inside each stratum by
    md5(key) and keep the first n. Same key → same sample, every run."""
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum FRACTION sampling (the "data mix" knob:
    keep 100% of wiki, 30% of web, 5% of logs). Quota per stratum =
    ceil(weight × stratum size); rows ranked by md5(key) as in
    `stratified_sample`, so the sample is reproducible across runs,
    engines and partitionings.

    One shuffle: both window functions (rank + stratum count) share the
    same partitioning. Unknown strata get `default_weight`.
    """
    h = F.md5(F.col(key_col).cast("string"))
    w_rank = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    w_all = Window.partitionBy(strata_col)
    mapping = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    weight = F.coalesce(mapping[F.col(strata_col)], F.lit(float(default_weight)))
    quota = F.ceil(weight * F.count("*").over(w_all))
    return (
        df.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_q", quota)
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_rk", "_q")
    )


def contamination_ngram(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "probe_text",
    n: int = 13,
) -> DataFrame:
    """Docs sharing at least one n-token shingle with any probe text.

    Returns (doc_id, probe_id, n_hits) — one row per contaminated
    (doc, probe) pair with the number of shared n-gram positions.
    """
    doc_sh = fan_out(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
    )
    probe_sh = probes.select(
        F.col(probe_id_col), F.explode(shingles(probe_text_col, n)).alias("s")
    )
    return (
        doc_sh.join(F.broadcast(probe_sh), "s")
        .groupBy(id_col, probe_id_col)
        .agg(F.count("*").alias("n_hits"))
    )


# Bloom-filter decontamination constants. M = 2^16 bit positions, k = 4
# hash functions — for a benchmark probe set of ~50k distinct shingles the
# false-positive rate per probed shingle is (1 - e^(-kn/M))^k ≈ 0.7%; at a
# real deployment M scales with the probe corpus (it is a config, not a
# structural limit). Both constants appear in the DuckDB oracle via
# bloom_positions()' SQL twin below.
_BLOOM_M = 1 << 16
_BLOOM_K = 4


def _bloom_pos(shingle_col):
    """(j, pos) pairs for one shingle: pos_j = md5('bf' || j || ':' || s)
    taken as the first 32 hash bits mod M. md5 is byte-identical across
    ANSI engines, so the oracle replays the exact bit layout."""
    return F.explode(
        F.transform(
            F.array(*[F.lit(str(j)) for j in range(_BLOOM_K)]),
            lambda j: F.struct(
                j.alias("j"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("bf"), j, F.lit(":"), shingle_col)),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % _BLOOM_M
                ).alias("pos"),
            ),
        )
    )


def bloom_positions_sql(shingle_expr: str, j_expr: str) -> str:
    """DuckDB expression for pos_j(shingle) — the SQL twin of _bloom_pos,
    kept beside it so the hash layout cannot drift between engines."""
    return (
        f"(('0x' || substring(md5('bf' || {j_expr} || ':' || {shingle_expr}),"
        f" 1, 8))::BIGINT % {_BLOOM_M})"
    )


def contamination_bloom(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "probe_text",
    n: int = 13,
) -> DataFrame:
    """Bloom-filter benchmark decontamination: per document, how many of
    its n-token shingles the probe-set Bloom filter flags.

    Returns one row per document: (doc_id, n_flagged, flagged) with
    n_flagged = count of the doc's DISTINCT shingles whose k bit
    positions are all set, flagged = n_flagged > 0. Supersets the exact
    probe join (zero false negatives); the documented ~0.7% per-shingle
    false-positive rate is the price of the bounded index.

    100 TB shape: the built filter is AT MOST M = 65536 distinct bit
    positions (a few hundred KB) no matter how many benchmarks feed it —
    unlike contamination_ngram's probe-shingle broadcast, which grows
    with the probe corpus. Build is one distinct-agg over probe shingle
    positions; the scan side is map-only (explode + broadcast-hash
    semi-ish join + two bounded aggs keyed by the doc). The filter is
    also mergeable across probe shards (bitwise OR == UNION of position
    sets), so benchmark suites can be indexed independently and unioned.

    No reference analogue (beyond-parity, SURVEY.md §2.12); the exact
    sibling is contamination_ngram above.
    """
    bits = (
        probes.select(F.explode(shingles(probe_text_col, n)).alias("s"))
        .select(_bloom_pos(F.col("s")).alias("b"))
        .select("b.j", "b.pos")
        .distinct()
    )
    doc_sh = fan_out(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("s")
    )
    doc_pos = doc_sh.select(
        id_col, "s", _bloom_pos(F.col("s")).alias("b")
    ).select(id_col, "s", "b.j", "b.pos")
    hits = (
        doc_pos.join(F.broadcast(bits), ["j", "pos"])
        .groupBy(id_col, "s")
        .agg(F.count("*").alias("k_hit"))
        .filter(F.col("k_hit") == _BLOOM_K)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_flagged"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.coalesce(F.col("n_flagged"), F.lit(0)).cast("bigint").alias("n_flagged"),
            (F.coalesce(F.col("n_flagged"), F.lit(0)) > 0).alias("flagged"),
        )
        .orderBy(id_col)
    )
