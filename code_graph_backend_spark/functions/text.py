"""Text-analysis column functions for training-data pipelines.

All JVM-side (`pyspark.sql.functions` only — no Python UDFs): language-ID
heuristic, quality scoring, token counting, fingerprinting. Each returns a
Column so callers compose them into selects; whole-stage codegen keeps the
hot path vectorized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("a", "the")


def tokens(text="text") -> Column:
    """Whitespace tokenization (the corpus is single-space separated; for
    real corpora swap the pattern for `\\s+` after a trim)."""
    return F.split(F.col(text), " ")


def token_count(text="text") -> Column:
    return F.size(tokens(text)).cast("int")


def distinct_token_count(text="text") -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("int")


def stopword_ratio(text="text") -> Column:
    t = tokens(text)
    stops = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return stops / F.size(t)


def avg_token_len(text="text") -> Column:
    t = tokens(text)
    return F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)) / F.size(t)


def quality_score(text="text") -> Column:
    """Composite quality heuristic: lexical diversity + length saturation +
    stopword penalty. Deterministic double arithmetic (oracle-comparable)."""
    t = tokens(text)
    diversity = F.size(F.array_distinct(t)) / F.size(t)
    length_sat = F.least(F.lit(1.0), F.size(t) / F.lit(100.0))
    return 0.4 * diversity + 0.3 * length_sat + 0.3 * (1.0 - stopword_ratio(text))


def lang_pred(text="text") -> Column:
    """n-gram-flavoured language/domain ID heuristic: marker tokens first,
    then stopword density. (Real corpora would use char-trigram profiles —
    same shape: JVM-side array ops, no UDF.)"""
    t = tokens(text)
    has = lambda w: F.array_contains(t, w)  # noqa: E731
    return (
        F.when(has("spark") | has("query") | has("vector"), F.lit("tech"))
        .when(stopword_ratio(text) > 0.10, F.lit("stop-heavy"))
        .otherwise(F.lit("plain"))
    )


def fingerprint(text="text") -> Column:
    """Document fingerprint: md5 of the lowercased text. (A rolling/locality
    hash lives in dedup.simhash; md5 is the exact-dup key.)"""
    return F.md5(F.lower(F.col(text)))


# BPE-ish subword pattern: alnum runs chunked to ≤4 chars (the typical
# subword length) plus each non-alnum symbol. Greedy {1,4} chunks
# identically under Java regex (Spark) and RE2 (DuckDB), so the estimate
# is oracle-comparable.
BPE_PATTERN = "[A-Za-z0-9]{1,4}|[^A-Za-z0-9 ]"


def bpe_token_estimate(text="text") -> Column:
    """Subword-token count estimate via the BPE-ish regex — the
    whitespace-independent twin of `token_count` (long words cost multiple
    subword tokens, punctuation costs one each), matching how LLM tokenizers
    price text. JVM-side regexp, no UDF."""
    return F.size(F.regexp_extract_all(F.col(text), F.lit(BPE_PATTERN), F.lit(0))).cast(
        "int"
    )


def rolling_fingerprint(text="text") -> Column:
    """Order-sensitive rolling hash over the token stream:
    acc = (acc * 31 + len(token)) mod (2^31 - 1).

    Unlike the md5 `fingerprint` (exact content key), the rolling form is
    incremental — a streaming ingest can extend it token-by-token — and
    whole-document reorderings change it while the bag-of-words stays the
    same. The per-token contribution is deliberately arithmetic-only so the
    same recurrence runs on any engine (oracle-comparable); swap in a wider
    mix (e.g. xxhash of the token) when collision resistance matters."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + F.length(x), F.lit(2147483647)),
    )


def char_entropy_kernel(id_col: str = "doc_id", text_col: str = "text"):
    """Shannon entropy (bits/char) of each document's character
    distribution — the standard gibberish / encoding-damage / low-diversity
    signal (natural prose ≈ 4 bits, repeated filler ≪ 2, random bytes ≈ 8).

    Per-row math over the whole text ⇒ the scalable shape is a map-only
    Arrow kernel (mapInPandas), not an explode of every character into a
    corpus-wide shuffle: at 100 TB the exploded char table would be ~100×
    the corpus. numpy does the histogram per batch; no state, no shuffle.

    Returns a generator fn for `df.mapInPandas(fn, "<id> long,
    entropy double")`; entropy is rounded to 6 dp so the driver's
    value-hash comparison is stable against float formatting.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = np.zeros(len(pdf), dtype=np.float64)
            for row, text in enumerate(pdf[text_col]):
                s = text or ""
                if not s:
                    continue
                _, counts = np.unique(np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32), return_counts=True)
                p = counts / counts.sum()
                out[row] = -(p * np.log2(p)).sum()
            yield pd.DataFrame({id_col: pdf[id_col], "entropy": out.round(6)})

    return kernel


def char_entropy(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Apply the entropy kernel corpus-wide (see char_entropy_kernel)."""
    from ..session import fan_out

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        char_entropy_kernel(id_col, text_col), f"{id_col} long, entropy double"
    )


def token_repetition_kernel(id_col: str = "doc_id", text_col: str = "text"):
    """Token-repetition quality stats (the Gopher-style repetition rules,
    adapted to token granularity): per doc — token count, distinct token
    count, the highest single-token frequency, and the duplicate-bigram
    ratio (1 − distinct bigrams / bigrams; ≈1 means the doc loops).

    Same scale argument as char_entropy_kernel: per-row math over the
    whole text ⇒ map-only Arrow kernel; the oracle's explode-every-token
    corpus-wide shuffle is exactly the plan refused at 100 TB.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            n_tok = np.zeros(n, dtype=np.int64)
            n_dis = np.zeros(n, dtype=np.int64)
            top = np.zeros(n, dtype=np.int64)
            dup_bg = np.zeros(n, dtype=np.float64)
            for row, text in enumerate(pdf[text_col]):
                # literal single-space split, empties kept — pinned to the
                # oracle's string_split(text, ' ') and to F.split(text, ' ')
                # in text_unigram_logprob, so all three tokenizations agree
                # on tabs/newlines/consecutive spaces, not just on the
                # single-spaced synthetic corpus.
                toks = (text or "").split(" ")
                if not toks:
                    continue
                arr = np.array(toks)
                _, counts = np.unique(arr, return_counts=True)
                n_tok[row], n_dis[row], top[row] = len(arr), len(counts), counts.max()
                if len(arr) > 1:
                    bigrams = np.char.add(np.char.add(arr[:-1], " "), arr[1:])
                    dup_bg[row] = 1.0 - len(np.unique(bigrams)) / len(bigrams)
            yield pd.DataFrame({
                id_col: pdf[id_col], "n_tokens": n_tok, "n_distinct": n_dis,
                "top_freq": top, "dup_bigram_ratio": dup_bg.round(6),
            })

    return kernel


def token_repetition(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Apply the repetition kernel corpus-wide (see token_repetition_kernel)."""
    from ..session import fan_out

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        token_repetition_kernel(id_col, text_col),
        f"{id_col} long, n_tokens long, n_distinct long, top_freq long, "
        "dup_bigram_ratio double",
    )


def bpe_pair_stats(docs, top: int = 50, id_col: str = "doc_id",
                   text_col: str = "text"):
    """The core BPE-training step: adjacent character-pair frequencies,
    weighted by word frequency — the argmax pair is the next merge rule.

    Scale shape (the standard tokenizer-training trick): aggregate the
    corpus to its WORD-FREQUENCY table first (one shuffle, output is
    vocabulary-sized, not corpus-sized), then explode each distinct word
    into its ≤len-1 pairs and weight by the word count. At 100 TB the
    pair explode runs over the vocabulary (millions of rows), never the
    corpus. Ties break lexicographically for determinism.
    """
    from pyspark.sql import functions as F

    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "n",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
        .orderBy(F.desc("n_pair"), F.asc("pair"))
        .limit(top)
    )


def vocab_stats(docs, group_col: str = "lang", text_col: str = "text"):
    """Per-group vocabulary profile: total token count, distinct-token
    (vocabulary) size, hapax-legomena count (tokens seen exactly once),
    and hapax share — the corpus-health numbers (Heaps'-law position,
    OOV-rate proxy) checked before any tokenizer/dedup decision.

    Scale shape: explode to (group, token) → hash-agg counts (map-side
    combined; output is vocabulary-sized per group, not corpus-sized) →
    one tiny per-group rollup. Two shuffles total; no distinct-inside-agg
    (COUNT(DISTINCT) over the raw explode would carry every token
    occurrence through the shuffle — the pre-aggregation IS the
    optimization).
    """
    from pyspark.sql import functions as F

    from ..session import fan_out

    tok_counts = (
        fan_out(docs)
        .select(F.col(group_col), F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .groupBy(group_col, "t")
        .agg(F.count("*").alias("n"))
    )
    return (
        tok_counts.groupBy(group_col)
        .agg(
            F.sum("n").alias("total_tokens"),
            F.count("*").alias("vocab_size"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax_count"),
        )
        .select(
            group_col,
            "total_tokens",
            "vocab_size",
            "hapax_count",
            F.round(F.col("hapax_count") / F.col("vocab_size"), 6).alias("hapax_share"),
        )
    )


_GOPHER_STOPWORDS = ("the", "a")  # the corpus's English function words


def gopher_gates_kernel(id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style per-document quality gates (Rae et al. 2021 §A1.1,
    adapted to the whitespace-token corpus): token count, mean token
    length, stopword hits, and top-token dominance, each an INTEGER
    (milli-units via floor division) so the DuckDB oracle replays every
    gate bit-exactly; `passes` is the conjunction of the classic rules
    (enough tokens, sane mean word length, at least two stopwords, no
    single token dominating).

    Same scale shape as token_repetition_kernel: per-row math over the
    whole text ⇒ map-only Arrow kernel, no token-stream shuffle; the
    oracle's corpus-wide explode is the plan refused at 100 TB.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            n_tok = np.zeros(n, dtype=np.int64)
            mean_len = np.zeros(n, dtype=np.int64)
            stop_hits = np.zeros(n, dtype=np.int64)
            top_frac = np.zeros(n, dtype=np.int64)
            for row, text in enumerate(pdf[text_col]):
                # literal single-space split, empties kept — pinned to
                # string_split(text, ' ') like every other text kernel
                toks = (text or "").split(" ")
                if not toks:
                    continue
                arr = np.array(toks)
                _, counts = np.unique(arr, return_counts=True)
                nt = len(arr)
                n_tok[row] = nt
                mean_len[row] = (1000 * int(np.char.str_len(arr).sum())) // nt
                stop_hits[row] = int(np.isin(arr, _GOPHER_STOPWORDS).sum())
                top_frac[row] = (1000 * int(counts.max())) // nt
            passes = (
                (n_tok >= 10)
                & (mean_len >= 2000) & (mean_len <= 8000)
                & (stop_hits >= 2)
                & (top_frac <= 250)
            )
            yield pd.DataFrame({
                id_col: pdf[id_col], "n_tokens": n_tok,
                "mean_len_milli": mean_len, "stop_hits": stop_hits,
                "top_frac_milli": top_frac, "passes": passes,
            })

    return kernel


def gopher_quality_gates(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Apply the Gopher gates corpus-wide (see gopher_gates_kernel)."""
    from ..session import fan_out

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        gopher_gates_kernel(id_col, text_col),
        f"{id_col} long, n_tokens long, mean_len_milli long, stop_hits long, "
        "top_frac_milli long, passes boolean",
    )


_QLS_BUCKETS = 4096  # fasttext-style feature-hash width


def linear_weight_table(spark, buckets: int = _QLS_BUCKETS):
    """(bucket, w) weight table for `linear_quality_score`: md5-derived
    integers in [-500, 500] standing in for a trained model (the
    production path loads real trained weights into the same shape; the
    md5 family keeps the registered query engine-exact). Broadcast-sized
    by construction: `buckets` rows regardless of corpus size."""
    return spark.range(buckets).select(
        F.col("id").alias("bucket"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w:"), F.col("id"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 1001
            - 500
        ).alias("w"),
    )


def linear_quality_score(
    docs,
    weights=None,
    buckets: int = _QLS_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """fastText-shape linear classifier INFERENCE at corpus scale (the
    quality-classifier pass of CCNet/FineWeb pipelines): features are
    hashed unigrams + bigrams (the hashing trick, bucket = first 32 md5
    bits mod `buckets`), the model is a `buckets`-row (bucket, w) table
    joined BROADCAST onto the exploded feature stream, score is the
    per-doc mean weight in integer-milli. One shuffle (the per-doc sum);
    the model side never scales with the corpus.

    Integer-milli mean via non-negative floor-div only: w >= -500, so
    (sum + 500*n) is non-negative and `(1000*(sum+500n)) div n - 500000`
    is engine-exact ((h) in the exactness notes: Spark DIV truncates,
    DuckDB // floors — they only agree for non-negative operands).

    Returns (doc_id, n_features, logit_milli, keep): keep = sum >= 0.
    """
    from ..session import fan_out

    if weights is None:
        weights = linear_weight_table(docs.sparkSession, buckets)
    t = F.split(F.col(text_col), " ")
    bigrams = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - 1, 1)), "
        f"i -> concat(element_at(split({text_col}, ' '), i), ' ', "
        f"element_at(split({text_col}, ' '), i + 1)))"
    )
    feats = fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(
            F.when(F.size(t) >= 2, F.concat(t, bigrams)).otherwise(t)
        ).alias("f"),
    )
    hashed = feats.select(
        id_col,
        (
            F.conv(F.substring(F.md5(F.col("f")), 1, 8), 16, 10).cast("bigint")
            % buckets
        ).alias("bucket"),
    )
    per_doc = (
        hashed.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_features"), F.sum("w").alias("s"))
    )
    return per_doc.select(
        F.col(id_col).cast("long"),
        F.col("n_features").cast("long"),
        (
            F.expr("(1000 * (s + 500 * n_features)) DIV n_features")
            - F.lit(500000)
        ).cast("long").alias("logit_milli"),
        (F.col("s") >= 0).alias("keep"),
    )


def chunk_documents(
    docs,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Fixed-size overlapping word-window chunker — the context-window
    split every RAG indexer and long-context packing pipeline runs
    before embedding (LangChain/LlamaIndex `TokenTextSplitter` shape,
    re-expressed as one Catalyst map stage).

    Chunk i covers words [i*stride, i*stride+size); starts are
    0, stride, 2*stride, ... while start < n_words, so every document
    emits >= 1 chunk and consecutive chunks overlap by size-stride
    words. MAP-ONLY: sequence+explode inside the scan stage, no
    shuffle, output ~n_words/stride rows per doc — the shape that
    survives 100 TB because chunking never needs to see two documents
    together. Emits a stable md5 of each chunk text so downstream
    chunk-level dedup/linkage can key on content.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    chunked = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        toks.alias("_t"),
        F.explode(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(stride)))
        ).alias("chunk_id"),
    )
    words = F.slice(
        F.col("_t"), (F.col("chunk_id") * stride + 1).cast("int"), size
    )
    return chunked.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("long").alias("start_word"),
        F.size(words).cast("long").alias("n_words"),
        F.md5(F.array_join(words, " ")).alias("chunk_md5"),
    ).orderBy(id_col, "chunk_id")
