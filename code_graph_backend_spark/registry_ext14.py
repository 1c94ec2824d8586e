"""Round-5g extension queries:

- graph_stress_centrality: landmark-pair stress centrality — the
  integer-exact member of the betweenness family (operators/stress.py):
  Brandes-style geodesic counting with landmark pivots, no float
  dependency accumulation to diverge between engines;
- events_trigram_patterns: top event 3-sequences per user stream (the
  sequential-pattern rung above events_transition_matrix's Markov
  pairs) — two LEADs over one deterministic per-user window;
- text_rake_keywords: RAKE keyword extraction (Rose et al. 2010) with
  integer-micro scores — stopword-delimited candidate phrases via the
  cumsum-of-breaks trick, word degree/frequency stats, floor-scaled
  deg/freq scores so the ranking is engine-exact (the flesch_micro
  precedent).

Same discipline as every prior wave: integer decisions everywhere, a
DuckDB oracle per entry, BIGINT output casts, deterministic final
ordering."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .session import read_table


_COOC_EDGES_SQL = """SELECT a.pk AS src, b.pk AS dst
    FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem) b
      ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2 HAVING COUNT(*) >= 2"""

_COOC_NODES_SQL = f"""SELECT src AS id FROM ({_COOC_EDGES_SQL})
    UNION SELECT dst FROM ({_COOC_EDGES_SQL})"""


def _stress_sql() -> str:
    from .operators.stress import landmark_stress_sql

    return landmark_stress_sql(
        _COOC_NODES_SQL, _COOC_EDGES_SQL, n_landmarks=16, hops=3
    )


@register("graph_stress_centrality", _stress_sql())
def graph_stress_centrality_q(spark, sf_dir):
    """Stress centrality restricted to the 16-landmark pivot set, 3-hop
    bound, over the support-pruned part-co-occurrence graph (the dense
    community graph the triangle/jaccard kernels run on — stress on the
    sparse bipartite twin is dominated by its diameter and returns a
    near-empty profile) — σ_s(v)·σ_t(v) geodesic counting on the batched
    multi-source BFS (one frontier join + σ hash-agg + anti-join per
    round for ALL landmarks at once). See operators/stress.py for why
    counts, not Brandes deltas, are the hash-checkable contract."""
    from .operators.stress import landmark_stress
    from .registry_ext5 import _cooc_edges

    edges = _cooc_edges(spark, sf_dir)
    from .scratch import scratch_persist

    edges = scratch_persist(edges)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return landmark_stress(nodes, edges, n_landmarks=16, hops=3)


@register(
    "events_trigram_patterns",
    """
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 25
    """,
)
def events_trigram_patterns_q(spark, sf_dir):
    """Top-25 sequential event trigrams: the 3-step behavioral patterns
    (browse→cart→buy) that the pairwise transition matrix cannot see.
    One per-user ordered window (ts with event_id tie-break — the
    deterministic-window idiom), two LEADs in the SAME window spec (one
    sort, one shuffle on user_id), then a 125-cell-bounded hash-agg and
    a deterministic top-k. At 100 TB the window shuffle is the only
    corpus-sized exchange; the agg output is |event_types|³."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(25)
    )


@register(
    "text_rake_keywords",
    """
    WITH toks AS (
        SELECT doc_id, u.i, t[u.i] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             UNNEST(generate_series(1, len(t))) u(i)
    ),
    runs AS (
        SELECT doc_id, i, w,
               CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END AS brk,
               SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY i
                         ROWS UNBOUNDED PRECEDING) AS run
        FROM toks
    ),
    phrases AS (
        SELECT doc_id, run,
               string_agg(w, ' ' ORDER BY i) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS len
        FROM runs WHERE brk = 0
        GROUP BY doc_id, run
        HAVING COUNT(*) BETWEEN 1 AND 4
    ),
    wstat AS (
        SELECT u.w, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(p.len) AS BIGINT) AS deg
        FROM phrases p, UNNEST(string_split(p.phrase, ' ')) u(w)
        GROUP BY u.w
    ),
    wscore AS (
        SELECT w, (deg * 1000000) // freq AS score_micro FROM wstat
    ),
    pscore AS (
        SELECT d.phrase, CAST(SUM(ws.score_micro) AS BIGINT) AS score_micro
        FROM (SELECT DISTINCT phrase FROM phrases) d,
             UNNEST(string_split(d.phrase, ' ')) u(w)
        JOIN wscore ws ON ws.w = u.w
        GROUP BY d.phrase
    )
    SELECT p.phrase AS phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           ANY_VALUE(ps.score_micro) AS score_micro
    FROM phrases p JOIN pscore ps ON ps.phrase = p.phrase
    GROUP BY p.phrase
    ORDER BY score_micro DESC, p.phrase
    LIMIT 50
    """,
)
def text_rake_keywords_q(spark, sf_dir):
    """RAKE keyword extraction with engine-exact integer scoring:
    stopword tokens split each document into candidate phrases (the
    cumsum-of-breaks run id — one per-doc window), phrases capped at 4
    tokens (the standard RAKE cap), then word degree (Σ lengths of
    containing phrases) over frequency, floor-scaled to micro units so
    deg/freq ratios rank identically in both engines. Scale shape: one
    per-doc window over the token stream, then every agg is
    vocabulary-/phrase-dictionary-sized; the word-score join onto the
    distinct-phrase dictionary broadcasts."""
    from .session import fan_out
    from .scratch import scratch_persist

    docs = read_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    stop = F.col("w").isin("the", "a")
    w_run = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    runs = toks.select(
        "doc_id", "i", "w",
        F.when(stop, 1).otherwise(0).alias("brk"),
    ).withColumn("run", F.sum("brk").over(w_run))
    phrases = (
        runs.filter(F.col("brk") == 0)
        .groupBy("doc_id", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("long").alias("len"),
        )
        .filter(F.col("len").between(1, 4))
    )
    phrases = scratch_persist(phrases)
    pw = phrases.select("phrase", "len", F.explode(F.split("phrase", " ")).alias("w"))
    wscore = (
        pw.groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("len").alias("deg"))
        .select("w", F.expr("(deg * 1000000) div freq").alias("score_micro"))
    )
    dw = (
        phrases.select("phrase").distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    )
    pscore = (
        dw.join(F.broadcast(wscore), "w")
        .groupBy("phrase")
        .agg(F.sum("score_micro").cast("long").alias("score_micro"))
    )
    return (
        phrases.groupBy("phrase")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .join(F.broadcast(pscore), "phrase")
        .select("phrase", "n_occurrences", "score_micro")
        .orderBy(F.col("score_micro").desc(), "phrase")
        .limit(50)
    )
