"""Text-analysis workload over the documents table (beyond-reference):
language-ID (marker-word scoring), quality scoring, token counting,
document fingerprinting. All built-in higher-order functions — zero
Python in the hot path; each has an exact DuckDB twin.

Note on language-ID: the synthetic corpus shares one vocabulary across
its ``lang`` labels, so the classifier here demonstrates the *operator*
(n-gram/marker frequency scoring with deterministic argmax), not a
production language model. The profile lists are trivially swappable
for real stopword tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from . import Query
from ..functions.hashing import hash32, hash32_seeded, hash32_sql, hash32_seeded_sql
from ..functions import textstats
from ..sources.tables import load

# marker-word profiles, evaluated in this fixed order for tiebreaks
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["window", "batch", "group", "merge"],
    "en": ["the", "a", "table", "row"],
    "es": ["data", "stream", "filter", "scan"],
    "fr": ["query", "line", "order", "join"],
}

FP_SEED = 7


def _round6_portable(c: Column) -> Column:
    """Round-half-up at 6 dp as explicit double arithmetic. Engine
    ROUND()s disagree on exact ties (Spark half-up, DuckDB half-even),
    and q31's inputs are dyadic rationals (token counts, /64) that DO
    land on exact e-7 fives at sf0.1."""
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000


def _round6_portable_sql(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"


def _tok_count(toks: Column, word: str) -> Column:
    """Exact whole-token occurrence count (multiplicity included)."""
    return F.size(F.filter(toks, lambda t: t == F.lit(word))).cast("long")


def _tok_count_sql(word: str) -> str:
    return f"CAST(len(list_filter(tk, x -> x = '{word}')) AS BIGINT)"


_TOKS_CTE = """
toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9]+'),
                     x -> x <> '') AS tk
  FROM documents
)
"""


def q30_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language scoring with deterministic argmax (first
    profile in fixed order wins ties)."""
    docs = load(spark, sf_dir, "documents")
    toks = textstats.tokens(F.col("text"))
    d = docs.select("doc_id", F.col("lang").alias("labeled_lang"), toks.alias("tk"))
    for lang, words in LANG_PROFILES.items():
        score = None
        for w in words:
            c = _tok_count(F.col("tk"), w)
            score = c if score is None else (score + c)
        d = d.withColumn(f"s_{lang}", score)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_PROFILES])
    pred = None
    for lang in LANG_PROFILES:  # fixed order tiebreak
        cond = F.col(f"s_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return d.select("doc_id", "labeled_lang",
                    *[f"s_{lang}" for lang in LANG_PROFILES],
                    pred.alias("predicted_lang"))


def _langid_sql() -> str:
    scores = []
    for lang, words in LANG_PROFILES.items():
        expr = " + ".join(_tok_count_sql(w) for w in words)
        scores.append(f"({expr}) AS s_{lang}")
    score_cols = ", ".join(f"s_{lang}" for lang in LANG_PROFILES)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PROFILES) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_PROFILES) + " END"
    return f"""
WITH {_TOKS_CTE},
scored AS (
  SELECT doc_id, lang AS labeled_lang, {", ".join(scores)}
  FROM toks
)
SELECT doc_id, labeled_lang, {score_cols}, {case} AS predicted_lang
FROM scored
"""


def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: token count, mean token length,
    stopword ratio, composite score — the filter stage of a training
    -data pipeline. Token-less (empty/punctuation-only) documents are
    excluded up front: every ratio divides by the token count, and the
    gate drops them definitionally (the oracle filters identically, so
    ANSI DIVIDE_BY_ZERO can never fire on either engine)."""
    docs = load(spark, sf_dir, "documents")
    toks = textstats.tokens(F.col("text"))
    d = (docs.select("doc_id", F.col("n_chars").alias("n_chars"), toks.alias("tk"))
         .filter(F.size("tk") > 0))
    n_tok = F.size("tk").cast("long")
    char_sum = F.aggregate(
        F.transform(F.col("tk"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    stop = _tok_count(F.col("tk"), "the") + _tok_count(F.col("tk"), "a")
    d = (d.withColumn("n_tokens", n_tok)
         .withColumn("avg_token_len", char_sum / n_tok)
         .withColumn("stopword_ratio", stop / n_tok))
    score = (0.3 * F.least(F.col("n_tokens") / 60.0, F.lit(1.0))
             + 0.4 * (1.0 - F.col("stopword_ratio"))
             + 0.3 * F.least(F.col("avg_token_len") / 5.0, F.lit(1.0)))
    return d.select("doc_id", "n_chars", "n_tokens",
                    _round6_portable(F.col("avg_token_len")).alias("avg_token_len"),
                    _round6_portable(F.col("stopword_ratio")).alias("stopword_ratio"),
                    _round6_portable(score).alias("quality_score"))


_Q31_SQL = f"""
WITH {_TOKS_CTE},
m AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         list_sum(list_transform(tk, x -> CAST(length(x) AS BIGINT))) AS char_sum,
         {_tok_count_sql('the')} + {_tok_count_sql('a')} AS stop
  FROM toks WHERE len(tk) > 0
),
d AS (
  SELECT m.doc_id, doc.n_chars, m.n_tokens,
         m.char_sum / m.n_tokens AS avg_token_len,
         m.stop / m.n_tokens AS stopword_ratio
  FROM m JOIN documents doc ON doc.doc_id = m.doc_id
)
SELECT doc_id, n_chars, n_tokens,
       {_round6_portable_sql('avg_token_len')} AS avg_token_len,
       {_round6_portable_sql('stopword_ratio')} AS stopword_ratio,
       {_round6_portable_sql(
           '0.3 * least(n_tokens / 60.0, 1.0)'
           ' + 0.4 * (1.0 - stopword_ratio)'
           ' + 0.3 * least(avg_token_len / 5.0, 1.0)')} AS quality_score
FROM d
"""


def q32_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    subword-unit estimate (⌈len/4⌉ units per token)."""
    docs = load(spark, sf_dir, "documents")
    toks = textstats.tokens(F.col("text"))
    d = docs.select("doc_id", toks.alias("tk"))
    subwords = F.aggregate(
        F.transform(F.col("tk"),
                    lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return d.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tk")).cast("long").alias("n_distinct_tokens"),
        subwords.alias("n_subword_units"))


_Q32_SQL = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
       -- coalesce: DuckDB list_sum of an empty list is NULL; Spark's
       -- F.aggregate returns the 0 seed
       CAST(coalesce(list_sum(list_transform(tk, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_subword_units
FROM toks
"""


def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over word-4-gram rolling windows,
    two independent hash seeds (winnowing-style content signature;
    docs shorter than 4 tokens have no fingerprint)."""
    docs = load(spark, sf_dir, "documents")
    # tokenize BELOW the exchange: passing the raw tokens expression into
    # word_ngrams would duplicate the split/lower/filter tree into every
    # element_at (O(words²) per doc) — see operators.dedup.shingle_table
    toked = docs.select("doc_id", textstats.tokens(F.col("text")).alias("tk"))
    toked = toked.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    grams = textstats.word_ngrams(F.col("tk"), 4)
    exploded = toked.select("doc_id", F.explode(grams).alias("gram"))
    return (exploded.groupBy("doc_id")
            .agg(F.min(hash32(F.col("gram"))).alias("fp1"),
                 F.min(hash32_seeded(F.col("gram"), FP_SEED)).alias("fp2")))


_Q33_SQL = f"""
WITH {_TOKS_CTE},
grams AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                 for i in range(1, len(tk) - 2)]) AS gram
  FROM toks WHERE len(tk) >= 4
)
SELECT doc_id,
       min({hash32_sql('gram')}) AS fp1,
       min({hash32_seeded_sql('gram', FP_SEED)}) AS fp2
FROM grams GROUP BY doc_id
"""


def _quality_iscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, doc_id, n_tokens, iscore): the q31 composite quality score
    quantized to an exact integer (×1e6, half-up) so every downstream
    comparison is integer math — no float threshold ambiguity.
    Token-less docs are dropped up front (see q31 — same ratio math,
    same oracle-mirrored filter)."""
    docs = load(spark, sf_dir, "documents")
    toks = textstats.tokens(F.col("text"))
    d = (docs.select("doc_id", "lang", toks.alias("tk"))
         .filter(F.size("tk") > 0))
    n_tok = F.size("tk").cast("long")
    char_sum = F.aggregate(
        F.transform(F.col("tk"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    stop = _tok_count(F.col("tk"), "the") + _tok_count(F.col("tk"), "a")
    d = (d.withColumn("n_tokens", n_tok)
         .withColumn("avg_token_len", char_sum / n_tok)
         .withColumn("stopword_ratio", stop / n_tok))
    score = (0.3 * F.least(F.col("n_tokens") / 60.0, F.lit(1.0))
             + 0.4 * (1.0 - F.col("stopword_ratio"))
             + 0.3 * F.least(F.col("avg_token_len") / 5.0, F.lit(1.0)))
    return d.select(
        "lang", "doc_id", "n_tokens",
        F.floor(score * 1_000_000 + F.lit(0.5)).cast("long").alias("iscore"))


def q63_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-gated quality filter: per language, drop documents
    scoring below the nearest-rank p25 of the q31 composite score, and
    report the kept/dropped token budget — the corpus-filtering stage
    of a training-data pipeline.

    Scale design: the threshold comes from a score HISTOGRAM, not a
    per-language sort of documents. groupBy(lang, iscore) bounds every
    window partition at the number of distinct quantized scores (≤1e6
    six-decimal values) regardless of corpus size, and the cumulative
    count runs over that small histogram. The corpus is scanned ONCE:
    the histogram carries the per-bucket token sums, so both the
    threshold and every reported budget derive from histogram rows —
    no join back onto the documents, no per-doc rank, and the only
    persisted intermediate is the histogram itself (rows bounded by
    distinct quantized scores, corpus-size-independent — this replaced
    a full per-doc persist that was never freed, ADVICE r2)."""
    scored = _quality_iscore(spark, sf_dir)
    hist = (scored.groupBy("lang", "iscore")
            .agg(F.count("*").alias("n"),
                 F.sum("n_tokens").alias("tok")).persist())
    w = (Window.partitionBy("lang").orderBy("iscore")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (hist.withColumn("cum", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(Window.partitionBy("lang"))))
    # nearest-rank p25: smallest iscore whose cumulative count reaches
    # ceil(total/4) — pure integer arithmetic in both engines
    thr = (cum.filter(F.col("cum") >= F.ceil(F.col("total") / 4))
           .groupBy("lang").agg(F.min("iscore").alias("thr")))
    gated = (hist.join(F.broadcast(thr), "lang")
             .withColumn("keep", (F.col("iscore") >= F.col("thr")).cast("int")))
    return (gated.groupBy("lang")
            .agg(F.sum("n").alias("n_docs"),
                 F.sum(F.col("n") * F.col("keep")).alias("n_kept"),
                 F.sum(F.col("n") * (1 - F.col("keep"))).alias("n_dropped"),
                 F.sum(F.col("tok") * F.col("keep")).alias("kept_tokens"),
                 F.sum(F.col("tok") * (1 - F.col("keep"))).alias("dropped_tokens"),
                 (F.min("thr") / 1_000_000.0).alias("p25_score")))


_Q63_SQL = f"""
WITH {_TOKS_CTE},
m AS (
  SELECT doc_id, lang,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         list_sum(list_transform(tk, x -> CAST(length(x) AS BIGINT))) AS char_sum,
         {_tok_count_sql('the')} + {_tok_count_sql('a')} AS stop
  FROM toks WHERE len(tk) > 0
),
scored AS (
  SELECT lang, doc_id, n_tokens,
         CAST(floor((0.3 * least(n_tokens / 60.0, 1.0)
                     + 0.4 * (1.0 - stop / n_tokens)
                     + 0.3 * least((char_sum / n_tokens) / 5.0, 1.0))
                    * 1000000 + 0.5) AS BIGINT) AS iscore
  FROM m
),
hist AS (
  SELECT lang, iscore, count(*) AS n FROM scored GROUP BY lang, iscore
),
cum AS (
  SELECT lang, iscore,
         sum(n) OVER (PARTITION BY lang ORDER BY iscore
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY lang) AS total
  FROM hist
),
thr AS (
  SELECT lang, min(iscore) AS thr FROM cum
  WHERE cum >= ceil(total / 4.0) GROUP BY lang
),
gated AS (
  SELECT s.lang, s.n_tokens, t.thr,
         CASE WHEN s.iscore >= t.thr THEN 1 ELSE 0 END AS keep
  FROM scored s JOIN thr t ON s.lang = t.lang
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       CAST(sum(1 - keep) AS BIGINT) AS n_dropped,
       CAST(sum(n_tokens * keep) AS BIGINT) AS kept_tokens,
       CAST(sum(n_tokens * (1 - keep)) AS BIGINT) AS dropped_tokens,
       min(thr) / 1000000.0 AS p25_score
FROM gated GROUP BY lang
"""


# --- q76: intra-document repetition stats --------------------------------

REP_NGRAM = 3            # duplicate-n-gram size (Gopher-style filter)
REP_DUP3_MAX = 0.20      # flag: > 20% of 3-gram occurrences are repeats
REP_TOPW_MAX = 0.30      # flag: top word covers > 30% of the doc


def q76_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (the Gopher/MassiveText repetition
    rules, rephrased over this corpus): per document, the fraction of
    word occurrences that are duplicates, the coverage of the single most
    frequent word, and the duplicate-3-gram fraction; docs exceeding the
    thresholds are flagged for removal.

    Scale shape: two explode → hash-aggregate chains (unigrams, 3-grams),
    both keyed on doc_id — map-side combinable, shuffle carries (doc_id,
    token-hash-sized strings) counts, never documents. The per-doc stats
    join is doc_id-equi on already-aggregated (|docs|-row) inputs. No
    windows, no sorts, no Python.

    Fractions are ratios of exact integers, rounded with the portable
    half-up form, so both engines emit bit-identical doubles."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = docs.select("doc_id", textstats.tokens(F.col("text")).alias("tk"))
    uni = (d.select("doc_id", F.explode("tk").alias("t"))
           .groupBy("doc_id", "t").agg(F.count("*").alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").alias("n_words"),
                F.count("*").alias("n_distinct"),
                F.max("c").alias("top_c")))
    tri = (d.select("doc_id",
                    F.explode(textstats.word_ngrams(F.col("tk"),
                                                    REP_NGRAM)).alias("g"))
           .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").alias("n3"), F.count("*").alias("d3")))
    base = d.select("doc_id").join(uni, "doc_id", "left").join(tri, "doc_id", "left")
    nz = lambda c: F.coalesce(c, F.lit(0).cast("long"))  # noqa: E731
    n_words, n3 = nz(F.col("n_words")), nz(F.col("n3"))
    dup_word = F.when(n_words > 0,
                      (n_words - nz(F.col("n_distinct"))) / n_words).otherwise(0.0)
    top_word = F.when(n_words > 0, nz(F.col("top_c")) / n_words).otherwise(0.0)
    dup3 = F.when(n3 > 0, (n3 - nz(F.col("d3"))) / n3).otherwise(0.0)
    out = (base.withColumn("n_words", n_words)
           .withColumn("dup_word_frac", _round6_portable(dup_word))
           .withColumn("top_word_frac", _round6_portable(top_word))
           .withColumn("dup_3gram_frac", _round6_portable(dup3)))
    flagged = ((F.col("dup_3gram_frac") > REP_DUP3_MAX)
               | (F.col("top_word_frac") > REP_TOPW_MAX))
    return out.select("doc_id", "n_words", "dup_word_frac", "top_word_frac",
                      "dup_3gram_frac", flagged.alias("flagged"))


def _q76_gram_expr() -> str:
    parts = " || ' ' || ".join(f"tk[i+{j}]" for j in range(REP_NGRAM))
    return f"[{parts} for i in range(1, len(tk) - {REP_NGRAM - 2})]"


_Q76_SQL = f"""
WITH {_TOKS_CTE},
uni AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_c
  FROM (SELECT doc_id, t, count(*) AS c
        FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_q76_gram_expr()}) AS g
              FROM toks WHERE len(tk) >= {REP_NGRAM}) GROUP BY 1, 2)
  GROUP BY doc_id
),
j AS (
  SELECT t.doc_id,
         coalesce(n_words, 0) AS n_words, coalesce(n_distinct, 0) AS n_distinct,
         coalesce(top_c, 0) AS top_c, coalesce(n3, 0) AS n3, coalesce(d3, 0) AS d3
  FROM toks t LEFT JOIN uni USING (doc_id) LEFT JOIN tri USING (doc_id)
),
f AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         {_round6_portable_sql(
             'CASE WHEN n_words > 0 THEN CAST(n_words - n_distinct AS DOUBLE)'
             ' / n_words ELSE 0.0 END')} AS dup_word_frac,
         {_round6_portable_sql(
             'CASE WHEN n_words > 0 THEN CAST(top_c AS DOUBLE) / n_words'
             ' ELSE 0.0 END')} AS top_word_frac,
         {_round6_portable_sql(
             'CASE WHEN n3 > 0 THEN CAST(n3 - d3 AS DOUBLE) / n3'
             ' ELSE 0.0 END')} AS dup_3gram_frac
  FROM j
)
SELECT doc_id, n_words, dup_word_frac, top_word_frac, dup_3gram_frac,
       (dup_3gram_frac > {REP_DUP3_MAX} OR top_word_frac > {REP_TOPW_MAX})
         AS flagged
FROM f
"""


# Count-min sketch geometry: DEPTH independent hash rows × WIDTH
# buckets. State is DEPTH·WIDTH counters regardless of corpus size —
# the property that makes the sketch the 100 TB path for frequency
# estimation when the exact distinct-token table would not fit.
CM_WIDTH = 256
CM_SEEDS = (11, 23, 37, 53)
CM_TOPK = 20


def _cm_bucket(tok: Column, seed: int) -> Column:
    return hash32_seeded(tok, seed) % CM_WIDTH


def q84_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a deterministic count-min sketch (Cormode &
    Muthukrishnan 2005): estimate corpus token frequencies from
    DEPTH×WIDTH counters, report the exact top-K tokens with their
    sketch estimates and the sketch's (always ≥ 0) overcount.

    The exact aggregate is the in-result recall oracle, mirroring
    q28's sketch-vs-exact pattern: at 100 TB the sketch side survives
    unchanged (constant state, map-side combinable, mergeable across
    shards/streams) while candidates would come from per-partition
    top-k instead of the global exact pass. Fixed seeds + the portable
    MD5-derived hash make every counter bit-identical across engines."""
    docs = load(spark, sf_dir, "documents")
    toked = (docs.select("doc_id", textstats.tokens(F.col("text")).alias("tk"))
             .repartition(spark.sparkContext.defaultParallelism, "doc_id"))
    tok = toked.select(F.explode("tk").alias("t"))
    # one pass over tokens: stack (row, bucket) pairs, hash-agg counts.
    # Shuffle after map-side combine is ≤ DEPTH·WIDTH rows per task.
    db = F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"), _cm_bucket(F.col("t"), s).alias("b"))
        for d, s in enumerate(CM_SEEDS)])).alias("db")
    sketch = (tok.select(db).select("db.d", "db.b")
              .groupBy("d", "b").agg(F.count("*").alias("c")))
    exact = (tok.groupBy("t").agg(F.count("*").alias("exact_count"))
             .orderBy(F.desc("exact_count"), F.asc("t")).limit(CM_TOPK))
    cand = exact.select("t", "exact_count", db).select(
        "t", "exact_count", "db.d", "db.b")
    est = (sketch.join(F.broadcast(cand), ["d", "b"])
           .groupBy("t", "exact_count").agg(F.min("c").alias("est_count")))
    return (est.withColumn("overcount", F.col("est_count") - F.col("exact_count"))
            .select(F.col("t").alias("token"), "exact_count", "est_count",
                    "overcount"))


def _q84_sql() -> str:
    rows = "\n  UNION ALL ".join(
        f"SELECT {d} AS d, {hash32_seeded_sql('t', s)} % {CM_WIDTH} AS b FROM tok"
        for d, s in enumerate(CM_SEEDS))
    cases = "\n           ".join(
        f"WHEN {d} THEN {hash32_seeded_sql('t', s)} % {CM_WIDTH}"
        for d, s in enumerate(CM_SEEDS))
    depths = ", ".join(str(d) for d in range(len(CM_SEEDS)))
    return f"""
WITH {_TOKS_CTE},
tok AS (SELECT unnest(tk) AS t FROM toks),
pairs AS (
  {rows}
),
sketch AS (SELECT d, b, count(*) AS c FROM pairs GROUP BY d, b),
exact AS (
  SELECT t, count(*) AS exact_count FROM tok GROUP BY t
  ORDER BY exact_count DESC, t LIMIT {CM_TOPK}
),
cand AS (
  SELECT t, exact_count, d,
         CASE d
           {cases}
         END AS b
  FROM exact CROSS JOIN (SELECT unnest([{depths}]) AS d)
)
SELECT c.t AS token, c.exact_count, min(s.c) AS est_count,
       min(s.c) - c.exact_count AS overcount
FROM cand c JOIN sketch s USING (d, b)
GROUP BY c.t, c.exact_count
"""


QUERIES: dict[str, Query] = {
    "q30_langid": Query(q30_langid, _langid_sql()),
    "q31_quality_score": Query(q31_quality_score, _Q31_SQL),
    "q32_token_stats": Query(q32_token_stats, _Q32_SQL),
    "q33_fingerprint": Query(q33_fingerprint, _Q33_SQL),
    "q63_quality_gate": Query(q63_quality_gate, _Q63_SQL),
    "q76_repetition_stats": Query(q76_repetition_stats, _Q76_SQL),
    "q84_heavy_hitters": Query(q84_heavy_hitters, _q84_sql()),
}
