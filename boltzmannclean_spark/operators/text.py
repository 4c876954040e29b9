"""Text-analysis operators for training-data pipelines (SURVEY.md §2.B:
language-ID, quality scoring, token counting, document fingerprinting,
word statistics, tf-idf).

Everything is JVM-side string/array builtins — per-document work is
embarrassingly parallel (no shuffle except the final aggregations), so
these scale linearly with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

# Tiny built-in stopword/marker lists (the corpus vocabulary is synthetic;
# the operator structure is what matters).
STOPWORDS = ("the", "a", "of", "and")
LANG_MARKERS = {
    "en": ("the", "a"),
    "generic": (),
}


@register(
    "text_quality",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         string_split(text, ' ') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang, n_chars,
         LEN(toks) AS n_tokens,
         LEN(list_distinct(toks)) AS n_unique,
         LEN(LIST_FILTER(toks, x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop
  FROM t
)
SELECT doc_id, lang, n_chars, n_tokens, n_unique,
       CAST(n_unique AS DOUBLE) / n_tokens AS type_token_ratio,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
       CASE WHEN n_tokens >= 40 AND CAST(n_unique AS DOUBLE) / n_tokens > 0.4
            THEN 'good'
            WHEN n_tokens >= 15 THEN 'fair'
            ELSE 'poor' END AS quality_band
FROM m
ORDER BY doc_id
""",
    tags=("text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, type/token ratio,
    stopword ratio, average token length, quality band."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    m = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
    )
    ttr = F.col("n_unique").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        "n_unique",
        ttr.alias("type_token_ratio"),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        F.when((F.col("n_tokens") >= 40) & (ttr > 0.4), "good")
        .when(F.col("n_tokens") >= 15, "fair")
        .otherwise("poor")
        .alias("quality_band"),
    ).orderBy("doc_id")


@register(
    "text_wordcount",
    oracle="""
SELECT lang, tok, COUNT(*) AS n
FROM (
  SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
) t
GROUP BY lang, tok
ORDER BY lang, n DESC, tok
""",
    tags=("text", "wordcount"),
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic explode → count word frequency per language."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", F.desc("n"), "tok")
    )


@register(
    "text_langid",
    oracle="""
WITH t AS (
  SELECT doc_id, lang,
         string_split(text, ' ') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(LEN(LIST_FILTER(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
           / LEN(toks) AS en_marker_ratio
  FROM t
)
SELECT doc_id, lang AS labeled_lang, en_marker_ratio,
       CASE WHEN en_marker_ratio >= 0.05 THEN 'en' ELSE 'und' END AS guessed_lang,
       (lang = CASE WHEN en_marker_ratio >= 0.05 THEN 'en' ELSE 'und' END)
         AS guess_matches_label
FROM m
ORDER BY doc_id
""",
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (n-gram-frequency classifier
    degenerates to marker ratios on this synthetic shared-vocabulary
    corpus; the operator shape — per-doc featurize → classify → compare
    to label — is the real pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ratio = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("double")
        / F.size(toks)
    )
    m = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        ratio.alias("en_marker_ratio"),
    )
    guess = F.when(F.col("en_marker_ratio") >= 0.05, "en").otherwise("und")
    return m.select(
        "doc_id",
        "labeled_lang",
        "en_marker_ratio",
        guess.alias("guessed_lang"),
        (F.col("labeled_lang") == guess).alias("guess_matches_label"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS vocab_fp
  FROM documents
)
SELECT vocab_fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM fp
GROUP BY vocab_fp
HAVING COUNT(*) > 1
ORDER BY keep_doc_id
""",
    tags=("text", "fingerprint", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted vocabulary set
    (order/multiplicity-invariant content fingerprint); clusters with
    >1 doc are vocabulary-identical near-duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " ")
    )
    return (
        docs.select("doc_id", fp.alias("vocab_fp"))
        .groupBy("vocab_fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_docs") > 1)
        .orderBy("keep_doc_id")
    )


@register(
    "text_token_stats",
    oracle="""
SELECT
  doc_id,
  LEN(string_split(text, ' ')) AS ws_tokens,
  LEN(regexp_split_to_array(text, '[a-z]+')) - 1 AS nonword_runs,
  CAST(CEIL(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS approx_bpe_tokens,
  LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
FROM documents
ORDER BY doc_id
""",
    tags=("text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, regex word-run splits, and the
    chars/4 BPE-token heuristic used for budget estimates."""
    from boltzmannclean_spark.pipeline import token_stats

    # Opt into the precomputed-length fast path: documents.n_chars is
    # generated as length(text), and scanning the int column beats
    # re-measuring the string bytes (r7 ADVICE made this explicit).
    return token_stats(
        load_table(spark, sf_dir, "documents"), n_chars_col="n_chars"
    )


@register(
    "text_tfidf_top_term",
    oracle="""
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) x
  GROUP BY doc_id, tok
),
df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok AS top_term, score AS top_score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok DESC) AS rn
  FROM scored
) t
WHERE rn = 1
ORDER BY doc_id
""",
    tags=("text", "tfidf"),
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf-style most-distinctive term per document (ratio-scored:
    tf × N/df — monotone in tf-idf without the cross-engine log).
    Two aggregations + one broadcast join on the term dictionary; the
    corpus size N stays plan-side as a broadcast 1-row crossJoin (no
    driver-side count, so the whole query is a single job)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "score"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.max_by("tok", F.struct("score", "tok")).alias("top_term"),
            F.max("score").alias("top_score"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_filter",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
),
m AS (
  SELECT doc_id, n_chars,
         LEN(toks) AS n_tokens,
         CAST(LEN(LIST_FILTER(toks, x -> x IN ('the', 'a', 'of', 'and')))
              AS DOUBLE) / LEN(toks) AS stop_frac,
         CAST(n_chars - LEN(toks) + 1 AS DOUBLE) / LEN(toks) AS mean_word_len
  FROM t
)
SELECT doc_id, n_tokens, mean_word_len, stop_frac,
       (n_tokens BETWEEN 30 AND 100000)      AS ok_length,
       (mean_word_len BETWEEN 2 AND 12)      AS ok_word_len,
       (stop_frac >= 0.01)                   AS ok_stopwords,
       ((n_tokens BETWEEN 30 AND 100000)
        AND (mean_word_len BETWEEN 2 AND 12)
        AND (stop_frac >= 0.01))             AS keep
FROM m
ORDER BY doc_id
""",
    tags=("text", "quality", "filter"),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filter (Gopher-style heuristics: token-count
    bounds, mean word length bounds, minimum stopword fraction), emitting
    per-rule flags plus the final keep decision — the auditable form a
    production pipeline logs. Pure JVM builtins; linear in corpus bytes."""
    from boltzmannclean_spark.pipeline import quality_filter

    # n_chars_col opt-in: the fixture guarantees n_chars == length(text)
    # and the int column is the narrower scan (r7 ADVICE).
    return quality_filter(
        load_table(spark, sf_dir, "documents"),
        stopwords=STOPWORDS,
        n_chars_col="n_chars",
    )


@register(
    "text_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
total AS (SELECT SUM(n) AS n_total FROM freq),
scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         SUM(log10(CAST(f.n AS DOUBLE) / total.n_total)) AS sum_lp
  FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN total
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(sum_lp / n_tokens AS FLOAT) AS avg_logprob
FROM scored
ORDER BY doc_id
""",
    tags=("text", "langmodel", "quality"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: corpus token frequencies → per-doc
    mean log10 probability (the perplexity-proxy quality signal used to
    filter crawl data against a reference corpus). Two aggregations plus
    one broadcast dictionary join; float-cast because log10 is libm.

    Scale: the dictionary is Zipf-bounded (vocabulary ≪ corpus) so the
    frequency table broadcasts; the token stream never shuffles twice.
    The corpus token total stays plan-side (broadcast 1-row crossJoin)
    — no driver-side collect, one job end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").cast("double").alias("n_total"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log10(F.col("n").cast("double") / F.col("n_total")).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp") / F.count(F.lit(1))).cast("float").alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_pii_redact",
    oracle="""
SELECT
  event_id,
  LEN(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
  LEN(regexp_extract_all(props, '[a-z0-9._]+@[a-z0-9.-]+')) AS n_emails,
  md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS redacted_hash
FROM events
WHERE event_id < 3000
ORDER BY event_id
""",
    tags=("text", "pii", "redact"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing over the raw event payload: count digit runs
    and email-shaped spans, emit the md5 of the digit-redacted payload
    (hash, not text, so the oracle compare is representation-stable).
    Spark's regexp_replace is global by default; DuckDB needs the 'g'
    flag — same automaton either way, per-row, embarrassingly parallel."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        F.regexp_count("props", F.lit("[0-9]+")).alias("n_digit_runs"),
        F.regexp_count("props", F.lit("[a-z0-9._]+@[a-z0-9.-]+")).alias("n_emails"),
        F.md5(F.regexp_replace("props", "[0-9]+", "#")).alias("redacted_hash"),
    ).orderBy("event_id")


@register(
    "text_repetition_ratio",
    oracle="""
WITH src AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
ex AS (
  SELECT doc_id, UNNEST(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM src
),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok),
top AS (
  SELECT doc_id, tok AS top_tok, c AS top_cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
  FROM cnt
),
tok_stats AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct_tokens
  FROM ex GROUP BY doc_id
),
bi AS (
  SELECT doc_id, tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
  FROM ex
  QUALIFY LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
),
bi_stats AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT bg) AS n_distinct_bigrams
  FROM bi GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, p.top_tok, p.top_cnt,
       CAST(p.top_cnt AS DOUBLE) / t.n_tokens AS top_frac,
       COALESCE(b.n_bigrams, 0) AS n_bigrams,
       COALESCE(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       CASE WHEN COALESCE(b.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
       END AS dup_bigram_frac
FROM tok_stats t
JOIN top p ON p.doc_id = t.doc_id AND p.rn = 1
LEFT JOIN bi_stats b ON b.doc_id = t.doc_id
ORDER BY t.doc_id
""",
    tags=("text", "quality", "repetition"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-frequent-token
    fraction and duplicate-bigram fraction. Everything is a per-row
    array expression (array_remove / array_distinct / zip_with over
    slices / a comparator array_sort for the mode) — zero shuffles,
    zero Python; the whole computation inlines into one codegen stage,
    which is exactly what a 100 TB quality-scoring pass needs."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.selectExpr(
        "doc_id",
        "array_remove(split(text, ' '), '') AS toks",
    ).selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        "size(array_distinct(toks)) AS n_distinct_tokens",
        # mode: sort distinct tokens by (count desc, token asc), take head
        "array_sort(transform(array_distinct(toks),"
        " t -> struct(size(filter(toks, x -> x = t)) AS c, t AS t)),"
        " (a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1"
        " WHEN a.t < b.t THEN -1 WHEN a.t > b.t THEN 1 ELSE 0 END)[0] AS top",
        "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        " slice(toks, 2, greatest(size(toks) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b)) AS bigrams",
    ).selectExpr(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top.t AS top_tok",
        "CAST(top.c AS BIGINT) AS top_cnt",
        "CAST(top.c AS DOUBLE) / n_tokens AS top_frac",
        "CAST(size(bigrams) AS BIGINT) AS n_bigrams",
        "CAST(size(array_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams",
        "CASE WHEN size(bigrams) = 0 THEN 0.0"
        " ELSE CAST(size(bigrams) - size(array_distinct(bigrams)) AS DOUBLE)"
        "      / size(bigrams) END AS dup_bigram_frac",
    )
    return out.orderBy("doc_id")


@register(
    "sample_stratified",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT *, substring(md5(doc_id::VARCHAR), 1, 1) AS hd FROM documents
)
WHERE CASE WHEN lang = 'en' THEN hd IN ('0')
      ELSE hd IN ('0', '1', '2', '3') END
ORDER BY doc_id
""",
    tags=("sample", "stratified", "curation"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified reproducible sampling: downsample the majority
    language to 1/16 while keeping 4/16 of every other language — the
    language-rebalancing step of corpus curation. Per-stratum rates ride
    the same md5-digit hash as the uniform sampler, so membership is
    stable under reruns, repartitioning, and engine migration; the
    predicate pushes to the scan, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    hd = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.when(F.col("lang") == "en", hd.isin("0")).otherwise(
        hd.isin("0", "1", "2", "3")
    )
    return (
        docs.where(keep)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


PACK_BUDGET = 2048  # tokens per training chunk


@register(
    "chunk_pack_tokens",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT lang, CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c
GROUP BY lang, (cum - n_tokens) // {PACK_BUDGET}
ORDER BY lang, chunk_id
""",
    tags=("curation", "packing", "window"),
)
def chunk_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunk packing: docs stream in doc_id order per
    language and append to the current ~2048-token training chunk; a doc
    whose predecessor crossed the budget boundary starts the next chunk
    (chunk_id = floor(prev_cumsum / budget) — deterministic contiguous
    fill, no bin-packing search). One lang-keyed shuffle serves the
    running sum and the per-chunk rollup; integer token counts make the
    assignment engine- and partitioning-independent."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(F.array_remove(F.split("text", " "), "")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.withColumn("chunk_id", F.expr(f"(cum - n_tokens) div {PACK_BUDGET}"))
        .groupBy("lang", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "chunk_id")
    )


VOCAB_TOP_K = 100


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM toks GROUP BY tok
  ) WHERE rk <= {VOCAB_TOP_K}
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       COUNT(v.tok) AS n_in_vocab,
       CAST(COUNT(*) - COUNT(v.tok) AS DOUBLE) / COUNT(*) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    tags=("text", "vocab", "oov"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-100
    vocabulary — the tokenizer-fit signal (high OOV → wrong tokenizer or
    wrong-language doc). Two aggregations: corpus term counts (token-
    keyed shuffle), then a broadcast of the tiny vocab back over the
    exploded tokens; deterministic (count desc, token) vocab cut."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.split("text", " "), "")).alias("tok"),
    )
    wv = Window.orderBy(F.desc("n"), "tok")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") <= VOCAB_TOP_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("in_vocab").alias("n_in_vocab"),
            (
                (F.count(F.lit(1)) - F.count("in_vocab")).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_logprob",
    oracle="""
WITH src AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
toks AS (
  SELECT doc_id, UNNEST(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM src
),
bi AS (
  SELECT doc_id, tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  QUALIFY LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
),
bg_counts AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
u_counts AS (SELECT w1, SUM(c2) AS c1 FROM bg_counts GROUP BY w1)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(ln(CAST(g.c2 AS DOUBLE) / u.c1)) / COUNT(*) AS FLOAT)
         AS mean_logprob
FROM bi b
JOIN bg_counts g ON g.w1 = b.w1 AND g.w2 = b.w2
JOIN u_counts u ON u.w1 = b.w1
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
    tags=("text", "lm", "bigram"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring: corpus-estimated P(w₂|w₁) =
    c(w₁w₂)/c(w₁·), per-doc mean log-probability — the step up from the
    unigram proxy (text_unigram_logprob) and the standard LM-quality
    filter shape: counts aggregate once corpus-wide, then broadcast-ish
    joins score every doc's bigrams. Probabilities divide exact counts;
    only the per-doc Σln (merge-order-sensitive) is FLOAT-truncated."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.array_remove(F.split("text", " "), "")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("w2", F.lead("tok").over(w))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), "w2")
    )
    bg = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    un = bg.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lp = F.log(F.col("c2").cast("double") / F.col("c1"))
    return (
        bi.join(bg, ["w1", "w2"])
        .join(un, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(lp) / F.count(F.lit(1))).cast("float").alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


BENCH_DOCS = 10  # doc_id < 10 stands in for the eval/benchmark set
CONTAM_MIN_SHARED = 3


@register(
    "text_decontaminate",
    oracle=f"""
WITH src AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
g5 AS (
  SELECT doc_id, DISTINCT_ON_HACK.g AS g FROM src,
  LATERAL (SELECT UNNEST(list_distinct(list_transform(
    generate_series(1, len(toks) - 4),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
         || toks[i+3] || ' ' || toks[i+4]))) AS g) AS DISTINCT_ON_HACK
),
bench AS (SELECT DISTINCT g FROM g5 WHERE doc_id < {BENCH_DOCS}),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_shared
  FROM g5 c JOIN bench b ON c.g = b.g
  WHERE c.doc_id >= {BENCH_DOCS}
  GROUP BY c.doc_id
)
SELECT doc_id, n_shared,
       CASE WHEN n_shared >= {CONTAM_MIN_SHARED} THEN 1 ELSE 0 END AS contaminated
FROM hits
ORDER BY doc_id
""",
    tags=("text", "decontamination", "llm"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word
    5-grams with the held-out set (doc_id < 10 as the stand-in) — the
    eval-integrity pass every LLM corpus needs. The benchmark's distinct
    5-grams broadcast (eval sets are tiny vs the corpus); training docs
    stream through the hash join, so cost is one corpus pass at any
    scale. 5-grams build as per-row array expressions — no shuffle
    until the per-doc hit count. Docs under 5 tokens yield NO grams:
    unguarded, sequence(0, n-5) would step -1 for n < 5 (descending
    sequence → negative subscripts, an INVALID_ARRAY_INDEX error under
    ANSI mode) while the oracle's generate_series is simply empty —
    guaranteed to matter on a real crawl even though fixtures start at
    10 tokens."""
    docs = load_table(spark, sf_dir, "documents")
    # r15: hoist the token array into its own projection — the inlined
    # form re-evaluated array_remove(split(text)) for every one of the
    # five subscripts of every gram of every row (the lambda body is
    # interpreted, no common-subexpression elimination), turning a
    # per-row tokenize into per-row-times-5-grams work.
    toks = docs.selectExpr(
        "doc_id", "array_remove(split(text, ' '), '') AS a"
    )
    g5 = toks.selectExpr(
        "doc_id",
        "explode(CASE WHEN size(a) >= 5"
        " THEN array_distinct(transform(sequence(0, size(a) - 5),"
        " i -> concat_ws(' ', a[i], a[i+1], a[i+2], a[i+3], a[i+4])))"
        " ELSE array() END) AS g",
    )
    bench = (
        g5.where(F.col("doc_id") < BENCH_DOCS).select("g").distinct()
    )
    return (
        g5.where(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(
            "doc_id",
            "n_shared",
            F.when(F.col("n_shared") >= CONTAM_MIN_SHARED, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


MIX_ALPHA = 2  # weight ∝ quality^alpha


@register(
    "curation_mixture_weights",
    oracle="""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(LEN(list_distinct(list_filter(string_split(text, ' '),
                                                x -> x <> '')))) AS BIGINT)
           AS sum_unique,
         CAST(SUM(LEN(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT source, n_docs,
         CAST(sum_unique AS DOUBLE) / sum_tokens AS quality
  FROM per_source
)
SELECT source, n_docs, quality,
       CAST(quality * quality / SUM(quality * quality) OVER () AS FLOAT)
         AS mix_weight
FROM q
ORDER BY source
""",
    tags=("curation", "mixture", "llm"),
)
def curation_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weighting: per-source sampling weights ∝ quality²
    (pooled type/token ratio from EXACT integer token sums — never a
    mean of per-doc floats, which would be merge-order noise). Only the
    cross-source normalizer is order-sensitive, so the weight is
    FLOAT-truncated. This is the knob that turns corpus curation into
    an epoch sampling plan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_remove(F.split("text", " "), "")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.array_distinct(toks))).cast("long").alias("sum_unique"),
        F.sum(F.size(toks)).cast("long").alias("sum_tokens"),
    )
    q = per_source.select(
        "source",
        "n_docs",
        (F.col("sum_unique").cast("double") / F.col("sum_tokens")).alias("quality"),
    )
    qq = F.col("quality") * F.col("quality")
    return (
        q.withColumn(
            "mix_weight",
            (qq / F.sum(qq).over(Window.partitionBy())).cast("float"),
        )
        .orderBy("source")
    )


PROFILE_TOP_K = 20


@register(
    "text_char_ngram_langid",
    oracle=f"""
WITH tri AS (
  SELECT doc_id, lang,
         UNNEST(list_distinct(list_transform(
           generate_series(1, length(text) - 2),
           i -> substring(text, i, 3)))) AS g
  FROM documents
),
profile AS (
  SELECT lang AS plang, g FROM (
    SELECT lang, g, COUNT(*) AS n,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rk
    FROM tri GROUP BY lang, g
  ) WHERE rk <= {PROFILE_TOP_K}
),
overlap AS (
  SELECT t.doc_id, t.lang, p.plang, COUNT(*) AS n_hits
  FROM tri t JOIN profile p ON t.g = p.g
  GROUP BY t.doc_id, t.lang, p.plang
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY n_hits DESC, plang) AS rn
  FROM overlap
)
SELECT doc_id, lang AS labeled_lang, plang AS predicted_lang, n_hits,
       CASE WHEN lang = plang THEN 1 ELSE 0 END AS correct
FROM best WHERE rn = 1
ORDER BY doc_id
""",
    tags=("text", "langid", "char-ngram"),
)
def text_char_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID, the textcat/fastText-style
    classifier shape: per-language top-20 trigram profiles from the
    corpus (deterministic count-desc cut), then each doc votes for the
    profile it overlaps most. Two corpus aggregations plus a broadcast
    of the 100-row profile back over exploded trigrams — the train-
    then-score loop entirely in one declarative plan; argmax breaks
    ties on (hits desc, lang) so predictions are shuffle-stable."""
    from boltzmannclean_spark.pipeline import language_id

    return language_id(
        load_table(spark, sf_dir, "documents"), profile_top_k=PROFILE_TOP_K
    )


@register(
    "sample_train_test_split",
    oracle="""
WITH b AS (
  SELECT lang, n_chars,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM b
GROUP BY 1
ORDER BY split
""",
    tags=("sample", "split", "curation"),
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-free key
    hash — the standard way to split a training corpus so membership is
    (a) reproducible across runs and engines, (b) stable under corpus
    growth (a doc's split never changes when other docs arrive), and
    (c) computable row-local with no shuffle before the final tiny
    aggregation. The bucket is the first 16 bits of md5(doc_id) mod 100
    — portable arithmetic both engines evaluate identically (Spark
    `conv(hex,16,10)` ≡ DuckDB `('0x'||hex)::BIGINT`)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    return (
        docs.select(
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
            "lang",
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@register(
    "sample_exact_split",
    oracle="""
WITH keyed AS (
  SELECT doc_id, md5(doc_id::VARCHAR) AS key FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed),
r AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) AS BIGINT) AS grank
  FROM keyed
)
SELECT CASE WHEN grank * 100 <= 80 * n.n THEN 'train'
            WHEN grank * 100 <= 90 * n.n THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM r, n
GROUP BY 1
ORDER BY split
""",
    tags=("sample", "split", "curation", "exact"),
)
def sample_exact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 80/10/10 split — exactly floor(0.8·N) / floor(0.9·N)−
    floor(0.8·N) / rest rows, not the ±binomial-noise proportions of
    the hash-bucket split (sample_train_test_split) — computed
    reservoir-free and WITHOUT a global sort (r13 verdict #7's
    "exact distributed shuffle split" slot). The exact split is what
    a train/eval pipeline needs when the eval set is billed per row
    or a paper pins |eval| precisely; a full orderBy over the corpus
    is the naive way and is exactly what doesn't scale.

    Plan: (1) shuffle key = md5(doc_id) — a deterministic, content-
    free permutation of the corpus; (2) bucket = first byte of the
    key (256 buckets, md5-uniform); per-bucket counts → 256-row
    cumulative-offset table (the ONLY single-partition window, over
    256 domain-sized rows); (3) exact global rank = bucket offset +
    row_number within bucket (window partitioned BY BUCKET — 256-way
    parallel, ~N/256 rows each, no global order); (4) split by pure
    integer compare rank·100 ≤ 80·N (≡ rank ≤ floor(0.8·N), no
    floats anywhere). Membership — not just sizes — is pinned by the
    oracle: per-split sum/min/max of doc_id must match DuckDB's
    ROW_NUMBER() over the same (key, doc_id) total order. At 100 TB
    the bucket byte widens to 2-3 bytes (65k+ buckets) and the
    offset table stays driver-free and broadcast-sized."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("key")
    ).withColumn(
        "bucket", F.conv(F.substring("key", 1, 2), 16, 10).cast("long")
    )
    bcnt = keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bcnt.select(
        "bucket",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0))
        .cast("long")
        .alias("cum_prev"),
    )
    total = keyed.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_in = Window.partitionBy("bucket").orderBy("key", "doc_id")
    ranked = (
        keyed.withColumn("r", F.row_number().over(w_in).cast("long"))
        .join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.col("cum_prev") + F.col("r")).alias("grank"),
            "n",
        )
    )
    return (
        ranked.select(
            "doc_id",
            F.when(F.col("grank") * 100 <= 80 * F.col("n"), "train")
            .when(F.col("grank") * 100 <= 90 * F.col("n"), "val")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("split")
    )


N_NEGATIVES = 4  # negatives drawn per anchor document


@register(
    "pairs_negative_sampling",
    oracle=f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
anchors AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 10 = 0),
draws AS (
  SELECT anchor_id, k,
         ('0x' || substring(md5(anchor_id::VARCHAR || ':' || k::VARCHAR), 1, 12))::BIGINT
           % n.n_docs AS neg_id
  FROM anchors
  CROSS JOIN (SELECT CAST(UNNEST(range(0, {N_NEGATIVES})) AS INTEGER) AS k)
  CROSS JOIN n
)
SELECT d.anchor_id, d.k, d.neg_id, doc.lang AS neg_lang, doc.n_chars AS neg_n_chars
FROM draws d JOIN documents doc ON doc.doc_id = d.neg_id
WHERE d.neg_id <> d.anchor_id
ORDER BY anchor_id, k
""",
    tags=("curation", "contrastive", "sampling"),
)
def pairs_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    every anchor document draws N_NEGATIVES pseudo-random negatives via
    a hash ring — neg_id = md5(anchor:k) mod corpus size — then joins
    the negatives' metadata. Accidental self-pairs are dropped (the
    standard cheap fix; a re-roll would also be deterministic but costs
    a second pass for a ~1/N event).

    Scale shape: the corpus size is a 1-row broadcast (no driver
    collect); the k-fan-out is an executor-side explode of anchor rows
    only; the negatives lookup is a plain equi-join on doc_id, which at
    100 TB rides whatever bucketing the documents table already has.
    Works because doc_id is dense 0..N-1 (asserted by the join itself:
    a sparse id space would silently drop draws — the row count oracle
    would catch it)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    draws = (
        anchors.crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "n_docs",
            F.explode(F.array(*[F.lit(k) for k in range(N_NEGATIVES)])).alias("k"),
        )
        .select(
            "anchor_id",
            "k",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("anchor_id").cast("string"),
                                F.lit(":"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_docs"),
            ).alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    neg = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("lang").alias("neg_lang"),
        F.col("n_chars").alias("neg_n_chars"),
    )
    return draws.join(neg, "neg_id").select(
        "anchor_id", "k", "neg_id", "neg_lang", "neg_n_chars"
    ).orderBy("anchor_id", "k")


@register(
    "sample_weighted_bernoulli",
    oracle="""
WITH m AS (SELECT MAX(n_chars) AS mx FROM documents),
d AS (
  SELECT lang, n_chars,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 6))::BIGINT AS h24
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM d CROSS JOIN m
WHERE h24 * m.mx * 4 < n_chars * 16777216
GROUP BY lang
ORDER BY lang
""",
    tags=("sample", "weighted", "curation"),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional (Poisson/Bernoulli) sampling with inclusion
    probability p_i = n_chars_i / (4·max_chars) — the length-weighted
    draw a token-budget curation pass uses, made reproducible and
    engine-exact: the uniform is the first 24 bits of md5(doc_id), the
    comparison is pure int64 arithmetic (no floats, no RNG state), so
    membership is identical at any parallelism and in both engines.
    Overflow headroom (the round-4 advisor caught a 48-bit hash
    overflowing at n_chars ≥ 8192): h24 ≤ 2^24, so the left product is
    ≤ 2^26·max_chars and the right is n_chars·2^24 — both stay below
    2^63 for any n_chars up to ~10¹¹, far beyond real documents, and
    Spark's non-ANSI silent wrap can never flip membership. The 2^-24
    probability granularity is noise at corpus scale. Row-local until
    the tiny per-lang aggregation; the max weight is a 1-row
    broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.agg(F.max("n_chars").alias("mx"))
    h24 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    return (
        docs.crossJoin(F.broadcast(m))
        .where(h24 * F.col("mx") * 4 < F.col("n_chars") * F.lit(16777216))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("lang")
    )


DSIR_BUCKETS = 64
DSIR_TOP = 50


@register(
    "curation_dsir_importance",
    oracle=f"""
WITH toks AS (
  SELECT d.doc_id, d.lang, t.tok
  FROM documents d,
       UNNEST(string_split(lower(d.text), ' ')) AS t(tok)
  WHERE t.tok <> ''
),
bucketed AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(tok), 1, 6))::BIGINT % {DSIR_BUCKETS} AS b,
         COUNT(*) AS c
  FROM toks GROUP BY doc_id, lang, b
),
raw_b AS (SELECT b, CAST(SUM(c) AS BIGINT) AS raw_c FROM bucketed GROUP BY b),
tgt_b AS (SELECT b, CAST(SUM(c) AS BIGINT) AS tgt_c
          FROM bucketed WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT (SELECT SUM(raw_c) FROM raw_b) AS raw_total,
         (SELECT SUM(tgt_c) FROM tgt_b) AS tgt_total
),
w AS (
  SELECT raw_b.b,
         COALESCE(tgt_b.tgt_c, 0) * tot.raw_total
           - raw_b.raw_c * tot.tgt_total AS wt
  FROM raw_b LEFT JOIN tgt_b ON raw_b.b = tgt_b.b CROSS JOIN tot
)
SELECT doc_id, ANY_VALUE(lang) AS lang,
       CAST(CAST(SUM(c * wt) AS DECIMAL(38,0)) AS BIGINT) AS importance
FROM bucketed JOIN w ON bucketed.b = w.b
GROUP BY doc_id
ORDER BY importance DESC, doc_id
LIMIT {DSIR_TOP}
""",
    tags=("curation", "dsir", "importance", "text"),
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-selection importance scoring in the DSIR family (Xie et al.
    2023: importance resampling over hashed n-gram features): every doc
    gets a score from {DSIR_BUCKETS}-bucket hashed unigram counts,
    weighted by how much each bucket is over-represented in a TARGET
    domain (here lang='en') vs the raw corpus — the top-scoring docs
    are the ones to up-sample when fitting a target-domain mixture.
    DSIR's log-likelihood-ratio weights are replaced by the integer
    surrogate w_b = tgt_b·raw_total − raw_b·tgt_total (same sign and
    ordering intent, but EXACT: no transcendental whose last-bit
    rounding differs across engines), and the per-doc score Σ c_b·w_b
    accumulates in DECIMAL(38,0), matching DuckDB's HUGEINT promotion.
    Scale: tokenize+hash is a row-local projection; per-doc-bucket
    counts are one aggregation; the weight table is {DSIR_BUCKETS} rows
    broadcast back; top-{DSIR_TOP} is TakeOrdered, never a global sort.
    The doc_id tiebreak makes the cut deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    bucketed = toks.groupBy(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    raw_b = bucketed.groupBy("b").agg(F.sum("c").alias("raw_c"))
    tgt_b = (
        bucketed.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("c").alias("tgt_c"))
    )
    tot = raw_b.agg(F.sum("raw_c").alias("raw_total")).crossJoin(
        tgt_b.agg(F.sum("tgt_c").alias("tgt_total"))
    )
    w = (
        raw_b.join(tgt_b, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.coalesce(F.col("tgt_c"), F.lit(0)) * F.col("raw_total")
                - F.col("raw_c") * F.col("tgt_total")
            ).alias("wt"),
        )
    )
    return (
        bucketed.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum((F.col("c") * F.col("wt")).cast("decimal(38,0)"))
            .cast("long")
            .alias("importance"),
        )
        .orderBy(F.desc("importance"), "doc_id")
        .limit(DSIR_TOP)
    )


HEAPS_BUCKET = 50


@register(
    "text_heaps_law",
    oracle=f"""
WITH toks AS (
  SELECT d.doc_id, t.tok
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
firsts AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_toks,
         (SELECT COUNT(*) FROM firsts WHERE first_doc = toks.doc_id)
           AS n_new_types
  FROM toks GROUP BY doc_id
),
cum AS (
  SELECT (doc_id // {HEAPS_BUCKET}) AS bucket,
         SUM(n_toks) AS toks_in_bucket,
         SUM(n_new_types) AS new_types_in_bucket
  FROM per_doc GROUP BY 1
)
SELECT bucket,
       CAST(SUM(toks_in_bucket) OVER w AS BIGINT) AS tokens_seen,
       CAST(SUM(new_types_in_bucket) OVER w AS BIGINT) AS vocab_size
FROM cum
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
ORDER BY bucket
""",
    tags=("text", "heaps", "vocabulary", "corpus-stats"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve — (tokens seen, distinct types
    seen) sampled every {HEAPS_BUCKET} docs in doc_id order: the curve a
    corpus build watches to decide whether more crawl still buys new
    vocabulary (V ≈ K·nᵝ; a flattening curve means dedup/filtering
    should tighten instead). "Running distinct" never materializes a
    per-prefix state: each type is attributed to its FIRST document
    (one groupBy), per-doc new-type counts aggregate per bucket, and a
    cumulative window over the BUCKET table (corpus/{HEAPS_BUCKET}
    rows — bounded, same argument as relational_skyline) yields the
    curve. Pure integer counting, bit-exact in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc_toks = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    per_doc_new = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new_types")
    )
    cum = (
        per_doc_toks.join(per_doc_new, "doc_id", "left")
        .groupBy(F.expr(f"doc_id div {HEAPS_BUCKET}").alias("bucket"))
        .agg(
            F.sum("n_toks").alias("toks_in_bucket"),
            F.sum(F.coalesce("n_new_types", F.lit(0))).alias(
                "new_types_in_bucket"
            ),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cum.select(
        "bucket",
        F.sum("toks_in_bucket").over(w).alias("tokens_seen"),
        F.sum("new_types_in_bucket").over(w).alias("vocab_size"),
    ).orderBy("bucket")


MIX_BUDGET_TOKENS = 50_000
MIX_CAP_PCT = 30  # no language may exceed 30% of the budget
MIN_QUALITY_TOKENS = 15


@register(
    "pipeline_pretraining_mix",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, text, md5(text) AS h,
         LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks
  FROM documents
),
kept AS (
  SELECT t.doc_id, t.lang, t.n_toks
  FROM toks t
  JOIN (SELECT h, MIN(doc_id) AS keep FROM toks GROUP BY h) d
    ON t.h = d.h AND t.doc_id = d.keep
  WHERE t.n_toks >= {MIN_QUALITY_TOKENS}
),
per_lang AS (
  SELECT lang, COUNT(*) AS n_docs_kept,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens_kept
  FROM kept GROUP BY lang
),
tot AS (SELECT CAST(SUM(n_tokens_kept) AS BIGINT) AS t FROM per_lang),
prop AS (
  SELECT lang, n_docs_kept, n_tokens_kept,
         {MIX_BUDGET_TOKENS} * n_tokens_kept // tot.t AS p
  FROM per_lang CROSS JOIN tot
),
capped AS (
  SELECT *, (p > {MIX_BUDGET_TOKENS * MIX_CAP_PCT} // 100) AS is_capped
  FROM prop
),
pools AS (
  SELECT
    CAST(COALESCE(SUM(CASE WHEN is_capped
        THEN p - {MIX_BUDGET_TOKENS * MIX_CAP_PCT} // 100 END), 0) AS BIGINT)
      AS excess,
    CAST(COALESCE(SUM(CASE WHEN NOT is_capped THEN p END), 0) AS BIGINT)
      AS uncapped_p
  FROM capped
)
SELECT lang, n_docs_kept, n_tokens_kept,
       CAST(CASE WHEN is_capped THEN {MIX_BUDGET_TOKENS * MIX_CAP_PCT} // 100
            ELSE p + (pools.excess * p // NULLIF(pools.uncapped_p, 0))
            END AS BIGINT) AS alloc_tokens,
       is_capped
FROM capped CROSS JOIN pools
ORDER BY lang
""",
    tags=("curation", "pipeline", "mixture", "llm"),
)
def pipeline_pretraining_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-mix planning — the composed curation run
    a data team executes before a training job: (1) drop low-quality
    docs (< {MIN_QUALITY_TOKENS} tokens), (2) keep only exact-dedup
    representatives (min doc_id per md5(text)), (3) count surviving
    tokens per language, (4) allocate a {MIX_BUDGET_TOKENS}-token
    budget proportionally with a {MIX_CAP_PCT}% per-language cap and
    ONE round of redistributing the capped excess to uncapped
    languages pro-rata (documented as one round, not a fixpoint — at
    most one extra language can newly exceed the cap per round, and
    the plan's reader should see the allocation rule, not iterate it).
    Every stage is the registered standalone operator's logic; the
    composition is the point — one declarative plan, three
    aggregations, all integer arithmetic, bit-exact vs the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("n_toks"),
    )
    keep = toks.groupBy("h").agg(F.min("doc_id").alias("keep"))
    kept = toks.join(
        keep,
        (toks.h == keep.h) & (toks.doc_id == keep.keep),
    ).where(F.col("n_toks") >= MIN_QUALITY_TOKENS)
    per_lang = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_toks").alias("n_tokens_kept"),
    )
    tot = per_lang.agg(F.sum("n_tokens_kept").alias("t"))
    cap = MIX_BUDGET_TOKENS * MIX_CAP_PCT // 100
    prop = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs_kept",
        "n_tokens_kept",
        F.expr(f"{MIX_BUDGET_TOKENS} * n_tokens_kept div t").alias("p"),
    )
    capped = prop.withColumn("is_capped", F.col("p") > cap)
    pools = capped.agg(
        F.coalesce(
            F.sum(F.when(F.col("is_capped"), F.col("p") - cap)), F.lit(0)
        ).alias("excess"),
        F.coalesce(
            F.sum(F.when(~F.col("is_capped"), F.col("p"))), F.lit(0)
        ).alias("uncapped_p"),
    )
    return (
        capped.crossJoin(F.broadcast(pools))
        .select(
            "lang",
            "n_docs_kept",
            "n_tokens_kept",
            F.when(F.col("is_capped"), F.lit(cap))
            .otherwise(
                F.col("p")
                + F.expr("excess * p div nullif(uncapped_p, 0)")
            )
            .cast("long")
            .alias("alloc_tokens"),
            "is_capped",
        )
        .orderBy("lang")
    )


TOP_TERMS = 50  # inverted-index output rows (highest-df terms)
POSTING_SAMPLE = 5  # leading doc ids kept per term in the index sample


@register(
    "text_inverted_index",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) x
  GROUP BY doc_id, tok
),
idx AS (
  SELECT tok,
         COUNT(*) AS df,
         CAST(SUM(tf) AS BIGINT) AS cf,
         array_to_string(list_sort(list(doc_id))[1:{POSTING_SAMPLE}], ',')
           AS posting_head
  FROM tf GROUP BY tok
)
SELECT tok, df, cf, posting_head
FROM idx
ORDER BY df DESC, tok
LIMIT {TOP_TERMS}
""",
    tags=("text", "index", "search"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency, corpus
    frequency, and the head of the sorted posting list — the core
    structure behind keyword search / decontamination lookups over a
    training corpus. Token explode is per-doc inline (no shuffle); then
    ONE aggregation keyed on (doc_id, tok) and one on tok — partial
    (map-side) combines keep the shuffle at distinct-term volume, not
    token volume. Posting lists are the scale hazard (a stopword's list
    is corpus-sized), so the registered output keeps only a bounded
    {POSTING_SAMPLE}-id head per term via slice(sort_array(collect_list))
    — collect_list on full postings would OOM a 100 TB executor; a
    production index would instead sink (tok, doc_id) sorted+bucketed by
    tok, which is exactly the first aggregation's shuffle. Output is the
    {TOP_TERMS} highest-df terms; posting head rendered as CSV (atomic
    columns only, per the driver's canonicalizer)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTING_SAMPLE),
                ",",
            ).alias("posting_head"),
        )
        .orderBy(F.desc("df"), "tok")
        .limit(TOP_TERMS)
    )


BM25_QUERY = ("spark", "join", "window")  # fixed keyword query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


@register(
    "text_bm25_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
dl AS (SELECT doc_id, LEN(toks) AS dl FROM toks),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM toks) x
  WHERE tok IN ('spark', 'join', 'window')
  GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * ({BM25_K1} + 1.0))
         / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
            + {BM25_B} * dl.dl * stats.n_docs / stats.total_len)) AS c
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN tok = 'join' THEN c END), 0.0)
              + COALESCE(SUM(CASE WHEN tok = 'spark' THEN c END), 0.0)
              + COALESCE(SUM(CASE WHEN tok = 'window' THEN c END), 0.0)
              AS FLOAT) AS bm25,
         COUNT(*) AS n_terms_hit
  FROM contrib
  GROUP BY doc_id
)
SELECT doc_id, bm25, n_terms_hit
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
""",
    tags=("text", "bm25", "search"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (k1={BM25_K1}, b={BM25_B}) for a fixed query
    over the corpus: top-{BM25_TOPK} docs by Robertson/Sparck-Jones
    score. The term filter lands BEFORE the tf aggregation, so only
    query-term postings ever shuffle (at 100 TB: |query| × df rows, not
    the corpus); df and the corpus stats are 1-row/tiny broadcasts.
    Determinism: tf/df/dl/N are exact ints, so every engine evaluates
    the identical IEEE expression tree per (doc, term); the per-doc
    combination is NOT a float SUM (merge order would differ between
    engines) but per-term conditional sums — each over at most ONE
    element — added in fixed lexical term order, identically in the
    oracle. The `ln` itself is the one op where JVM Math.log and libm
    may differ by 1 ulp, so the score is FLOAT-cast (the repo's
    transcendental convention, see func_math_transcendental) before
    ordering and output — both engines then rank and hash the identical
    value. Ties broken by doc_id. avg-doclen is folded as
    dl·N/total_len to keep one division."""
    from boltzmannclean_spark.pipeline import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        BM25_QUERY,
        k1=BM25_K1,
        b=BM25_B,
        k=BM25_TOPK,
    )


# GPT-2-style pre-tokenizer, restricted to syntax Java regex and RE2
# interpret identically (no lookahead/lookbehind, no unicode classes):
# a token is an optionally space-prefixed letter run, digit run, or
# punctuation run, or a residual space run.
BPE_SPLIT_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


@register(
    "text_bpe_regex_tokens",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{BPE_SPLIT_RE}') AS toks,
         n_chars
  FROM documents
)
SELECT doc_id,
       LEN(toks) AS n_bpe_tokens,
       LEN(list_filter(toks, x -> regexp_matches(x, '^ ?[a-z]')))
         AS n_word_tokens,
       LEN(list_filter(toks, x -> regexp_matches(x, '^ ?[0-9]')))
         AS n_num_tokens,
       CAST(CEIL(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS chars4_estimate
FROM t
ORDER BY doc_id
""",
    tags=("text", "tokens", "bpe"),
)
def text_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization (the GPT-2 pre-tokenizer shape:
    space-prefixed letter/digit/punctuation runs) via one
    ``regexp_extract_all`` per document — the realistic token counter
    for training-budget accounting, next to ``text_token_stats``'s
    chars/4 heuristic (emitted alongside for calibration). The regex is
    deliberately limited to syntax Java regex (Spark) and RE2 (DuckDB)
    interpret identically — no lookahead, which real GPT-2 contraction
    rules use and RE2 rejects. Per-row array ops only; zero shuffle
    before the output sort; linear in corpus bytes at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), F.lit(0))
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_bpe_tokens"),
            F.size(
                F.filter(toks, lambda x: x.rlike("^ ?[a-z]"))
            ).alias("n_word_tokens"),
            F.size(
                F.filter(toks, lambda x: x.rlike("^ ?[0-9]"))
            ).alias("n_num_tokens"),
            F.ceil(F.col("n_chars").cast("double") / 4).alias(
                "chars4_estimate"
            ),
        )
        .orderBy("doc_id")
    )


ZIPF_TOP = 100  # highest-frequency terms emitted


@register(
    "text_zipf_rank",
    oracle=f"""
WITH tf AS (
  SELECT tok, COUNT(*) AS cnt
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) x
  GROUP BY tok
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM tf),
ranked AS (
  SELECT tok, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM tf
)
SELECT rank, tok, cnt,
       CAST(SUM(cnt) OVER (ORDER BY rank
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
       tot.total_tokens
FROM ranked CROSS JOIN tot
WHERE rank <= {ZIPF_TOP}
ORDER BY rank
""",
    tags=("text", "zipf", "frequency"),
)
def text_zipf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf frequency-rank curve: the top-{ZIPF_TOP} terms with rank,
    count, cumulative count and the corpus total — the companion
    diagnostic to ``text_heaps_law`` (rank-frequency tail shape decides
    vocabulary truncation and stopword cutoffs for a tokenizer build).
    One term aggregation (shuffle = distinct-term volume); the ranking
    window runs over the aggregated TERM table, not corpus rows, and
    the top-{ZIPF_TOP} slice bounds both the window's driver-side cost
    and the output. Integer counts only — no float anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = tf.agg(F.sum("cnt").alias("total_tokens"))
    w = Window.orderBy(F.desc("cnt"), "tok")
    ranked = tf.select(
        "tok", "cnt", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= ZIPF_TOP)
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.withColumn("cum_cnt", F.sum("cnt").over(wc))
        .crossJoin(F.broadcast(tot))
        .select("rank", "tok", "cnt", "cum_cnt", "total_tokens")
        .orderBy("rank")
    )


@register(
    "text_langid_confusion",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(LEN(LIST_FILTER(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
           / LEN(toks) AS r
  FROM t
)
SELECT lang AS labeled_lang,
       CASE WHEN r >= 0.05 THEN 'en' ELSE 'und' END AS guessed_lang,
       COUNT(*) AS n_docs
FROM m
GROUP BY labeled_lang, guessed_lang
ORDER BY labeled_lang, guessed_lang
""",
    tags=("text", "langid", "evaluation"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the marker-ratio classifier from
    ``text_langid`` aggregated against the labeled language — the
    eval-harness view (per-class precision/recall read straight off the
    cells) that decides whether a cheap classifier is good enough to
    gate a 100 TB ingest. Per-doc featurize+classify is row-local; the
    only shuffle carries (label, guess) pairs into a ≤|langs|² cell
    aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    r = F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast(
        "double"
    ) / F.size(toks)
    guessed = F.when(r >= 0.05, "en").otherwise("und")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            guessed.alias("guessed_lang"),
        )
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "guessed_lang")
    )


@register(
    "text_ngram_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         substring(md5(doc_id::VARCHAR), 1, 1) < '8' AS is_train,
         string_split(text, ' ') AS tk
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, lang, is_train,
         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 3
),
train_set AS (SELECT DISTINCT sh FROM grams WHERE is_train),
test_grams AS (
  SELECT DISTINCT lang, sh FROM grams WHERE NOT is_train
)
SELECT t.lang,
       COUNT(*) AS n_test_trigrams,
       CAST(SUM(CASE WHEN tr.sh IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN tr.sh IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty_rate
FROM test_grams t LEFT JOIN train_set tr ON t.sh = tr.sh
GROUP BY t.lang
ORDER BY t.lang
""",
    tags=("text", "novelty", "memorization", "eval"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty: what fraction of the test split's
    distinct trigrams never appear in the train split — the cheap
    memorization/contamination screen run before trusting an eval set
    (a novelty rate near 0 means the "held-out" data is a paraphrase
    of training data; near 1 means distribution shift). Split
    assignment is hash-deterministic (md5 first hex digit, ~50/50, the
    same whole-doc rule both engines). Trigrams are row-local array
    transforms (no shuffle until the distincts); the train set is
    distinct shingles only (shingle-vocabulary-sized, NOT corpus-
    sized) and the membership test is a LEFT JOIN on the shingle — at
    100 TB that join is the standard big-dedup equi-join on a
    fixed-width key, with AQE free to broadcast the smaller side. The
    per-lang rate divides two exact counts."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            "lang",
            (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
            ).alias("is_train"),
            F.split("text", " ").alias("tk"),
        )
        .where(F.size("tk") >= 3)
        .select(
            "doc_id",
            "lang",
            "is_train",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 3),"
                    " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"
                )
            ).alias("sh"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    train_set = (
        grams.where(F.col("is_train")).select("sh").distinct()
        .withColumn("seen", F.lit(1))
    )
    test_grams = (
        grams.where(~F.col("is_train")).select("lang", "sh").distinct()
    )
    joined = test_grams.join(train_set, "sh", "left")
    novel = F.when(F.col("seen").isNull(), 1).otherwise(0)
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test_trigrams"),
            F.sum(novel).cast("long").alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1))).alias(
                "novelty_rate"
            ),
        )
        .orderBy("lang")
    )


_ENT_CHARS = "abcdefghijklmnopqrstuvwxyz "


def _entropy_sql_duck() -> str:
    cnts = [
        f"(length(text) - length(replace(text, '{c}', '')))"
        for c in _ENT_CHARS.replace("'", "''")
    ]
    tot = " + ".join(cnts)
    terms = " + ".join(
        f"(CASE WHEN {c} > 0 THEN -({c} / CAST(tot AS DOUBLE))"
        f" * ln({c} / CAST(tot AS DOUBLE)) ELSE 0.0 END)"
        for c in cnts
    )
    return tot, terms


@register(
    "text_char_entropy",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, text,
         {_entropy_sql_duck()[0]} AS tot
  FROM documents
)
SELECT doc_id, lang,
       CAST(tot AS BIGINT) AS n_counted_chars,
       CAST({_entropy_sql_duck()[1]} AS FLOAT) AS char_entropy
FROM t
WHERE tot > 0
ORDER BY doc_id
""",
    tags=("text", "quality", "entropy", "row-local"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy — the gibberish /
    mojibake / base64-blob detector (natural prose sits near ~2.8-3.1
    nats over [a-z ]; encoded junk approaches the 3.3-nat uniform
    ceiling, repeated-char spam near 0). Entirely ROW-LOCAL: the 27
    per-char counts come from length-after-replace (no explode, no
    shuffle — the 100 TB quality-scoring posture), and the entropy sum
    iterates the FIXED char domain in the same literal order in both
    engines, so even the float accumulation is order-identical;
    the single ln() call per term is the libm 1-ulp case, handled by
    the FLOAT cast (func_math_transcendental rule)."""
    docs = load_table(spark, sf_dir, "documents")
    cnts = [
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(c), F.lit("")))
        ).alias(f"c_{i}")
        for i, c in enumerate(_ENT_CHARS)
    ]
    t = docs.select("doc_id", "lang", *cnts)
    tot = None
    for i in range(len(_ENT_CHARS)):
        col = F.col(f"c_{i}")
        tot = col if tot is None else tot + col
    t = t.withColumn("tot", tot).where(F.col("tot") > 0)
    ent = None
    for i in range(len(_ENT_CHARS)):
        c = F.col(f"c_{i}")
        p = c / F.col("tot").cast("double")
        term = F.when(c > 0, -p * F.log(p)).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    return (
        t.select(
            "doc_id",
            "lang",
            F.col("tot").cast("long").alias("n_counted_chars"),
            ent.cast("float").alias("char_entropy"),
        )
        .orderBy("doc_id")
    )


BPE_ROUNDS = 8


def _bpe_ctes(rounds: int) -> str:
    """The shared unrolled CTE prefix (words → w0 → p/b/w per round,
    ending at w{rounds}) used by BOTH the learn oracle (reads the b{r}
    merge rows) and the encode oracle (reads the final w{rounds}
    segmentation). Data-dependent iteration cannot be a recursive CTE
    (each round re-tokenizes with the merge just learned), so the
    rounds unroll."""
    parts = [
        """
WITH words AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE len(w) > 0
  GROUP BY w
),
w0 AS (
  SELECT word, freq,
         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' </w>' AS seq
  FROM words
)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
p{r} AS (
  SELECT pair, freq FROM (
    SELECT sym || ' ' || LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
             AS pair,
           freq
    FROM (
      SELECT word, freq, UNNEST(string_split(seq, ' ')) AS sym,
             generate_subscripts(string_split(seq, ' '), 1) AS pos
      FROM w{r}
    )
  ) WHERE pair IS NOT NULL
),
b{r} AS (
  SELECT {r} AS round, pair, replace(pair, ' ', '') AS merged,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM p{r} GROUP BY pair
  ORDER BY SUM(freq) DESC, pair ASC LIMIT 1
),
w{r + 1} AS (
  SELECT word, freq,
         trim(replace(
           replace(' ' || replace(seq, ' ', '  ') || ' ',
                   ' ' || replace(b.pair, ' ', '  ') || ' ',
                   ' ' || b.merged || ' '),
           '  ', ' ')) AS seq
  FROM w{r}, b{r} b
)"""
        )
    return "".join(parts)


def _bpe_oracle(rounds: int) -> str:
    """Learn-side oracle: the merge table, one row per round."""
    sel = "\nUNION ALL\n".join(
        f"SELECT round, pair, merged, pair_count FROM b{r}"
        for r in range(rounds)
    )
    return f"{_bpe_ctes(rounds)}\n{sel}\nORDER BY round"


def _bpe_encode_oracle(rounds: int) -> str:
    """Encode-side oracle: re-learn the merges via the shared CTE
    prefix, then tokenize every document against the FINAL word
    segmentation w{rounds}."""
    return f"""{_bpe_ctes(rounds)},
dw AS (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE len(w) > 0
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(string_split(wf.seq, ' '))) AS BIGINT)
         AS n_bpe_tokens
FROM dw JOIN w{rounds} wf USING (word)
GROUP BY dw.doc_id
ORDER BY dw.doc_id
"""


@register(
    "text_bpe_learn_merges",
    oracle=_bpe_oracle(BPE_ROUNDS),
    tags=("text", "tokenizer", "bpe", "iterative"),
)
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_ROUNDS byte-pair-encoding merges from the
    corpus (Sennrich et al. 2016) — tokenizer TRAINING, the step
    upstream of every text_*token* query: per round, count adjacent
    symbol pairs weighted by word frequency, take the most frequent
    (ties broken lexicographically — a total order, so the learned
    merge table is deterministic in any engine at any parallelism),
    fuse that pair everywhere, repeat. Words start as characters plus
    a '</w>' end-of-word marker.

    Scale shape: BPE learning consumes the word-FREQUENCY table, not
    the corpus — one linear wordcount pass reduces 100 TB of text to a
    vocab-sized (≤ millions of rows) state table, and every round is
    then (a) one explode → map-side-combined pair-count aggregate over
    that table, (b) a LIMIT-1 argmax on the aggregated pair counts,
    (c) a broadcast 1-row crossJoin applying the merge. Round state is
    localCheckpoint()ed so lineage stays flat across iterations (the
    graph_label_propagation discipline). The merge application uses a
    separator-doubling rewrite (' a  b ' → ' ab ' on a double-spaced
    sequence, then collapse) so plain non-overlapping replace() —
    identical left-to-right semantics in Spark and DuckDB — implements
    BPE's leftmost-non-overlapping merge exactly; the oracle unrolls
    the same rounds as CTE stages."""
    docs = load_table(spark, sf_dir, "documents")
    bests, _wf = _bpe_learn(docs)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out.orderBy("round")


def _bpe_learn(docs: DataFrame) -> tuple[list[DataFrame], DataFrame]:
    """Run BPE_ROUNDS merge-learning rounds over the corpus word-
    frequency table. Returns (per-round 1-row merge DataFrames, the
    FINAL word segmentation table (word, freq, seq)) — the learn query
    reads the former, the encode query tokenizes against the latter,
    so train and encode share one implementation of the merge rule."""
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wf = words.select(
        "word",
        "freq",
        F.concat(
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            F.lit(" </w>"),
        ).alias("seq"),
    ).localCheckpoint()
    bests = []
    for r in range(BPE_ROUNDS):
        syms = F.split("seq", " ")
        n_pairs = F.greatest(F.size(syms) - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(syms, 1, n_pairs),
            F.slice(syms, 2, n_pairs),
            lambda x, y: F.concat_ws(" ", x, y),
        )
        best = (
            wf.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .select(
                F.lit(r).alias("round"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
                "pair_count",
            )
            .localCheckpoint()
        )
        bests.append(best)
        doubled = F.concat(
            F.lit(" "),
            F.replace(F.col("seq"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        patt = F.concat(
            F.lit(" "),
            F.replace(F.col("pair"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        repl = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        wf = (
            wf.crossJoin(F.broadcast(best.select("pair", "merged")))
            .select(
                "word",
                "freq",
                F.trim(
                    F.replace(
                        F.replace(doubled, patt, repl),
                        F.lit("  "),
                        F.lit(" "),
                    )
                ).alias("seq"),
            )
            .localCheckpoint()
        )
    return bests, wf


@register(
    "text_bpe_encode_tokens",
    oracle=_bpe_encode_oracle(BPE_ROUNDS),
    tags=("text", "tokenizer", "bpe", "encode"),
)
def text_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the learned BPE merges — the serving half
    of the tokenizer lifecycle (text_bpe_learn_merges is training):
    after BPE_ROUNDS merge rounds the word-frequency table's final
    segmentation maps every distinct word to its subword count, and
    per-document token counts are one join away. Output per doc:
    (doc_id, n_words, n_bpe_tokens) — the budget numbers a pretraining
    pipeline actually bills by.

    Scale: the insight is the same as training's — encoding cost is
    VOCAB-shaped, not corpus-shaped. The merge rounds run over the
    word-frequency table (≤ millions of rows at 100 TB), producing a
    word → n_subtokens map that BROADCASTS; the corpus-side pass is
    then one explode + broadcast-join + per-doc sum, linear and
    shuffle-light (one groupBy on doc_id). No per-document merge
    scanning ever happens — a word segments identically everywhere,
    so it is segmented once."""
    docs = load_table(spark, sf_dir, "documents")
    _bests, wf = _bpe_learn(docs)
    vocab = wf.select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("n_sub")
    )
    dw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.length("word") > 0)
    return (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "curation_perplexity_buckets",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
per_doc AS (
  SELECT t.doc_id, t.lang,
         COUNT(*) AS n_tokens,
         CAST(SUM(f.n) AS BIGINT) AS sum_freq
  FROM toks t JOIN freq f ON t.tok = f.tok
  GROUP BY t.doc_id, t.lang
),
scored AS (
  SELECT doc_id, lang, (sum_freq * 1000) // n_tokens AS score_milli
  FROM per_doc
),
bucketed AS (
  SELECT lang, doc_id, score_milli,
         CAST(NTILE(3) OVER (
           PARTITION BY lang ORDER BY score_milli DESC, doc_id
         ) AS INT) AS bucket
  FROM scored
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       MIN(score_milli) AS lo_milli, MAX(score_milli) AS hi_milli
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
""",
    tags=("curation", "quality", "perplexity", "ccnet"),
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    score every document with a corpus language model, then split each
    language into head/middle/tail tertiles — the partition the CCNet
    pipeline uses to keep `head` for pretraining and drop or downweight
    `tail`. The LM here is the corpus unigram table itself and the
    per-doc score is mean token frequency in exact integer milli-units
    (``sum_freq*1000 div n_tokens``) rather than a float perplexity:
    the RANKING is order-isomorphic to unigram log-perplexity's
    dominant term, and integer scores make the tertile boundaries
    bit-reproducible across engines — no float-tie drift at the ntile
    cut (the func_math_transcendental rule, applied to ordering).

    Scale: one token-explode aggregation builds the Zipf-bounded
    frequency table (broadcasts), one equi-join scores the stream, and
    the ntile is a per-language sort — at 100 TB that sort is the cost
    center, so production swaps ntile for approx quantile boundaries
    (two scans, no global sort) with the same bucket semantics; the
    tertile CONTRACT, which downstream mixers consume, is unchanged.
    Output is the per-(lang, bucket) census with boundary scores.
    Delegates to the public ``perplexity_buckets`` API (pipeline.py)
    so the oracle continuously verifies the user-facing code path."""
    from boltzmannclean_spark.pipeline import perplexity_buckets

    docs = load_table(spark, sf_dir, "documents")
    bucketed = perplexity_buckets(docs, n_buckets=3)
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_milli").alias("lo_milli"),
            F.max("score_milli").alias("hi_milli"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "text_apriori_cooccur",
    oracle="""
WITH dt AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
  FROM documents
),
ms AS (
  SELECT (11 * CAST(COUNT(DISTINCT doc_id) AS BIGINT) + 19) // 20
           AS minsup
  FROM dt
),
l1 AS (
  SELECT tok FROM dt CROSS JOIN ms
  GROUP BY tok, minsup HAVING COUNT(*) >= minsup
),
dt1 AS (SELECT dt.doc_id, dt.tok FROM dt JOIN l1 USING (tok)),
p AS (
  SELECT a.doc_id, a.tok AS t1, b.tok AS t2
  FROM dt1 a JOIN dt1 b ON a.doc_id = b.doc_id AND a.tok < b.tok
),
l2 AS (
  SELECT t1, t2 FROM p CROSS JOIN ms
  GROUP BY t1, t2, minsup HAVING COUNT(*) >= minsup
),
c3 AS (
  SELECT x.t1, x.t2, y.t2 AS t3
  FROM l2 x
  JOIN l2 y ON x.t1 = y.t1 AND x.t2 < y.t2
  JOIN l2 z ON z.t1 = x.t2 AND z.t2 = y.t2
),
ti AS (
  SELECT p.t1, p.t2, c.tok AS t3
  FROM p
  JOIN dt1 c ON c.doc_id = p.doc_id AND p.t2 < c.tok
  JOIN c3 ON c3.t1 = p.t1 AND c3.t2 = p.t2 AND c3.t3 = c.tok
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS support
FROM ti CROSS JOIN ms
GROUP BY t1, t2, t3, minsup HAVING COUNT(*) >= minsup
ORDER BY t1, t2, t3
""",
    tags=("text", "apriori", "frequent-itemsets", "cooccurrence"),
)
def text_apriori_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent token-triple mining over the document corpus —
    the classic market-basket algorithm applied to text co-occurrence
    (topic signatures, collocation discovery, stop-set detection).
    Monotonicity does the work: frequent singletons L1 prune the token
    stream, frequent pairs L2 prune it again, and candidate triples C3
    exist only when ALL THREE sub-pairs are in L2 (the A-priori join +
    prune), so the expensive triple-instance count runs only over
    candidate-matched rows. The support threshold is RELATIVE (55% of
    distinct docs, computed as an exact integer ceil so both engines
    cut identically) — which also makes the query replication-
    invariant: a verbatim x10 replica scales supports and threshold
    together.

    Scale: (doc, token) dedup is one shuffle; L1/L2/C3 are vocab-sized
    tables that BROADCAST (Zipf: the frequent set is tiny); pair/triple
    instance generation is per-doc and bounded by |L1-tokens in doc|
    choose 2/3 — the candidate join caps the blowup exactly the way
    A-priori is meant to, and hot docs shard across partitions since
    nothing ever groups by doc. Delegates to the public
    ``apriori_triples`` API (pipeline.py)."""
    docs = load_table(spark, sf_dir, "documents")
    from boltzmannclean_spark.pipeline import apriori_triples

    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    return apriori_triples(
        pairs,
        basket_col="doc_id",
        item_col="tok",
        min_support_num=11,
        min_support_den=20,
    )


_RAKE_STOP = "a|the|of|and|to|in|is"


@register(
    "text_rake_keywords",
    oracle=f"""
WITH ph AS (
  SELECT unnest(string_split_regex(
           regexp_replace(lower(text),
             '\\b({_RAKE_STOP})\\b', '|', 'g'), '\\|')) AS phrase
  FROM documents
),
ws AS (
  SELECT list_filter(string_split_regex(trim(phrase), ' +'),
                     x -> x <> '') AS w
  FROM ph
),
expl AS (
  SELECT CAST(len(w) AS BIGINT) AS plen, unnest(w) AS word
  FROM ws WHERE len(w) > 0
),
sc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM expl GROUP BY word
)
SELECT word, freq, degree,
       CAST(1000 * degree // freq AS BIGINT) AS score_milli
FROM sc ORDER BY score_milli DESC, word LIMIT 20
""",
    tags=("text", "keywords", "rake", "cooccurrence"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scoring (Rose et al.) over the document corpus —
    the classic unsupervised keyword extractor: split each document
    into candidate phrases at STOPWORD boundaries, then score every
    word by degree/frequency, where degree(w) = sum over occurrences
    of the containing phrase's length (words co-occurring in long
    phrases pick up connectivity) and freq(w) = occurrence count.
    Content words that appear mostly inside long multi-word phrases
    outrank equally-frequent words that appear alone. Scores emit in
    exact MILLI units via integer floor division — bit-reproducible
    ranking, zero float ops; (freq, degree) ride along for the exact
    rational. Top-20 with ties pinned by word.

    Scale: one projection pass does phrase-split + word-explode as
    JVM array expressions (regexp_replace to mark boundaries, split +
    filter — no UDF); the only shuffle is the map-combined word
    aggregation (vocabulary-sized, Zipf-tiny), and the top-20 is
    TakeOrderedAndProject. The stopword list broadcasts as a literal
    in the regex; a production-sized list compiles the same way."""
    docs = load_table(spark, sf_dir, "documents")
    ph = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(
                    F.lower(F.col("text")),
                    rf"\b({_RAKE_STOP})\b",
                    "|",
                ),
                r"\|",
            )
        ).alias("phrase")
    )
    ws = ph.select(
        F.expr("filter(split(trim(phrase), ' +'), x -> x != '')").alias("w")
    ).where(F.size("w") > 0)
    expl = ws.select(
        F.size("w").cast("long").alias("plen"),
        F.explode("w").alias("word"),
    )
    sc = expl.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("degree"),
    )
    return (
        sc.select(
            "word",
            "freq",
            "degree",
            F.expr("CAST((1000 * degree) div freq AS BIGINT)").alias(
                "score_milli"
            ),
        )
        .orderBy(F.col("score_milli").desc(), "word")
        .limit(20)
    )


@register(
    "curation_filter_attribution",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents
),
m AS (
  SELECT doc_id, n_chars,
         LEN(toks) AS n_tokens,
         CAST(LEN(LIST_FILTER(toks, x -> x IN ('the', 'a', 'of', 'and')))
              AS DOUBLE) / LEN(toks) AS stop_frac,
         CAST(n_chars - LEN(toks) + 1 AS DOUBLE) / LEN(toks) AS mean_word_len
  FROM t
),
flags AS (
  SELECT (n_tokens BETWEEN 30 AND 100000)  AS ok_length,
         (mean_word_len BETWEEN 2 AND 12)  AS ok_word_len,
         (stop_frac >= 0.01)               AS ok_stopwords
  FROM m
),
agg AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN NOT ok_length THEN 1 ELSE 0 END) AS BIGINT) AS f_len,
    CAST(SUM(CASE WHEN NOT ok_word_len THEN 1 ELSE 0 END) AS BIGINT) AS f_wl,
    CAST(SUM(CASE WHEN NOT ok_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS f_sw,
    CAST(SUM(CASE WHEN NOT ok_length AND ok_word_len AND ok_stopwords
             THEN 1 ELSE 0 END) AS BIGINT) AS a_len,
    CAST(SUM(CASE WHEN ok_length AND NOT ok_word_len AND ok_stopwords
             THEN 1 ELSE 0 END) AS BIGINT) AS a_wl,
    CAST(SUM(CASE WHEN ok_length AND ok_word_len AND NOT ok_stopwords
             THEN 1 ELSE 0 END) AS BIGINT) AS a_sw,
    CAST(SUM(CASE WHEN ok_length AND NOT ok_word_len
             THEN 1 ELSE 0 END) AS BIGINT) AS s_wl,
    CAST(SUM(CASE WHEN ok_length AND ok_word_len AND NOT ok_stopwords
             THEN 1 ELSE 0 END) AS BIGINT) AS s_sw,
    CAST(SUM(CASE WHEN ok_length AND ok_word_len AND ok_stopwords
             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
  FROM flags
)
SELECT 'length' AS rule, f_len AS n_fail, a_len AS n_fail_alone,
       f_len AS n_seq_removed, n_docs, n_survivors FROM agg
UNION ALL
SELECT 'word_len', f_wl, a_wl, s_wl, n_docs, n_survivors FROM agg
UNION ALL
SELECT 'stopwords', f_sw, a_sw, s_sw, n_docs, n_survivors FROM agg
ORDER BY rule
""",
    tags=("curation", "quality", "attribution", "funnel"),
)
def curation_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule removal attribution for the Gopher-style quality gate —
    the report a data-curation team reads before touching a threshold:
    for each rule, how many documents fail it AT ALL (n_fail), how many
    it UNIQUELY removes (n_fail_alone — the rule's marginal value: what
    would be lost by dropping the rule), and how many it removes in the
    pipeline's sequential order length→word_len→stopwords
    (n_seq_removed — what the rule is billed for in the funnel; the
    three sequential counts + survivors partition the corpus exactly).
    Same rule definitions as text_quality_filter (text.py:281), so the
    attribution always describes the filter actually shipped.

    Scale: flags come from the one-pass quality_filter plan (pure JVM
    builtins, linear in corpus bytes), then ONE map-combined
    aggregation collapses the corpus to ten counters; the 3-row report
    is a stack() over that single row — nothing but the scan touches
    row-scale data."""
    from boltzmannclean_spark.pipeline import quality_filter

    qf = quality_filter(
        load_table(spark, sf_dir, "documents"),
        stopwords=STOPWORDS,
        n_chars_col="n_chars",
    )
    b = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    ok_l, ok_w, ok_s = (
        F.col("ok_length"),
        F.col("ok_word_len"),
        F.col("ok_stopwords"),
    )
    agg = qf.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        b(~ok_l).alias("f_len"),
        b(~ok_w).alias("f_wl"),
        b(~ok_s).alias("f_sw"),
        b(~ok_l & ok_w & ok_s).alias("a_len"),
        b(ok_l & ~ok_w & ok_s).alias("a_wl"),
        b(ok_l & ok_w & ~ok_s).alias("a_sw"),
        b(ok_l & ~ok_w).alias("s_wl"),
        b(ok_l & ok_w & ~ok_s).alias("s_sw"),
        b(ok_l & ok_w & ok_s).alias("n_survivors"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " 'length',    f_len, a_len, f_len,"
            " 'word_len',  f_wl,  a_wl,  s_wl,"
            " 'stopwords', f_sw,  a_sw,  s_sw)"
            " AS (rule, n_fail, n_fail_alone, n_seq_removed)"
        ),
        "n_docs",
        "n_survivors",
    ).orderBy("rule")


_TR_SCALE = 1_000_000_000
_TR_ITER = 2
_TR_MIN_FREQ = 5
_TR_TOP = 20


def _textrank_oracle() -> str:
    its, prev = [], "r0"
    for i in range(1, _TR_ITER + 1):
        its.append(f"""
c{i} AS (
  SELECT e.w2 AS w, CAST(SUM(({prev}.r * e.wt) // st.s) AS BIGINT)
           AS contrib
  FROM edges e
  JOIN {prev} ON {prev}.w = e.w1
  JOIN strength st ON st.w1 = e.w1
  GROUP BY e.w2
),
r{i} AS (
  SELECT c{i}.w,
         (15 * ({_TR_SCALE} // nn.n) + 85 * c{i}.contrib) // 100 AS r
  FROM c{i} CROSS JOIN nn
)""")
        prev = f"r{i}"
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
vocab AS (
  SELECT tok FROM (SELECT UNNEST(tk) AS tok FROM docs) t
  GROUP BY tok HAVING COUNT(*) >= {_TR_MIN_FREQ}
),
zipped AS (
  SELECT UNNEST(list_zip(tk, tk[2:])) AS z FROM docs
),
big AS (
  SELECT z[1] AS w1, z[2] AS w2
  FROM zipped
  JOIN vocab va ON va.tok = z[1]
  JOIN vocab vb ON vb.tok = z[2]
  WHERE z[1] <> z[2] AND z[2] IS NOT NULL
),
edges AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS wt FROM (
    SELECT w1, w2 FROM big UNION ALL SELECT w2, w1 FROM big
  ) t GROUP BY w1, w2
),
strength AS (
  SELECT w1, CAST(SUM(wt) AS BIGINT) AS s FROM edges GROUP BY w1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM strength),
r0 AS (
  SELECT w1 AS w, CAST({_TR_SCALE} // nn.n AS BIGINT) AS r
  FROM strength CROSS JOIN nn
),{",".join(its)}
SELECT w AS word, r AS rank_micro
FROM {prev}
ORDER BY rank_micro DESC, word
LIMIT {_TR_TOP}
"""


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    tags=("text", "textrank", "keywords", "graph", "pagerank"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau) — the
    graph-centrality companion to RAKE's degree/frequency heuristic: a
    weighted co-occurrence graph over adjacent token pairs (bigram
    window, vocabulary pruned to tokens with >= 5 corpus occurrences),
    ranked by {_TR_ITER} damped power-iteration rounds. The whole walk
    runs in the graph_pagerank_bipartite integer-micro discipline: a
    1e9 rank budget, per-edge contributions (r·w) DIV strength in
    exact bigints, damping mix 15/85 DIV 100 — zero float arithmetic,
    so both engines iterate bit-identically and the top-20 ranking is
    reproducible at any parallelism.

    Scale: bigram extraction is a row-local array transform (no
    positional self-join on the Spark side — the oracle's
    UNNEST-WITH-ORDINALITY join is the same relation); the edge list
    is vocabulary-bounded (Zipf), strength rides on the cached edge
    list, and each iteration is one pass over it with a map-side
    combined aggregation to the destination word — the same
    per-round profile as the pagerank operator, at a 168x smaller
    node domain."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("tk"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= _TR_MIN_FREQ)
        .select("tok")
    )
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk) - 1),"
                    " (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
        .join(F.broadcast(vocab.select(F.col("tok").alias("w1"))), "w1")
        .join(F.broadcast(vocab.select(F.col("tok").alias("w2"))), "w2")
    )
    edges = (
        big.select("w1", "w2")
        .unionAll(big.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
    )
    strength = edges.groupBy("w1").agg(F.sum("wt").cast("long").alias("s"))
    ed = edges.join(strength, "w1").select("w1", "w2", "wt", "s").cache()
    nn = strength.agg(F.count(F.lit(1)).cast("long").alias("n")).localCheckpoint()
    r = strength.crossJoin(F.broadcast(nn)).select(
        F.col("w1").alias("w"), F.expr(f"{_TR_SCALE} div n").alias("r")
    )
    for _ in range(_TR_ITER):
        contrib = (
            ed.join(r, ed.w1 == F.col("w"))
            .groupBy("w2")
            .agg(F.sum(F.expr("(r * wt) div s")).cast("long").alias("contrib"))
        )
        r = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("w2").alias("w"),
            F.expr(f"(15 * ({_TR_SCALE} div n) + 85 * contrib) div 100").alias(
                "r"
            ),
        ).localCheckpoint()
    return (
        r.select(F.col("w").alias("word"), F.col("r").cast("long").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), "word")
        .limit(_TR_TOP)
    )


_PMI_MIN_PAIR = 5


@register(
    "text_collocations_pmi",
    oracle=f"""
WITH src AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
toks AS (
  SELECT doc_id, UNNEST(toks) AS tok, generate_subscripts(toks, 1) AS pos
  FROM src
),
bi AS (
  SELECT doc_id, tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  QUALIFY LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
),
pair_counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM bi GROUP BY w1, w2
),
tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_pairs FROM pair_counts),
left_counts AS (
  SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM pair_counts GROUP BY w1
),
right_counts AS (
  SELECT w2, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM pair_counts GROUP BY w2
),
scored AS (
  SELECT p.w1, p.w2, p.n_ab, l.n_a, r.n_b, t.n_pairs,
         CAST(ln(CAST(p.n_ab AS DOUBLE) * t.n_pairs
                 / (CAST(l.n_a AS DOUBLE) * r.n_b)) AS FLOAT) AS pmi
  FROM pair_counts p
  JOIN left_counts l ON l.w1 = p.w1
  JOIN right_counts r ON r.w2 = p.w2
  CROSS JOIN tot t
  WHERE p.n_ab >= {_PMI_MIN_PAIR}
)
SELECT w1, w2, n_ab, n_a, n_b, n_pairs, pmi
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rk
  FROM scored
) t WHERE rk <= 50
ORDER BY pmi DESC, w1, w2
""",
    tags=("text", "collocation", "pmi", "vocab"),
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the corpus-
    linguistics standard (Church & Hanks 1990) for finding multiword
    units worth merging into a tokenizer vocabulary or phrase table:
    PMI(a,b) = ln(P(ab) / (P(a·)·P(·b))) over adjacent token pairs,
    with a min-count floor ({_PMI_MIN_PAIR}) so rare-pair noise never
    tops the ranking. All counts (pair, left-marginal, right-marginal,
    total) are exact integers; the PMI value is ONE fixed
    ln-of-exact-ratio expression tree per row, FLOAT-cast (the
    libm-absorbing contract), and the top-50 ordering ties break on
    the words, so the readout is bit-reproducible.

    Scale: one window pass per doc for adjacency (the bigram_logprob
    exchange — keyed on doc_id), one map-combined groupBy to the pair
    vocabulary, two marginal aggregations OVER THE PAIR TABLE (already
    vocab²-bounded, never row-scale), one 1-row total broadcast. The
    ranked output is a TakeOrdered over the floored pair table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.array_remove(F.split("text", " "), "")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("w2", F.lead("tok").over(w))
        .where(F.col("w2").isNotNull())
        .select(F.col("tok").alias("w1"), "w2")
    )
    pairs = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    )
    tot = pairs.agg(F.sum("n_ab").cast("long").alias("n_pairs"))
    left = pairs.groupBy("w1").agg(F.sum("n_ab").cast("long").alias("n_a"))
    right = pairs.groupBy("w2").agg(F.sum("n_ab").cast("long").alias("n_b"))
    scored = (
        pairs.where(F.col("n_ab") >= _PMI_MIN_PAIR)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            "n_pairs",
            F.log(
                F.col("n_ab").cast("double")
                * F.col("n_pairs")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            )
            .cast("float")
            .alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


CHUNK_W = 64  # tokens per retrieval chunk
CHUNK_S = 48  # stride (CHUNK_W - CHUNK_S = 16 tokens of overlap)


@register(
    "chunk_sliding_windows",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, CAST(LEN(toks) AS BIGINT) AS n,
         1 + (GREATEST(CAST(LEN(toks) AS BIGINT) - {CHUNK_W}, 0)
              + {CHUNK_S} - 1) // {CHUNK_S} AS n_chunks
  FROM t
),
chunks AS (
  SELECT doc_id, n,
         CAST(i AS BIGINT) AS chunk_idx,
         CAST(i * {CHUNK_S} AS BIGINT) AS start_tok,
         list_slice(toks, i * {CHUNK_S} + 1,
                    LEAST(i * {CHUNK_S} + {CHUNK_W}, n)) AS ctoks
  FROM sized, UNNEST(range(n_chunks)) AS u(i)
)
SELECT doc_id, chunk_idx, start_tok,
       CAST(LEN(ctoks) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(ctoks, ' ')) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_idx
""",
    tags=("curation", "chunking", "rag", "sliding-window"),
)
def chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the RAG/embedding prep
    companion to chunk_pack_tokens (which packs whole docs into
    training chunks; this SPLITS each doc into fixed-size retrieval
    windows): 64-token windows at stride 48, so consecutive chunks
    share 16 tokens and no sentence is lost on a boundary. The chunk
    count is the closed form 1 + ceil(max(n−W, 0)/S) in pure integer
    arithmetic, so chunking is deterministic in any engine at any
    parallelism; chunks surface as (doc_id, chunk_idx, start_tok,
    token count, md5 of the joined window) — the md5 keeps the
    oracle canon content-addressed without hauling full chunk text
    through the comparison, and is exactly the key a downstream
    chunk-level dedup joins on.

    Scale: explode is narrow (no shuffle) — each doc expands to
    ~n/S chunk rows in place, and output size is the corpus token
    count × (W/S) ≈ 1.33× — linear. The only exchange is the output
    sort; drop the orderBy in production and the plan is a single
    scan→project→explode pipeline with full whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.array_remove(F.split("text", " "), "").alias("toks"),
    )
    sized = t.select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("n"),
        F.expr(
            f"1 + (GREATEST(CAST(size(toks) AS BIGINT) - {CHUNK_W}, 0)"
            f" + {CHUNK_S} - 1) div {CHUNK_S}"
        ).alias("n_chunks"),
    )
    chunks = sized.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))
        ).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        (F.col("i") * CHUNK_S).cast("long").alias("start_tok"),
        F.expr(f"slice(toks, i * {CHUNK_S} + 1, {CHUNK_W})").alias("ctoks"),
    )
    return (
        chunks.select(
            "doc_id",
            "chunk_idx",
            "start_tok",
            F.size("ctoks").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join("ctoks", " ")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "text_lexical_diversity",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
tc AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types, n_hapax,
       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
       CAST(n_hapax AS DOUBLE) / n_tokens AS hapax_ratio
FROM per_doc
WHERE n_tokens > 0
ORDER BY doc_id
""",
    tags=("text", "lexical-diversity", "quality", "curation"),
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and
    hapax-legomena ratio — the vocabulary-richness quality signals
    text_quality's length/punct features miss (boilerplate and
    template spam have near-zero hapax ratios at normal length;
    genuine prose sits near the Zipf-predicted band), standard cut
    features in pretraining-corpus filtering. Counts are exact
    integers (tokens, distinct types, count-1 types from one
    (doc, tok) aggregation); the two ratios are one IEEE division
    each over exact operands — bit-equal across engines.

    Scale: one explode → one map-combined (doc_id, tok) groupBy →
    one doc_id rollup; both aggregations share the doc-keyed
    exchange. Output is corpus-sized (one row per doc) — in
    production this is the feature-extraction pass a curation_filter
    consumes, not a human-read report."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.split("text", " "), "")).alias("tok"),
    )
    tc = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    return (
        per_doc.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types").cast("double") / F.col("n_tokens")).alias(
                "ttr"
            ),
            (F.col("n_hapax").cast("double") / F.col("n_tokens")).alias(
                "hapax_ratio"
            ),
        )
        .orderBy("doc_id")
    )


WINNOW_K = 5  # tokens per k-gram
WINNOW_W = 4  # winnowing window (guarantee: any match >= k+w-1 tokens shares a fingerprint)
WINNOW_DF_CAP = 50  # drop fingerprints shared by more docs (boilerplate)
WINNOW_MIN_SHARED = 3  # report pairs sharing at least this many fingerprints


@register(
    "text_winnowing_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, pos,
         substring(md5(
           tok
           || ' ' || LEAD(tok, 1) OVER w
           || ' ' || LEAD(tok, 2) OVER w
           || ' ' || LEAD(tok, 3) OVER w
           || ' ' || LEAD(tok, 4) OVER w), 1, 16) AS h
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(tok, {WINNOW_K - 1}) OVER w IS NOT NULL
),
winmin AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
           AS fp,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM grams
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE rn >= {WINNOW_W}
),
df AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {WINNOW_DF_CAP}
),
kept AS (SELECT f.* FROM fps f JOIN df USING (fp)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared
FROM pairs
WHERE n_shared >= {WINNOW_MIN_SHARED}
ORDER BY doc_a, doc_b
""",
    tags=("text", "winnowing", "fingerprint", "plagiarism", "dedup"),
)
def text_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every 5-token k-gram, keep each 4-window's
    MINIMUM hash, and report doc pairs sharing ≥3 selected
    fingerprints — the PARTIAL-overlap detector the set-level dedup
    family can't express (minhash estimates whole-doc Jaccard;
    winnowing guarantees any shared run of ≥ k+w−1 = 8 tokens leaves
    a shared fingerprint, so paragraph-level copying surfaces even
    between otherwise-different docs). Selection density is 2/(w+1)
    of positions in expectation, so the fingerprint index is ~40% of
    the k-gram count; a DF cap drops boilerplate fingerprints (the
    NGRAM_DF_CAP discipline) before the pair join, bounding candidate
    volume at Θ(shared-fingerprint pairs), never corpus².

    Determinism: md5-prefix hashes and MIN over a fixed ROWS frame
    ordered by the unique (doc, pos) — identical in any engine at any
    parallelism; counts are exact integers.

    Scale: one explode + two doc-keyed windows (one sort serves
    both), a fingerprint-keyed DF aggregation, and the capped
    equi-join. The per-doc windows shard by doc — no global window
    anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", *[F.lead("tok", i).over(w) for i in range(WINNOW_K)]
    )
    grams = (
        toks.select(
            "doc_id",
            "pos",
            F.substring(F.md5(gram), 1, 16).alias("h"),
            F.lead("tok", WINNOW_K - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), Window.currentRow)
    )
    wrn = Window.partitionBy("doc_id").orderBy("pos")
    fps = (
        grams.select(
            "doc_id",
            F.min("h").over(wmin).alias("fp"),
            F.row_number().over(wrn).alias("rn"),
        )
        .where(F.col("rn") >= WINNOW_W)
        .select("doc_id", "fp")
        .distinct()
    )
    df_ok = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= WINNOW_DF_CAP
    )
    kept = fps.join(df_ok.select("fp"), "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )
