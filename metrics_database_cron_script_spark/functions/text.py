"""Text-analysis operators for training-data pipelines.

All hot paths are built-in `pyspark.sql.functions` (JVM-side, codegen'd):
tokenization is `split`+`explode`, ratios are higher-order array functions,
fingerprinting is `xxhash64` + window min. No Python UDFs anywhere here —
at 100 TB these run entirely inside whole-stage codegen, shuffling only for
the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metrics_database_cron_script_spark.operators.partitioning import fan_out

TOKEN_RE = "[^a-z0-9]+"

# Tiny per-language stopword sets for the heuristic language scorer.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "et", "est", "les"],
    "zh": ["de", "shi", "le", "bu"],
}


def tokens_col(text_col: str = "text"):
    """Lower-cased alnum tokens as an array column, empties removed."""
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_RE), lambda t: t != "")


def tokenize(docs: DataFrame) -> DataFrame:
    """doc_id × token exploded rows — the base relation for counts/tf-idf."""
    return fan_out(docs).select("doc_id", F.explode(tokens_col()).alias("token"))


def token_counts(docs: DataFrame) -> DataFrame:
    # Two-level aggregation instead of count_distinct: countDistinct plans
    # as an Expand that DOUBLES the exploded token stream through the first
    # exchange; aggregating (token, doc_id) first combines map-side (a doc
    # repeats its common tokens), then the per-doc rows roll up to term
    # totals + doc frequencies with no expansion. Same result, smaller
    # shuffle — the difference grows with corpus size.
    per_doc = tokenize(docs).groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # count("doc_id") (non-null values), not count(*): a NULL doc_id forms
    # its own group here, but countDistinct — the semantics this two-level
    # form replaces — ignored NULLs in n_docs
    return per_doc.groupBy("token").agg(
        F.sum("__c").alias("n"),
        F.count("doc_id").alias("n_docs"),
    )


def en_stopword_count(toks) -> "F.Column":
    """Count of known-English stopwords in a token array — shared by
    quality_score and gopher_rules so the metric cannot drift between the
    two doc-quality surfaces."""
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"])))


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / word-shape / stopword-ratio quality signals, one codegen'd
    projection per doc — the classic cheap pre-filter before expensive dedup."""
    toks = tokens_col()
    n_words = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    stop = en_stopword_count(toks)
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.when(
            n_words > 0,
            # same integer-exact formulation as gopher_rules: total token
            # chars == length of the concatenation (codegen'd, not an
            # interpreted per-element aggregate)
            F.round(F.length(F.concat_ws("", toks)).cast("double") / n_words, 6),
        ).alias("avg_word_len"),
        F.when(
            F.length("text") > 0,
            F.round(n_alpha.cast("double") / F.length("text"), 6),
        ).alias("alpha_ratio"),
        F.when(n_words > 0, F.round(stop.cast("double") / n_words, 6)).alias(
            "stopword_ratio"
        ),
    )


def token_count_modes(docs: DataFrame) -> DataFrame:
    """Token counting two ways: plain whitespace split, and a BPE-ish regex
    (letter runs / digit runs / single punctuation) — the cheap proxy for
    tokenizer-cost estimation over a corpus."""
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    bpe = F.regexp_count(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: score each language by its stopword hit-ratio,
    pick the argmax (ties → lexicographic, deterministic). Structured as one
    wide projection + `greatest` — no shuffle, no UDF."""
    toks = tokens_col()
    n = F.size(toks)

    def in_set(ws: list[str]):
        # NB: a 2-arg lambda would make Spark pass the array index as arg 2.
        return lambda t: t.isin(*ws)

    scored = docs.select(
        "doc_id",
        "lang",
        n.alias("__n"),
        *[
            F.when(
                n > 0,
                F.size(F.filter(toks, in_set(ws))).cast("double") / n,
            )
            .otherwise(F.lit(0.0))
            .alias(f"score_{lang}")
            for lang, ws in sorted(LANG_STOPWORDS.items())
        ],
    )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        F.round(best, 6).alias("confidence"),
    )


def _winnow_fps(docs: DataFrame, k: int, window: int, hasher) -> DataFrame:
    """Shared winnowing core (Schleimer et al., SIGMOD'03): char k-grams →
    `hasher(gram)` → min over each `window` of consecutive positions →
    distinct fingerprint set per doc. `hasher` is the only thing the
    production (xxhash64) and portable (md5-prefix) variants differ in."""
    grams = fan_out(docs).select(
        "doc_id",
        F.posexplode(
            F.transform(
                # greatest(…, 0): a doc shorter than k chars yields one
                # truncated gram instead of a negative-length sequence error
                F.sequence(F.lit(0), F.greatest(F.length("text") - k, F.lit(0))),
                lambda i: F.col("text").substr(i + 1, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select("doc_id", "pos", hasher(F.col("gram")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return hashed.select("doc_id", F.min("h").over(w).alias("fp")).distinct()


def fingerprint(docs: DataFrame, k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document fingerprint: production xxhash64 variant. Output
    is a compact signature: fingerprint count + xor-fold (order-insensitive
    checksum)."""
    fps = _winnow_fps(docs, k, window, F.xxhash64)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.expr("bit_xor(fp)").alias("fp_xor"),
    )


def tf_idf(docs: DataFrame) -> DataFrame:
    """tf·idf per (doc, term): tf = in-doc count, idf = ln(N/df). N is a
    one-row agg broadcast into the final projection; everything else is two
    hash aggregations on the exploded token relation."""
    toks = tokenize(docs)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf is one row per (doc, token), so a per-token COUNT *window* over tf IS
    # the doc frequency — one pass, one extra shuffle (on token), versus the
    # groupBy-then-self-join formulation which re-executes the whole
    # tokenize/explode subtree for the df branch and adds a join exchange.
    # The unordered window needs no sort beyond the partition clustering.
    # Round 5 A/B'd the df-by-groupBy + join-back alternative (vocabulary
    # agg, exchange-reused tf subtree): 1.42× SLOWER interleaved at sf0.1
    # (BENCH_DRIFT_AB protocol) — the un-broadcastable join back costs a
    # third shuffle + SMJ sort that outweighs WindowExec's sort. Kept.
    df_w = Window.partitionBy("token")
    n_docs = docs.agg(F.countDistinct("doc_id").alias("__n"))
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(df_w))
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias("tfidf"),
        )
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Regex-based PII/URL redaction — the standard pre-training scrub pass.
    Counts are taken before replacement so the op is observable."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ).alias("scrubbed"),
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with a benchmark set (the held-out-eval overlap check every training
    pipeline needs). Shingle hashes equi-join — benchmark side broadcast."""
    from metrics_database_cron_script_spark.functions.dedup import word_shingles

    corpus_sh = word_shingles(docs, n=n).withColumnRenamed("shingle", "h")
    bench_sh = word_shingles(benchmark, n=n).select(F.col("shingle").alias("h")).distinct()
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    return hits


def fingerprint_portable(docs: DataFrame, k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03) on the portable
    md5-prefix hash: char k-gram hashes are 16-hex-char strings whose
    ordering equals the numeric ordering, the window minimum picks the same
    grams in Spark and DuckDB, and the per-doc summary (count + min/max
    fingerprint) is value-hash-checkable. The xxhash64 `fingerprint` stays
    the production fast path."""
    fps = _winnow_fps(
        docs, k, window, lambda g: F.substring(F.md5(g), 1, 16)
    )
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )


def gopher_rules(docs: DataFrame, lo: int = 30, hi: int = 100_000) -> DataFrame:
    """Gopher-style rule filter flags (Rae et al. 2021, Appendix A): word
    count bounds, mean word length in [3, 10], ≥2 known stopwords, and ≥80%
    of words containing a letter. One codegen'd projection per doc; emitted
    as observable booleans + a combined `passes` rather than a destructive
    filter so downstream stages can audit the drop reasons. The word-count
    bounds are fixture-scaled (real Gopher uses [50, 100k])."""
    toks = tokens_col()
    n = F.size(toks).cast("long")
    # total token chars == length of the concatenated tokens: integer math,
    # bit-identical across engines and cheaper than a per-element aggregate
    mwl = F.when(n > 0, F.length(F.concat_ws("", toks)).cast("double") / n)
    n_stop = en_stopword_count(toks)
    alpha_share = F.when(
        n > 0, F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    f_wc = (n >= lo) & (n <= hi)
    f_mwl = (mwl >= 3) & (mwl <= 10)
    f_stop = n_stop >= 2
    f_alpha = alpha_share >= 0.8
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        f_wc.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_stop.alias("flag_stopwords"),
        f_alpha.alias("flag_alpha"),
        (f_wc & f_mwl & f_stop & f_alpha).alias("passes"),
    )


def sequence_packing(docs: DataFrame, budget: int = 128) -> DataFrame:
    """Greedy training-sequence packing: within each shard (`source`), docs
    in deterministic (doc_id) order are packed into consecutive sequences of
    at most `budget` tokens; a doc that would overflow the open sequence
    starts the next one (an oversized doc gets a sequence of its own).

    The running-total-with-reset recurrence is inherently sequential, so it
    runs as an `applyInPandas` loop — but only WITHIN a shard: shards are
    independent, so the operator parallelizes across the shard key exactly
    like the reference's per-chain pipelines (updatescript.py's R24 split),
    which is the scale story — a 100 TB corpus has millions of shards, each
    a few MB. The DuckDB oracle replays the same recurrence as a recursive
    CTE."""
    toks = docs.select(
        "source", "doc_id", F.size(tokens_col()).cast("long").alias("n_tok")
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids, seq, acc = [], 0, None
        for tok in pdf["n_tok"]:
            if acc is None:
                acc = tok
            elif acc + tok > budget:
                seq += 1
                acc = tok
            else:
                acc += tok
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["source", "doc_id", "n_tok", "seq_id"]]

    return toks.groupBy("source").applyInPandas(
        pack, "source string, doc_id long, n_tok long, seq_id long"
    )
