"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (it has no string functions at all,
``README.md:72-78``): token counting, quality scoring, language ID,
and document fingerprinting, all as single-pass JVM-side column
expressions (no UDFs, no shuffles — they scale linearly and pipeline
with any downstream groupBy/join). Each has an exact ANSI-SQL
equivalent so the DuckDB oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame

# Deterministic marker vocabularies for the space-delimited languages
# of the language-ID heuristic. Real deployments would use
# fastText/CLD3 via a pandas_udf; the stopword heuristic here is the
# dependency-free scale path. CJK languages are NOT marker-based —
# they have no whitespace tokens — and are scored by codepoint-range
# counts instead (see CJK_RANGES / with_lang_id).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "is", "of", "to"),
    "es": ("el", "la", "que", "de", "es"),
    "fr": ("le", "la", "et", "est", "les"),
}

# Unicode block ranges for CJK scripts, written as literal characters
# inside a character class so the SAME pattern string parses
# identically under Java regex (Spark) and RE2 (DuckDB) — neither
# engine's \uXXXX escape syntax is portable to the other, literal
# codepoints are. BMP-only on purpose (UTF-16 code-unit safe).
CJK_RANGES: dict[str, str] = {
    "han": "[\u4e00-\u9fff]",
    "hiragana": "[\u3040-\u309f]",
    "katakana": "[\u30a0-\u30ff]",
    "hangul": "[\uac00-\ud7af]",
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


# BPE-ish pre-tokenizer: word pieces OR single non-space symbols —
# the shape GPT-style tokenizers split on before merges. Counting
# these approximates LLM token counts far better than whitespace.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def with_token_stats(frame: Frame, text_col: str = "text") -> Frame:
    """n_tokens (whitespace) / n_tokens_bpe (regex word-piece) /
    n_chars / avg token length per document.

    CJK caveat: ``n_tokens`` is a WHITESPACE count and is meaningless
    for unsegmented scripts (Chinese/Japanese — a whole sentence is one
    "token"). Use ``n_tokens_bpe`` for CJK: its pattern counts each
    non-alphanumeric symbol (hence each CJK character) separately,
    which is the right order of magnitude for LLM token budgeting.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    return Frame(
        frame.df.withColumns(
            {
                "n_tokens": F.size(toks).cast("long"),
                "n_tokens_bpe": F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast(
                    "long"
                ),
                "n_chars_computed": F.length(text).cast("long"),
                "avg_token_len": F.round(
                    (F.length(F.regexp_replace(text, " ", "")).cast("double"))
                    / F.size(toks),
                    6,
                ),
            }
        ),
        frame.group_vars(),
    )


def with_token_counts(
    frame: Frame,
    tokenizer=None,
    text_col: str = "text",
    out_col: str = "n_tokens",
    tokens_col: str | None = None,
) -> Frame:
    """Token counts (and optionally the token arrays) per document,
    with a PLUGGABLE tokenizer — the escape hatch that lets every
    token-denominated operator run on REAL tokenizer counts (BPE,
    SentencePiece, ...) without forking the operators:

    - ``pack_concat_chunks`` / ``pack_greedy`` read ``token_col=`` —
      point them at this function's ``out_col``.
    - ``resample_to_mixture(weight_col=...)`` — same.
    - ``chunk_documents_tokens(tokenizer=...)`` consumes the token
      ARRAYS (it passes its tokenizer through here).

    ``tokenizer=None`` (the default, and the only oracle-verified
    path) counts whitespace tokens ENTIRELY JVM-side — zero Python.
    A callable ``tokenizer(text: str) -> list[str]`` runs as an
    Arrow-batched ``mapInPandas``: the Python cost is paid once per
    document inside columnar batches, never per-token py4j traffic,
    and the plan stays map-side (no shuffle, pipelines into the
    downstream pack/mixture/chunk shuffle unchanged). NULL text is
    treated as the empty string in both paths.

    The tokenizer must be PICKLABLE (a module-level function or a
    functools.partial over one — not a lambda closing over a live
    model handle; load heavy vocabularies lazily inside the function
    so each executor pays the load once per worker, not per row)."""
    taken = set(frame.df.columns)
    if out_col in taken or (tokens_col is not None and tokens_col in taken):
        raise ValueError(
            f"with_token_counts: output columns ({out_col!r}"
            + (f", {tokens_col!r}" if tokens_col is not None else "")
            + ") collide with existing frame columns"
        )
    if tokenizer is None:
        toks = _tokens(F.coalesce(F.col(text_col), F.lit("")))
        df = frame.df.withColumn(out_col, F.size(toks).cast("long"))
        if tokens_col is not None:
            df = df.withColumn(tokens_col, toks)
        return Frame(df, frame.group_vars())

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    in_fields = list(frame.df.schema.fields)
    out_fields = in_fields + [StructField(out_col, LongType())]
    if tokens_col is not None:
        out_fields.append(StructField(tokens_col, ArrayType(StringType())))
    out_schema = StructType(out_fields)
    want_tokens = tokens_col

    def run(batches):
        for pdf in batches:
            texts = pdf[text_col].astype(object)
            tok_lists = [
                list(tokenizer(t if isinstance(t, str) else ""))
                for t in texts
            ]
            out = pdf.copy()
            out[out_col] = [len(t) for t in tok_lists]
            if want_tokens is not None:
                out[want_tokens] = tok_lists
            yield out

    return Frame(frame.df.mapInPandas(run, out_schema), frame.group_vars())


def with_quality_score(frame: Frame, text_col: str = "text") -> Frame:
    """Length/punctuation/stopword-ratio quality heuristic in [0,1].

    All components are deterministic column arithmetic, so the score is
    reproducible across engines (DuckDB oracle) and runs (no sampling).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tokens = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(["the", "a", "and", "of", "to", "in"]))
    ).cast("double")
    punct = F.regexp_count(text, F.lit(r"[.!?,;:]")).cast("double")
    n_chars = F.length(text).cast("double")
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    stop_ratio = stop_hits / n_tokens
    punct_ratio = punct / n_chars
    quality = (
        F.lit(0.5) * length_score
        + F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return Frame(
        frame.df.withColumns(
            {
                "stop_ratio": F.round(stop_ratio, 6),
                "punct_ratio": F.round(punct_ratio, 6),
                "quality": F.round(quality, 6),
            }
        ),
        frame.group_vars(),
    )


def lang_id_scores(text: Column) -> dict[str, Column]:
    """Per-language score columns for :func:`with_lang_id`.

    Space-delimited languages score by marker-token hits; CJK
    languages score by codepoint-range character counts (they have no
    whitespace tokens, so marker matching is structurally impossible —
    the round-2 heuristic's pinyin markers could never fire on real
    Chinese). Han characters are shared between Chinese and Japanese,
    so han counts toward ``ja`` only when kana is present and toward
    ``zh`` only when it is not — a deterministic disambiguation rule
    both Spark and the DuckDB oracle express identically.
    """
    toks = _tokens(text)

    # NB: no default-arg lambdas — pyspark counts default params as
    # higher-order-function arguments.
    def marker_hits(markers: tuple[str, ...]) -> Column:
        wanted = list(markers)
        return F.size(F.filter(toks, lambda t: t.isin(wanted)))

    han = F.regexp_count(text, F.lit(CJK_RANGES["han"]))
    kana = F.regexp_count(text, F.lit(CJK_RANGES["hiragana"])) + F.regexp_count(
        text, F.lit(CJK_RANGES["katakana"])
    )
    hangul = F.regexp_count(text, F.lit(CJK_RANGES["hangul"]))
    scores = {
        lang: marker_hits(markers) for lang, markers in sorted(LANG_MARKERS.items())
    }
    scores["ja"] = F.when(kana > 0, han + kana).otherwise(F.lit(0))
    scores["ko"] = hangul
    scores["zh"] = F.when(kana == 0, han).otherwise(F.lit(0))
    return dict(sorted(scores.items()))


def with_lang_id(frame: Frame, text_col: str = "text") -> Frame:
    """Language scorer: argmax over per-language scores (marker-token
    hits for space-delimited languages, CJK codepoint-range counts for
    ja/ko/zh — see :func:`lang_id_scores`), ties broken by language
    code order (deterministic)."""
    scores = lang_id_scores(F.col(text_col))
    # argmax with lexicographic tie-break: fold over (score, lang)
    # pairs — greatest(struct(...)) keeps it all JVM-side.
    best = F.greatest(
        *[
            F.struct(
                score.alias("score"),
                # invert lang for tie-break so ties pick the FIRST code
                F.lit(-i).alias("nix"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, score) in enumerate(scores.items())
        ]
    )
    df = frame.df.withColumn("lang_pred", best["lang"]).withColumn(
        "lang_score", best["score"].cast("long")
    )
    return Frame(df, frame.group_vars())


def with_gopher_flags(frame: Frame, text_col: str = "text") -> Frame:
    """Gopher-style document-quality signals (Rae et al. 2021, §A1.1 —
    public paper; thresholds below follow the published rules).

    Adds per-document columns, all single-pass JVM column math:

    - ``n_words`` — whitespace token count
    - ``mean_word_len`` — chars-excluding-spaces / n_words
    - ``symbol_word_ratio`` — (# of ``#`` or ``...``) / n_words
    - ``alpha_word_ratio`` — fraction of words containing a letter
    - ``bullet_line_ratio`` / ``ellipsis_line_ratio`` — fraction of
      lines starting with a bullet / ending with an ellipsis
    - ``gopher_pass`` — AND of the published bounds (50 ≤ words ≤ 100k,
      3 ≤ mean word len ≤ 10, symbol ratio < 0.1, bullets < 0.9,
      ellipsis < 0.3, alpha ratio > 0.8)

    Like every operator in this module it shuffles nothing and scales
    linearly per partition.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    lines = F.split(text, "\n")
    n_words = F.size(toks).cast("double")
    n_lines = F.size(lines).cast("double")
    mean_word_len = F.length(F.regexp_replace(text, " ", "")).cast("double") / n_words
    symbol_ratio = F.regexp_count(text, F.lit(r"#|\.\.\.")).cast("double") / n_words
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double") / n_words
    )
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))).cast("double") / n_lines
    )
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_ratio < 0.1)
        & (bullet_ratio < 0.9)
        & (ellipsis_ratio < 0.3)
        & (alpha_ratio > 0.8)
    )
    return Frame(
        frame.df.withColumns(
            {
                "n_words": F.size(toks).cast("long"),
                "mean_word_len": F.round(mean_word_len, 6),
                "symbol_word_ratio": F.round(symbol_ratio, 6),
                "alpha_word_ratio": F.round(alpha_ratio, 6),
                "bullet_line_ratio": F.round(bullet_ratio, 6),
                "ellipsis_line_ratio": F.round(ellipsis_ratio, 6),
                "gopher_pass": gopher_pass,
            }
        ),
        frame.group_vars(),
    )


# Cap for the O(k²) in-row 2-gram multiplicity scan: 256 tokens bounds
# it at ~65k cheap comparisons per document regardless of doc length.
REPETITION_MAX_TOKENS = 256


def with_repetition_stats(frame: Frame, text_col: str = "text") -> Frame:
    """Repetition signals for dedup/quality filtering (the Gopher
    repetition rules, §A1.1): duplicate-line fraction, duplicate-
    paragraph fraction, and the character fraction covered by the most
    repeated word 2-gram.

    ``top_2gram_char_frac`` is defined as max over 2-grams g of
    ``count(g) * len(g) / len(text)`` over the first
    ``REPETITION_MAX_TOKENS`` tokens — a deterministic, tie-free proxy
    for "chars in the most common 2-gram" that both Spark and the
    DuckDB oracle compute identically. Everything is per-row array
    math: zero shuffles, linear scale-out.
    """
    text = F.col(text_col)

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr).cast("double")
        return F.when(
            n > 0, F.round((n - F.size(F.array_distinct(arr))) / n, 6)
        ).otherwise(F.lit(0.0))

    # Three projections on purpose (the minhash_signatures pattern):
    # higher-order functions are interpreted with NO common-subexpr
    # elimination inside lambdas, so a nested filter-over-grams inlined
    # by CollapseProject would rebuild the grams array per outer
    # element — O(k³) string work. Materializing toks then grams behind
    # multi-reference projection boundaries keeps it O(k²) over cheap
    # attribute reads (~50x faster at 100-word docs).
    step1 = frame.df.withColumns(
        {
            "__rep_toks": F.slice(_tokens(text), 1, REPETITION_MAX_TOKENS),
            "__rep_lines": F.split(text, "\n"),
            "__rep_paras": F.split(text, "\n\n"),
        }
    )
    toks = F.col("__rep_toks")
    # grams[i] = toks[i] + ' ' + toks[i+1]; guard k<2 (Spark's
    # sequence(1, 0) yields a DESCENDING [1,0], not an empty list).
    # The grams array is stored SORTED: the max of count(g)*len(g) over
    # distinct grams then falls out of one linear pass over runs of
    # equal neighbors — O(k log k) total vs the naive O(k²)
    # count-each-gram scan (which costs seconds per 1k docs under
    # Spark's interpreted higher-order functions).
    step2 = step1.withColumn(
        "__rep_grams",
        F.when(
            F.size(toks) >= 2,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = F.col("__rep_grams")
    n_grams = F.size(grams)

    def run_step(acc: Column, i: Column) -> Column:
        is_run = F.element_at(grams, i) == F.element_at(grams, i - 1)
        cur = F.when(is_run, acc["cur"] + 1).otherwise(F.lit(1))
        best = F.greatest(acc["best"], cur * F.length(F.element_at(grams, i)))
        return F.struct(best.alias("best"), cur.alias("cur"))

    max_gram_chars = (
        F.when(
            n_grams >= 2,
            F.aggregate(
                F.sequence(F.lit(2), n_grams),
                F.struct(
                    F.length(F.element_at(grams, 1)).alias("best"),
                    F.lit(1).alias("cur"),
                ),
                run_step,
                lambda acc: acc["best"],
            ),
        )
        .when(n_grams == 1, F.length(F.element_at(grams, 1)))
        .otherwise(F.lit(0))
        .cast("double")
    )
    top_frac = F.when(
        n_grams >= 1, F.round(max_gram_chars / F.length(text).cast("double"), 6)
    ).otherwise(F.lit(0.0))
    out = step2.withColumns(
        {
            "dup_line_frac": dup_frac(F.col("__rep_lines")),
            "dup_para_frac": dup_frac(F.col("__rep_paras")),
            "top_2gram_char_frac": top_frac,
        }
    ).drop("__rep_toks", "__rep_lines", "__rep_paras", "__rep_grams")
    return Frame(out, frame.group_vars())


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def with_pii_scrub(frame: Frame, text_col: str = "text") -> Frame:
    """Redact emails / IPv4s / phone numbers into typed placeholders
    and count each (training-data scrubbing pass).

    Order matters and is fixed: emails first (their local part can
    contain digits that would otherwise phone-match), then IPs (dotted
    digits would phone-match), then phones. Pure ``regexp_replace`` /
    ``regexp_count`` — JVM-side, no shuffle.
    """
    text = F.col(text_col)
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    after_phone = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return Frame(
        frame.df.withColumns(
            {
                "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)).cast("long"),
                "n_ips": F.regexp_count(after_email, F.lit(PII_IPV4)).cast("long"),
                "n_phones": F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("long"),
                "text_scrubbed": after_phone,
            }
        ),
        frame.group_vars(),
    )


def with_fingerprint(frame: Frame, text_col: str = "text") -> Frame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lower + trim + whitespace collapse). md5 is identical across
    engines, making fingerprints portable keys for dedup joins."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return Frame(
        frame.df.withColumn("fingerprint", F.md5(norm)),
        frame.group_vars(),
    )


def with_token_rarity(frame: Frame, text_col: str = "text", id_col: str = "doc_id") -> Frame:
    """Corpus-relative token-rarity signals per document — the
    dependency-free stand-in for LM-perplexity quality filters (docs
    whose vocabulary is corpus-common score high, rare-gibberish docs
    score low):

    - ``n_tokens`` — whitespace token occurrences
    - ``n_distinct_tokens`` — distinct tokens in the doc
    - ``sum_token_df`` — sum over token OCCURRENCES of the token's
      corpus document frequency (how many docs contain it)

    All three are exact integers (no log/float), so the DuckDB oracle
    hash-matches bit-for-bit; consumers derive mean-df or -log scores
    downstream.

    Scale shape: tokens collapse to per-(doc, token) counts FIRST (one
    shuffle at tf grain, the same compaction tf_idf_top_terms uses), df
    is an aggregate of those compacted rows, and the join back runs at
    tf grain, never at raw-occurrence grain. Four slim-row shuffles
    total; no driver-side state.
    """
    toks = frame.df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    j = tf.join(dfreq, "tok")
    out = j.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.sum(F.col("tf") * F.col("df")).alias("sum_token_df"),
    )
    return Frame(out, ())


def tf_idf_top_terms(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> Frame:
    """Per-document top-k TF-IDF terms (classic text featurization).

    tf(t, d) = count of t in d; idf(t) = ln((N + 1) / (df_t + 1)) + 1
    (the smoothed scikit-learn formulation — public knowledge, chosen
    because it never divides by zero). Returns one row per (doc, term)
    for the top_k terms by score, ties broken lexicographically.

    100 TB shape: token explode is map-side; document frequencies are
    one (term) hash-agg; the tiny idf table broadcasts back onto the
    per-doc term counts; top-k is a keyed window. The corpus text
    itself shuffles once at term grain (unavoidable for exact df) —
    at extreme scale swap exact df for a broadcast count-min sketch,
    same downstream plan.
    """
    from pyspark.sql import Window

    toks = frame.df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = frame.df.select(F.countDistinct(id_col).alias("__n_docs"))
    # df falls out of tf for free: tf rows ARE the distinct (doc, term)
    # pairs, so one re-agg by term replaces a second pass over tokens
    df_t = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.log((F.col("__n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1.0,
        )
        .select("term", "df", "idf")
    )
    scored = tf.join(F.broadcast(df_t), on="term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "tfidf", "rank")
    )
    return Frame(out, ())


def with_source_stats(
    frame: Frame,
    text_col: str = "text",
    source_col: str = "source",
) -> Frame:
    """Per-source (domain-level) corpus statistics joined back to each
    document: doc count, exact-duplicate rate, and mean whitespace
    token count for the document's source.

    The C4/RefinedWeb-style "drop bad domains" precursor: curation
    decisions at domain grain need these three numbers. One agg shuffle
    at source grain (domains ≪ documents at any SF; partial aggregation
    does the heavy lifting map-side) and one join back — the source-
    stats side is tiny relative to the corpus so AQE broadcasts it; no
    hint needed (domain count scales with the corpus, the r4 lesson).

    ``src_dup_rate`` uses an exact distinct count of md5(text) per
    source: deterministic, oracle-checkable, and the per-source
    distinct is computed inside the same shuffle as the count.
    """
    text = F.col(text_col)
    stats = (
        frame.df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("src_docs"),
            F.countDistinct(F.md5(text.cast("binary"))).alias("__uniq"),
            F.sum(F.size(_tokens(text))).alias("__toks"),
        )
        .select(
            source_col,
            F.col("src_docs").cast("long").alias("src_docs"),
            F.round(
                1.0 - F.col("__uniq").cast("double") / F.col("src_docs"), 6
            ).alias("src_dup_rate"),
            F.round(F.col("__toks").cast("double") / F.col("src_docs"), 6).alias(
                "src_mean_tokens"
            ),
        )
    )
    return Frame(frame.df.join(stats, on=source_col, how="left"), frame.group_vars())


def filter_by_source_quality(
    frame: Frame,
    text_col: str = "text",
    source_col: str = "source",
    max_dup_rate: float = 0.5,
    min_mean_tokens: float = 0.0,
) -> Frame:
    """Keep only documents whose source passes the domain-quality gate:
    exact-dup rate at most ``max_dup_rate`` and mean token count at
    least ``min_mean_tokens``. Stats columns stay attached so the
    decision is auditable downstream."""
    gated = with_source_stats(frame, text_col=text_col, source_col=source_col)
    return Frame(
        gated.df.filter(
            (F.col("src_dup_rate") <= F.lit(max_dup_rate))
            & (F.col("src_mean_tokens") >= F.lit(min_mean_tokens))
        ),
        frame.group_vars(),
    )


def chunk_documents(
    frame: Frame,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Frame:
    """Split each document into fixed-size character chunks with
    overlap — the standard pre-embedding / context-window-packing step
    of a training-data pipeline.

    Chunk c starts at ``1 + c * (size - overlap)``; starts run while
    ``start <= max(len - overlap, 1)`` so the final partial chunk is
    emitted once and a trailing fragment fully contained in the
    previous chunk is not. Output one row per chunk:
    ``(id_col, chunk_id, chunk_text)``.

    Pure per-row column math (sequence + posexplode + substring):
    zero shuffles, scales linearly, and the explode multiplies rows
    *after* the parquet scan so column pruning still reaches the
    source. ``overlap`` must be smaller than ``size``.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    text = F.col(text_col)
    n = F.coalesce(F.length(text), F.lit(0))
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    out = frame.df.select(
        F.col(id_col),
        text.alias("__text"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    ).select(
        F.col(id_col),
        F.col("chunk_id"),
        F.substring(F.col("__text"), F.col("__start"), F.lit(size)).alias(
            "chunk_text"
        ),
    )
    return Frame(out, ())


def score_linear_classifier(
    frame: Frame,
    dims: int = 1024,
    text_col: str = "text",
    salt: str = "quality",
) -> Frame:
    """Hashing-trick linear classifier score (fastText-style quality
    filter), evaluated entirely as column math.

    Each whitespace token hashes into one of ``dims`` buckets; the
    bucket's weight is a deterministic value in [-1, 1] derived from a
    portable 60-bit md5 hash (the same construction real deployments
    would replace with a broadcast learned-weight array — the plan
    shape is identical, only the weight expression changes). The logit
    is the mean token weight:

        clf_logit = round(sum(int_weight(tok)) / (1e6 * n_tokens), 6)

    Weight lookups stay INTEGER until the single final division, so
    the score is exact and order-independent — the DuckDB oracle
    reproduces it bit-for-bit. ``clf_keep`` is the >0 decision.

    Zero shuffles; at 100 TB this is a pure map over the corpus scan
    and pipelines into the filter that consumes it.
    """
    from cuplyr_spark.pipeline.dedup import _hash64

    toks = _tokens(F.col(text_col))
    iw = F.transform(
        toks,
        lambda t: F.pmod(_hash64(F.concat(t, F.lit(salt))), F.lit(dims)),
    )
    iweights = F.transform(
        iw,
        lambda b: _hash64(F.concat(F.lit("w"), b.cast("string"), F.lit(salt)))
        % 2000001
        - 1000000,
    )
    total = F.aggregate(
        iweights, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    logit = F.round(
        total.cast("double") / (F.lit(1000000.0) * F.size(toks)), 6
    )
    df = frame.df.withColumn("clf_logit", logit).withColumn(
        "clf_keep", F.col("clf_logit") > 0
    )
    return Frame(df, frame.group_vars())


def clean_lines_c4(
    frame: Frame,
    text_col: str = "text",
    min_words: int = 3,
) -> Frame:
    """C4-style line-level cleaning: keep only lines that end in a
    terminal punctuation mark, have at least ``min_words`` whitespace
    words, and do not mention "javascript"; surface the page-level
    boilerplate flags (curly brace, "lorem ipsum") the C4 recipe drops
    pages on.

    Adds: ``n_lines``, ``n_kept_lines``, ``text_clean`` (kept lines
    re-joined), ``has_brace``, ``has_lorem``. Filtering happens inside
    an array ``filter`` lambda — per-row JVM column math, zero
    shuffles, and the regexes are Java/RE2-portable so the DuckDB
    oracle replays them exactly.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def keep(line: Column) -> Column:
        words = F.size(F.split(F.trim(line), " +"))
        return (
            line.rlike('[.!?"\']\\s*$')
            & (words >= min_words)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, keep)
    return Frame(
        frame.df.withColumns(
            {
                "n_lines": F.size(lines).cast("long"),
                "n_kept_lines": F.size(kept).cast("long"),
                "text_clean": F.array_join(kept, "\n"),
                "has_brace": text.contains("{"),
                "has_lorem": F.lower(text).contains("lorem ipsum"),
            }
        ),
        frame.group_vars(),
    )


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for dedup joins: drop the fragment,
    lowercase the scheme+host (path/query case is preserved — it is
    significant), strip a leading ``www.``, remove tracking params
    (``utm_*``, ``gclid``, ``fbclid``), and drop dangling separators
    and a trailing slash.

    Heuristic by design (no percent-decoding, no param re-ordering —
    both would need lookarounds or callbacks that RE2 lacks); every
    step is a chained ``regexp_replace``/``regexp_extract`` that the
    DuckDB oracle replays verbatim, so normalized URLs are portable
    join keys. Pure per-row column math.
    """
    u = F.col(url) if isinstance(url, str) else url
    u0 = F.regexp_replace(u, "#.*", "")
    pre = F.regexp_extract(u0, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0)
    rest = F.substring(u0, F.length(pre) + 1, F.lit(1 << 30))
    pre2 = F.regexp_replace(F.lower(pre), "://www\\.", "://")
    u1 = F.concat(pre2, rest)
    # Tracking-param removal in three '?'-preserving steps (one
    # combined [?&]-strip eats the '?' when a tracked param LEADS the
    # query string, splitting '/p?utm=t&x=1' from '/p?x=1&utm=t'):
    # (1) every '&param=...' goes; (2) a leading '?param=...&' yields
    # its '?' to the next real param; (3) a now-lone '?param=...$'
    # goes with its '?'. The fragment is already stripped, so '$' is
    # the only terminator step 3 needs.
    trk = "(utm_[a-zA-Z0-9_]*|gclid|fbclid)"
    u2 = F.regexp_replace(u1, f"&{trk}=[^&#]*", "")
    u3 = F.regexp_replace(u2, f"\\?{trk}=[^&#]*&", "?")
    u4 = F.regexp_replace(u3, f"\\?{trk}=[^&#]*$", "")
    u5 = F.regexp_replace(u4, "[?&]$", "")
    return F.regexp_replace(u5, "/$", "")


def dedup_by_url(
    frame: Frame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> Frame:
    """URL-level exact dedup (the first pass of every web-corpus
    pipeline): normalize, keep the smallest-id document per normalized
    URL, carry the duplicate count. One hash-agg shuffle on the
    normalized key — same scale shape as ``dedup.exact_dedup``."""
    norm = normalize_url(F.col(url_col))
    per_url = (
        frame.df.withColumn("url_norm", norm)
        .groupBy("url_norm")
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )
    return Frame(per_url.select(id_col, "url_norm", "n_copies"), ())


def with_importance_logratio(
    frame: Frame,
    target_model: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_model: Frame | None = None,
) -> Frame:
    """DSIR-style importance scoring (Data Selection via Importance
    Resampling, Xie et al. 2023 — public art): the per-document
    unigram log-likelihood RATIO between a TARGET-domain model and the
    raw/source model — the "make my corpus look like the target"
    selection signal; sample ∝ exp(importance) or take the top-k.

    Models are the staged ``(tok, c)`` Frames of
    :func:`train_unigram_model` — train the target model on the
    exemplar corpus ONCE, stage to parquet, score every later batch
    against it. ``raw_model=None`` self-trains on ``frame`` (the
    common shape: raw pool scores itself as the denominator).

    Cross-engine determinism matches :func:`with_unigram_logprob`:
    each (doc, term) contribution per model rounds to integer
    micro-nats, the per-doc reduction and the ratio are exact integer
    sums/differences — order-independent, bit-identical in the DuckDB
    oracle; floats reappear only in the final divisions.

    Scale shape: ONE tf shuffle shared by both models (the raw
    occurrences never ride a shuffle twice); each model joins at tf
    grain against a vocab-sized count table; the two (T, V)
    normalizers are driver literals. OOV-under-a-model tokens take
    that model's add-one floor.

    Adds ``n_tokens`` (long), ``importance`` (double — the log-ratio,
    positive = more target-like), ``avg_importance`` (per-token mean,
    rounded to 6)."""
    toks = frame.df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))

    def norm_counts(m: Frame):
        missing = [c for c in ("tok", "c") if c not in m.df.columns]
        if missing:
            raise ValueError(f"unigram model lacks columns {missing}")
        return m.df.groupBy("tok").agg(
            F.sum(F.col("c").cast("long")).alias("c")
        )

    tgt = norm_counts(target_model)
    raw = (
        norm_counts(raw_model)
        if raw_model is not None
        else tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    )

    def denom_of(counts) -> float:
        row = counts.agg(
            F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
        ).collect()[0]
        return float(int(row["t"] or 0) + int(row["v"] or 0))

    d_t, d_r = denom_of(tgt), denom_of(raw)

    def nats(c_col, denom) -> "Column":
        return F.floor(
            F.col("tf")
            * F.log((F.coalesce(c_col, F.lit(0)) + 1).cast("double") / denom)
            * 1e6
            + 0.5
        ).cast("long")

    joined = (
        tf.join(tgt.withColumnRenamed("c", "__ct"), "tok", "left")
        .join(raw.withColumnRenamed("c", "__cr"), "tok", "left")
    )
    per_doc = (
        joined.select(
            F.col(id_col),
            F.col("tf"),
            (nats(F.col("__ct"), d_t) - nats(F.col("__cr"), d_r)).alias(
                "__dn"
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), F.sum("__dn").alias("__dll"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("__dll").cast("double") / 1e6).alias("importance"),
            # per-token mean rounded AT the micro-nat grain:
            # floor(dll/n + 0.5) of two exact int64s is the same IEEE
            # division in every engine — decimal round(x, 6) is not
            # (its double→decimal conversion can flip the last digit
            # at ...5 boundaries; bit one doc at sf0.1)
            (
                F.floor(
                    F.col("__dll").cast("double") / F.col("n_tokens")
                    + F.lit(0.5)
                ).cast("long")
                / 1e6
            ).alias("avg_importance"),
        )
    )
    out = (
        frame.df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "importance",
            "avg_importance",
        )
    )
    return Frame(out, ())


def select_topk_importance(
    frame: Frame,
    target_model: Frame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_model: Frame | None = None,
) -> Frame:
    """The DSIR SELECTION loop end-to-end (score → select), not just
    the score: keep the ``k`` most target-like documents by
    :func:`with_importance_logratio`'s log-ratio, ties broken by
    ``id_col`` ascending — fully deterministic, so the selected SET
    (not merely the scores) is contract-pinnable against an oracle.
    Unscored documents (empty text → NULL importance) sort last and
    are selected only when fewer than ``k`` scored docs exist.

    The ordering key is exact: ``importance`` is the integer
    micro-nat sum divided by 1e6, and int64 sums in this range are
    exactly representable as doubles, so the double order IS the
    integer order in every engine.

    Scale shape: the score plan's shuffles plus ONE top-k —
    Spark plans orderBy+limit as TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), never a global sort; k rows is a
    driver-safe result by construction (the caller picks k)."""
    if k <= 0:
        raise ValueError("k must be positive")
    scored = with_importance_logratio(
        frame, target_model, text_col=text_col, id_col=id_col,
        raw_model=raw_model,
    ).df
    out = scored.orderBy(
        F.col("importance").desc_nulls_last(), F.col(id_col)
    ).limit(int(k))
    return Frame(out, ())


def train_unigram_model(
    frame: Frame, text_col: str = "text"
) -> Frame:
    """Train the :func:`with_unigram_logprob` model once: corpus token
    occurrence counts as a ``(tok, c)`` Frame — the stage-once
    artifact (write to parquet, reuse across every scoring batch, the
    ``sigs=`` / ``centroids=`` / ``pre_quantized=`` contract applied
    to LM quality scoring). The (T, V) normalizers are re-derived from
    the staged counts at scoring time, so the parquet table is the
    WHOLE model."""
    toks = frame.df.select(
        F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    return Frame(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")), ())


def with_unigram_logprob(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: Frame | None = None,
) -> Frame:
    """Corpus-trained unigram-LM log-likelihood per document — the
    jar-free analog of CCNet's LM-perplexity quality filter (score
    with a language model trained on the corpus; unusually improbable
    text — gibberish, encoding junk, wrong-language shards — scores
    low). Complements :func:`with_token_rarity`, whose signal is
    document frequency: the LM scores by OCCURRENCE probability with
    add-one smoothing, so ``perplexity = exp(-avg_logprob)`` is
    directly comparable across corpora.

    Model: ``p(t) = (c_t + 1) / (T + V)`` with ``c_t`` the corpus
    occurrence count, ``T`` total tokens, ``V`` vocabulary size.
    Output per doc: ``n_tokens`` (long), ``logprob``
    (sum of ``ln p(t)`` over token occurrences) and ``avg_logprob``
    (mean, rounded to 6).

    Cross-engine determinism: a float sum of logs is
    summation-order-dependent, so each ``(doc, term)`` contribution is
    rounded to INTEGER MICRO-NATS (``floor(tf * ln(p) * 1e6 + 0.5)``
    as int64 — the ``quantize_embeddings`` tie rule, identical in both
    engines) and the per-doc reduction is an exact integer sum — order
    independent, bit-identical in the DuckDB oracle; floats reappear
    only in the final division.

    Scale shape (the with_token_rarity template): occurrences collapse
    to (doc, term) tf grain in one partial-aggregated shuffle, corpus
    counts are a second slim aggregate, the (T, V) scalars are one
    metadata-sized driver row returned to the plan as literals, and
    the count join runs at tf grain — raw occurrences never ride a
    shuffle. Stop-word heat on the term-keyed join is probe-side only
    (AQE-splittable), the shape the round-7 gram-skew rehearsal
    measured as the safe half of that trade.

    ``model=`` accepts a pre-staged :func:`train_unigram_model` Frame
    (``(tok, c)`` — typically read back from parquet): train on the
    reference corpus ONCE and score any later batch against it — the
    stage-once contract. Tokens absent from the staged model (OOV,
    impossible in the self-trained default) take the add-one floor
    ``p = 1 / (T + V)``. Scoring the training corpus itself with its
    staged model is bit-identical to the inline path."""
    toks = frame.df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    if model is None:
        counts = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
        join_how = "inner"  # self-trained: every token is in-vocab
    else:
        missing = [c for c in ("tok", "c") if c not in model.df.columns]
        if missing:
            raise ValueError(f"unigram model lacks columns {missing}")
        # re-aggregate to one row per tok: a model assembled from
        # several writes (parquet union) may carry duplicate tok rows,
        # which would multiply through the tf join and inflate V/T —
        # one slim vocab-sized agg makes the contract unconditional
        counts = model.df.groupBy("tok").agg(
            F.sum(F.col("c").cast("long")).alias("c")
        )
        join_how = "left"  # OOV tokens take the add-one floor (c -> 0)
    row = counts.agg(
        F.sum("c").alias("t_total"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    t_total, v = int(row["t_total"] or 0), int(row["v"] or 0)
    denom = float(t_total + v)
    comp = F.floor(
        F.col("tf")
        * F.log((F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double") / denom)
        * 1e6
        + 0.5
    ).cast("long")
    per_doc = (
        tf.join(counts, "tok", join_how)
        .select(F.col(id_col), F.col("tf"), comp.alias("__nats"))
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), F.sum("__nats").alias("__ll"))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("__ll").cast("double") / 1e6).alias("logprob"),
            F.round(
                F.col("__ll").cast("double") / 1e6 / F.col("n_tokens"), 6
            ).alias("avg_logprob"),
        )
    )
    out = (
        frame.df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "logprob",
            "avg_logprob",
        )
    )
    return Frame(out, ())


def _avg_micro_nats(ll_col: Column, n_col: Column) -> Column:
    """Per-token mean of an integer micro-nat sum, rounded AT the
    micro-nat grain: ``floor(ll/n + 0.5)`` of two exact int64s is the
    same IEEE division in every engine (the dsir tie rule) — decimal
    ``round(x, 6)`` is not."""
    return (
        F.floor(ll_col.cast("double") / n_col + F.lit(0.5)).cast("long")
        / 1e6
    )


def _doc_micro_nats(frame: Frame, text_col: str, id_col: str,
                    model: Frame | None):
    """(doc, n_tokens, ll-micro-nats) for every SCORED doc — the
    shared integer-exact core of :func:`with_unigram_logprob`,
    re-derived here at raw grain for the bucketing ops (which need
    the unrounded int64, not the rounded float output)."""
    toks = frame.df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    if model is None:
        counts = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
        join_how = "inner"
    else:
        counts = model.df.groupBy("tok").agg(
            F.sum(F.col("c").cast("long")).alias("c")
        )
        join_how = "left"
    row = counts.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = float(int(row["t"] or 0) + int(row["v"] or 0))
    comp = F.floor(
        F.col("tf")
        * F.log((F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double") / denom)
        * 1e6
        + 0.5
    ).cast("long")
    return (
        tf.join(counts, "tok", join_how)
        .select(F.col(id_col), F.col("tf"), comp.alias("__nats"))
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"), F.sum("__nats").alias("__ll"))
    )


def perplexity_thresholds(
    frame: Frame,
    model: Frame | None = None,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_frac: float | None = None,
    salt: str = "",
) -> list[float]:
    """The ``n_buckets-1`` boundary scores of CCNet-style perplexity
    bucketing (Wenzek et al. 2020 — public art: score a corpus with a
    reference LM, split into head/middle/tail by perplexity), computed
    EXACTLY and deterministically: scored docs ordered by (per-token
    micro-nat mean DESC, id ASC), boundary i is the score of the doc
    at rank ``ceil(i*n/B)``. Duplicate boundary values are kept (two
    coinciding boundaries advance the bucket twice — consistent on
    both engines).

    This is the STAGING step, run once per reference corpus and
    passed to :func:`with_perplexity_bucket` as ``thresholds=`` —
    exactly CCNet's procedure (their thresholds come from the
    Wikipedia-LM score distribution, then every CommonCrawl shard
    buckets map-side against the fixed cuts). Cost: one slim global
    sort over (score, id) pairs at doc grain — fine at staging
    cadence; the per-shard scoring NEVER pays it.

    ``sample_frac=`` bounds that sort BY CONSTRUCTION: a
    deterministic hash-sample of documents (``pipeline/sampling``'s
    md5 bucketing on ``id_col`` — stable across runs/engines, no RNG)
    is scored and sorted instead of the full corpus, so the
    single-partition window holds ~``frac*n`` rows no matter how big
    the reference corpus is. Quantile cuts from a uniform sample
    converge to the full-corpus cuts (CCNet itself samples); pick the
    frac so the sampled (score, id) pairs fit one task — 1e7 rows ≈
    160 MB is comfortable. ``salt`` decorrelates repeated stagings."""
    import math

    from pyspark.sql import Window

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if sample_frac is not None:
        if not (0.0 < sample_frac <= 1.0):
            raise ValueError(
                f"sample_frac must be in (0, 1], got {sample_frac}"
            )
        from cuplyr_spark.pipeline.sampling import GRANULARITY, hash_bucket

        keep = int(round(sample_frac * GRANULARITY))
        frame = Frame(
            frame.df.filter(
                hash_bucket(F.col(id_col), salt=salt) < F.lit(keep)
            ),
            (),
        )
    per = _doc_micro_nats(frame, text_col, id_col, model)
    scored = per.filter(F.col("n_tokens") > 0).select(
        _avg_micro_nats(F.col("__ll"), F.col("n_tokens")).alias("__avg"),
        F.col(id_col),
    )
    n = scored.count()
    if n == 0:
        return []
    ranks = sorted(
        {math.ceil(i * n / n_buckets) for i in range(1, n_buckets)}
    )
    w = Window.orderBy(F.col("__avg").desc(), F.col(id_col))
    rows = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn").isin(ranks))
        .orderBy("__rn")
        .collect()
    )
    by_rank = {r["__rn"]: float(r["__avg"]) for r in rows}
    # per-boundary lookup (NOT the deduped rank set): coinciding
    # boundaries at tiny n repeat their value, advancing the bucket
    # twice — the documented, engine-consistent rule
    return [by_rank[math.ceil(i * n / n_buckets)]
            for i in range(1, n_buckets)]


def with_perplexity_bucket(
    frame: Frame,
    model: Frame | None = None,
    n_buckets: int = 3,
    thresholds: list[float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Frame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): assign
    every document a quality bucket 1..B — bucket 1 ("head") holds
    the most reference-like text (highest LM log-probability / lowest
    perplexity), bucket B ("tail") the least — by comparing its
    per-token micro-nat mean against fixed boundary scores. Unscored
    docs (empty text) get a NULL bucket.

    ``thresholds=`` takes the staged cuts of
    :func:`perplexity_thresholds` (CCNet's deployment shape: fixed
    Wikipedia-derived cuts, every shard buckets MAP-SIDE — zero
    shuffles beyond the scoring plan, no global ordering anywhere in
    the per-shard job). With ``thresholds=None`` the cuts are
    computed inline from ``frame`` itself (self-bucketing — the
    staging sort runs eagerly, the returned plan is still map-side).

    bucket(d) = 1 + |{i : score_d < t_i}| — a doc equal to a boundary
    stays in the upper bucket; duplicate boundary values advance
    twice. Integer-exact scoring makes the assignment bit-identical
    cross-engine (the dsir determinism contract)."""
    if thresholds is None:
        thresholds = perplexity_thresholds(
            frame, model=model, n_buckets=n_buckets,
            text_col=text_col, id_col=id_col,
        )
    per = _doc_micro_nats(frame, text_col, id_col, model)
    avg = _avg_micro_nats(F.col("__ll"), F.col("n_tokens"))
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + F.when(avg < F.lit(float(t)), 1).otherwise(0)
    per_doc = per.select(
        F.col(id_col),
        F.col("n_tokens"),
        avg.alias("avg_logprob"),
        bucket.cast("int").alias("bucket"),
    )
    out = (
        frame.df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "avg_logprob",
            "bucket",
        )
    )
    return Frame(out, ())


def chunk_documents_tokens(
    frame: Frame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer=None,
    token_joiner: str | None = None,
) -> Frame:
    """Fixed-size token-window chunking with overlap — the
    RAG / long-document pretraining preprocessing shape, the TOKEN
    twin of the character-based :func:`chunk_documents` above (LLM
    budgets are token-denominated; character chunks split words at
    boundaries): each document explodes into windows of
    ``chunk_tokens`` whitespace tokens,
    stepping by ``chunk_tokens - overlap_tokens`` so consecutive
    chunks share ``overlap_tokens`` of context. The final chunk may
    be short (it carries the tail); a document at or under one window
    yields exactly one chunk. NULL text is coalesced to the empty
    string, so NULL and empty documents both yield one
    single-empty-token chunk instead of silently dropping the row.

    ``tokenizer=`` swaps the whitespace split for a real tokenizer
    (``tokenizer(text) -> list[str]``, run Arrow-batched through
    :func:`with_token_counts` — LLM budgets are counted in BPE/
    SentencePiece tokens, not words; see that function's pickling
    contract). Window arithmetic is identical either way.
    ``chunk_text`` is the window's tokens joined by ``token_joiner``
    — default ``" "`` for the whitespace path (reconstructs the
    original text) and ``""`` for a custom tokenizer (GPT-style BPE
    pieces carry their own leading-space marks; pass an explicit
    joiner to override). The whitespace default stays the
    oracle-verified path.

    MAP-SIDE ONLY: split → sequence → explode → slice — zero
    shuffles, pipelines into any downstream write/groupBy, and scales
    linearly to a 100 TB corpus (compare sequence packing in
    ``pipeline/packing.py``, which is the inverse operation and does
    need a shard-keyed shuffle). Chunk count and boundaries are pure
    integer arithmetic on the token count — deterministic and
    bit-identical in the DuckDB oracle.

    Output: ``id_col``, ``chunk_idx`` (int, 0-based), ``n_chunk_tokens``
    (long), ``chunk_text`` (string)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            "overlap_tokens must satisfy 0 <= overlap < chunk_tokens "
            f"(got chunk={chunk_tokens}, overlap={overlap_tokens})"
        )
    stride = chunk_tokens - overlap_tokens
    joiner = token_joiner if token_joiner is not None else (
        " " if tokenizer is None else ""
    )
    if tokenizer is None:
        # NULL text behaves like empty text (one single-empty-token
        # chunk) rather than silently vanishing: size(split(NULL)) is
        # NULL, and explode(sequence(0, NULL)) would eliminate the row
        # entirely — breaking the "at or under one window yields
        # exactly one chunk" contract empty-string documents honor
        base = frame.df
        toks = _tokens(F.coalesce(F.col(text_col), F.lit("")))
    else:
        base = with_token_counts(
            Frame(frame.df.select(id_col, text_col), ()),
            tokenizer=tokenizer,
            text_col=text_col,
            out_col="__n_toks",
            tokens_col="__toks",
        ).df
        toks = F.col("__toks")
    n = F.size(toks)
    # chunks = 1 when the doc fits one window, else
    # 1 + ceil((n - chunk) / stride) — integer arithmetic only
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        (
            (n - F.lit(chunk_tokens) + F.lit(stride - 1))
            .cast("long") / F.lit(stride)
        ).cast("long") + F.lit(1)
    )
    exploded = base.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "__i"
        ),
    )
    start = F.col("__i").cast("long") * stride
    out = exploded.select(
        F.col(id_col),
        F.col("__i").cast("int").alias("chunk_idx"),
        F.least(
            F.col("__n").cast("long") - start, F.lit(chunk_tokens)
        ).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(
                F.col("__toks"), (start + 1).cast("int"), chunk_tokens
            ),
            joiner,
        ).alias("chunk_text"),
    )
    return Frame(out, ())
