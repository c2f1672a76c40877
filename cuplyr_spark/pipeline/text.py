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

# Deterministic marker vocabularies for the language-ID heuristic.
# Real deployments would use fastText/CLD3 via a pandas_udf; the
# n-gram/stopword heuristic here is the dependency-free scale path.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "is", "of", "to"),
    "es": ("el", "la", "que", "de", "es"),
    "fr": ("le", "la", "et", "est", "les"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


# BPE-ish pre-tokenizer: word pieces OR single non-space symbols —
# the shape GPT-style tokenizers split on before merges. Counting
# these approximates LLM token counts far better than whitespace.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def with_token_stats(frame: Frame, text_col: str = "text") -> Frame:
    """n_tokens (whitespace) / n_tokens_bpe (regex word-piece) /
    n_chars / avg token length per document."""
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


def with_lang_id(frame: Frame, text_col: str = "text") -> Frame:
    """Marker-word language scorer: argmax over per-language token-hit
    counts, ties broken by language code order (deterministic)."""
    toks = _tokens(F.col(text_col))

    # NB: no default-arg lambdas — pyspark counts default params as
    # higher-order-function arguments.
    def marker_hits(markers: tuple[str, ...]) -> Column:
        wanted = list(markers)
        return F.size(F.filter(toks, lambda t: t.isin(wanted)))

    scores = {
        lang: marker_hits(markers) for lang, markers in sorted(LANG_MARKERS.items())
    }
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


def with_fingerprint(frame: Frame, text_col: str = "text") -> Frame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lower + trim + whitespace collapse). md5 is identical across
    engines, making fingerprints portable keys for dedup joins."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return Frame(
        frame.df.withColumn("fingerprint", F.md5(norm)),
        frame.group_vars(),
    )
