"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All variants are shuffle-conscious:

- exact: one hash-aggregate on the dedup key (map-side partial agg);
- MinHash/LSH: signatures are per-row column math (no shuffle); the
  candidate-pair generation shuffles on *band hash* — tiny keys —
  instead of an O(n^2) cross join;
- SimHash: per-row 16-bit signature, bucket-join on the signature;
- n-gram Jaccard: equi-join on a cheap blocking key then exact
  verification on the pairs (classic blocking+verification);
- embedding near-dup: see similarity.py (bucketed cosine).

Hashing is md5-based so every signature is reproducible in ANSI SQL
(DuckDB oracle verifies signatures and pairs bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame, broadcast_guarded

# Fixed affine-permutation constants for MinHash: h_i(x) = (a_i*x + b_i) % P.
# P is a large prime below 2^31 so all arithmetic stays in exact int64.
MINHASH_PRIME = 2_147_483_647
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (69_069, 362_437),
    (1_566_083_941, 1_406_932_606),
    (747_796_405, 2_891_336_453 % MINHASH_PRIME),
]


def _hash64(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 -> bigint.
    Identical in Spark (conv) and DuckDB (CAST '0x..' AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(text: Column, k: int) -> Column:
    """Distinct k-word shingles of a single-space-tokenized text.

    Public expression helper (MinHash, decontamination, and the
    streaming ingest-hygiene pipeline all shingle with this exact
    rule): documents shorter than ``k`` words contribute their full
    text as one shingle, so every document shingles to >= 1 gram."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(shingle)


_word_shingles = word_shingles  # internal alias (pre-r7 name)


def exact_dedup(frame: Frame, *cols: str, id_col: str) -> Frame:
    """Exact dedup: one representative (min id) per duplicate group.
    A single hash-aggregate — Spark's partial aggregation makes this
    the cheapest possible dedup at any scale."""
    key = list(cols)
    out = frame.df.groupBy(*key).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return Frame(out.select(id_col, *key, "n_copies"), ())


def minhash_signatures(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_k: int = 3,
) -> Frame:
    """MinHash signature per document: min over shingle hashes under
    ``n_hashes`` fixed affine permutations. Pure per-row column math —
    zero shuffle; scales embarrassingly."""
    if n_hashes > len(MINHASH_COEFFS):
        raise ValueError(f"n_hashes <= {len(MINHASH_COEFFS)} supported")
    shingles = _word_shingles(F.col(text_col), shingle_k)
    hashes = F.transform(shingles, lambda s: _hash64(s) % MINHASH_PRIME)

    # Two projections on purpose: the md5 hash array is materialized
    # ONCE behind a projection boundary (`hs` is referenced n_hashes
    # times, which stops CollapseProject from inlining the md5+shingle
    # chain into every permutation — higher-order functions are
    # interpreted, no codegen CSE). Each signature is then a cheap
    # integer-only array_min pass. This beats a single fold that
    # maintains all n minima in a struct by ~9x: the fold allocates a
    # fresh n-field struct per element, which dwarfs the md5 cost.
    names = [f"mh_{i}" for i in range(n_hashes)]
    with_hashes = frame.df.select(F.col(id_col), hashes.alias("hs"))

    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME

    out = with_hashes.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("hs"), perm(*MINHASH_COEFFS[i]))).alias(names[i])
            for i in range(n_hashes)
        ],
    )
    return Frame(out, ())


def _explode_band_hashes(sigs_df, id_col: str, n_hashes: int, bands: int):
    """(id, band, bh) rows from a signature table. The band hash is an
    8-byte portable hash, not the md5 hex string: the (band, bh) key
    rides every LSH shuffle, so 8 bytes vs 32 cuts exchange volume 4x
    at corpus scale; equality semantics (and the DuckDB replay) are
    unchanged."""
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                _hash64(F.concat_ws("_", *parts)).alias("bh"),
            )
        )
    return sigs_df.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bx")
    ).select(id_col, F.col("bx.band").alias("band"), F.col("bx.bh").alias("bh"))


def minhash_lsh_pairs(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 10_000,
    sigs: Frame | None = None,
) -> Frame:
    """LSH candidate pairs: split the signature into ``bands``, hash
    each band, self-join on (band index, band hash). The join key is a
    few bytes — the shuffle moves signatures, never documents, so this
    survives 100 TB corpora where the O(n^2) comparison cannot.

    Skew guard: a degenerate band (e.g. millions of empty/boilerplate
    documents sharing one signature) makes the within-bucket self-join
    quadratic and lands it on one straggler task. Buckets larger than
    ``max_bucket_size`` are dropped from candidate generation (their
    members are better handled by exact dedup, which such content hits
    anyway); buckets of size 1 are pruned too — they can't produce a
    pair, so filtering them shrinks the self-join input for free. The
    per-bucket counts are computed in-plan (one extra aggregate on the
    slim (band, hash) table — no driver action). ``None`` disables the
    cap (size-1 pruning stays on; it never changes results).

    ``sigs`` accepts a precomputed ``minhash_signatures`` result (same
    ``n_hashes``/``id_col``): at corpus scale, signatures are worth
    computing once — persisted or written to parquet — and reused
    across band configurations and audit passes instead of re-hashing
    every shingle per consumer."""
    if n_hashes % bands != 0:
        raise ValueError(
            f"minhash_lsh_pairs: n_hashes ({n_hashes}) must be divisible by "
            f"bands ({bands}) — trailing signature components would be "
            "silently ignored, degrading recall"
        )
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2 (or None to disable)")
    rows = n_hashes // bands
    if sigs is not None:
        missing = [c for c in [id_col] + [f"mh_{i}" for i in range(n_hashes)]
                   if c not in sigs.df.columns]
        if missing:
            raise ValueError(f"precomputed sigs lack columns {missing}")
        sigs_df = sigs.df
    else:
        sigs_df = minhash_signatures(frame, text_col, id_col, n_hashes, shingle_k).df
    exploded = _explode_band_hashes(sigs_df, id_col, n_hashes, bands)
    cnt_pred = F.col("__bsz") >= 2
    if max_bucket_size is not None:
        cnt_pred = cnt_pred & (F.col("__bsz") <= max_bucket_size)
    # Bucket-size guard as a WINDOW count, not groupBy + join-back: the
    # window's hash partitioning on (band, bh) is exactly what the
    # bucket aggregation below needs, so Spark shuffles the slim
    # (id, band, bh) rows ONCE and the collect_list aggregate rides the
    # same exchange (the window only COUNTS degenerate buckets —
    # linear, not quadratic — and spills; the list aggregate only ever
    # buffers buckets the guard already passed, <= max_bucket_size ids).
    wcnt = Window.partitionBy("band", "bh")
    survivors = (
        exploded.withColumn("__bsz", F.count(F.lit(1)).over(wcnt))
        .filter(cnt_pred)
        .drop("__bsz")
    )
    # Pair generation (r15 optimization round, measured): a self-join on
    # (band, bh) was the original formulation, but Catalyst broadcasts
    # one side, which duplicates the whole signature subtree (shingle
    # md5 + band hash + window guard run once per side). Forcing the
    # join onto the shuffle was tried and REJECTED with measurements
    # (hint("merge") 34 s, hint("shuffle_hash") 1.65 s vs broadcast's
    # 0.76 s at sf0.1 — neither deduplicated the subtree either).
    # Collecting each bucket's id list instead computes the subtree
    # ONCE and emits each unordered in-bucket pair via array transforms
    # (0.78 s -> 0.43 s median at sf0.1): the aggregate reuses the
    # window's exchange, so the only shuffles are the band shuffle and
    # the final pair distinct. Pair emission per bucket stays on one
    # task, exactly where the broadcast join's probe rows for that
    # bucket already sat; with the cap disabled the buffered id list is
    # the same degenerate bucket the quadratic join output already made
    # pathological, so the guard remains the operative bound.
    buckets = survivors.groupBy("band", "bh").agg(
        F.collect_list(F.col(id_col)).alias("__ids")
    )
    ids = F.col("__ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                # slice is 1-based and clamps at the array end: elements
                # strictly after position i pair with ids[i] exactly once.
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(
                    F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("__p"))
        .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
        # least/greatest of equal ids would emit a degenerate (x, x)
        # pair; the original join's id_a < id_b filter excluded those,
        # so keep the exact same predicate.
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    return Frame(pairs, ())


def dedup_clusters(pairs: Frame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25) -> Frame:
    """Connected components over candidate near-dup pairs -> cluster
    representative per document (label propagation: every node
    repeatedly adopts the min id among itself and its neighbors).

    Iterative joins, each shuffling only (id, label) pairs. Each round
    combines neighbor-min propagation with POINTER JUMPING (also adopt
    my label's label), so convergence is O(log diameter) instead of
    O(diameter) — long sparse chains (low-threshold similarity graphs)
    would otherwise exhaust the iteration cap and silently under-merge
    (caught by the sf0.1 oracle gate in round 5). If the cap is still
    hit before convergence a warning is raised. Returns
    (doc id, cluster id = min member).
    """
    import warnings
    edges = (
        pairs.df.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(
            pairs.df.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: also adopt my (new) label's label. This is
        # the path-halving step that turns O(diameter) propagation into
        # O(log diameter) — each round a node reaches the min of its
        # 2^round-hop neighborhood instead of its round-hop one.
        jumped = (
            updated.alias("x")
            .join(
                updated.select(
                    F.col("node").alias("jnode"), F.col("label").alias("jlabel")
                ),
                F.col("x.label") == F.col("jnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.label"),
                    F.coalesce(F.col("jlabel"), F.col("x.label")),
                ).alias("label"),
            )
        )
        # convergence check: any label still above a neighbor's?
        changed = (
            jumped.alias("u")
            .join(labels.alias("old"), "node")
            .filter(F.col("u.label") < F.col("old.label"))
            .limit(1)
            .count()
        )
        labels = jumped.localCheckpoint(eager=True)  # cut iterative lineage
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"dedup_clusters: iteration cap max_iter={max_iter} reached "
            "before convergence — labels may under-merge deep chains. "
            "Raise max_iter (each round doubles the reachable horizon).",
            stacklevel=2,
        )
    return Frame(labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")), ())


def simhash_signatures(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> Frame:
    """SimHash: per-bit majority vote over token hashes -> compact
    integer signature. Near-dups differ in few bits (Hamming). Per-row
    column math only."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashes = F.transform(toks, _hash64)

    # Materialize the md5 token-hash array once behind a projection
    # boundary (multi-referenced -> CollapseProject keeps it), then one
    # cheap integer fold per bit — same ~9x win over a struct-of-votes
    # fold as minhash_signatures. Integer shiftright for the bit test,
    # NOT division: the hash is ~2^60 and double division would lose
    # the bits past 2^53.
    with_hashes = frame.df.select(F.col(id_col), hashes.alias("hs"))

    def vote(b: int):
        return F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b) % 2 == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    sig = None
    for b in range(bits):
        piece = F.when(vote(b) > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = piece if sig is None else sig + piece
    return Frame(with_hashes.select(F.col(id_col), sig.cast("long").alias("simhash")), ())


def ngram_jaccard_pairs(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    n_hashes: int = 8,
    bands: int = 4,
) -> Frame:
    """Exact n-gram Jaccard similarity over candidate pairs.

    Candidate generation (the part that must never go O(n^2)):
    MinHash-LSH band collisions by default — candidates shrink with
    actual similarity structure, not with a guessed attribute band.
    Pass ``block_col`` to block on an attribute instead (e.g. a
    partition date). Verification is exact: array_intersect / union
    size on the distinct shingle sets — JVM-side, no UDF.
    """
    shingles = _word_shingles(F.col(text_col), shingle_k)
    base = frame.df.select(F.col(id_col), shingles.alias("sh"))
    if block_col is not None:
        blocked = frame.df.select(
            F.col(block_col).alias("blk"), F.col(id_col)
        )
        a = blocked.select("blk", F.col(id_col).alias("id_a"))
        b = blocked.select("blk", F.col(id_col).alias("id_b"))
        cand = (
            a.join(b, "blk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    else:
        cand = minhash_lsh_pairs(
            frame, text_col, id_col, n_hashes=n_hashes, bands=bands,
            shingle_k=shingle_k,
        ).df
    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (
        F.size(F.col("sh_a")) + F.size(F.col("sh_b"))
        - F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    ).cast("double")
    pairs = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return Frame(pairs, ())


def dedup_paragraphs(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> Frame:
    """Corpus-wide duplicate-paragraph removal (the RefinedWeb/DataComp
    boilerplate scrub): every paragraph that occurs anywhere else in
    the corpus survives only at its FIRST occurrence — smallest
    ``id_col``, then smallest position within that document — and is
    dropped everywhere else. Documents are reassembled in original
    paragraph order; paragraphs shorter than ``min_chars`` are never
    deduplicated (so blank separators survive).

    100 TB shape: one shuffle of (id, pos, paragraph) rows keyed on the
    paragraph for BOTH first-occurrence windows (the second window's
    (para, id) clustering is satisfied by the para partitioning — no
    second exchange, just an in-partition sort), then one id-keyed
    aggregation to rebuild documents. No driver-side state, no join
    against a collected dup list.

    Output: (id, text) with ``text`` rebuilt from surviving paragraphs
    (empty string if every paragraph was removed — row is kept).
    """
    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")
    df = frame.df
    # F.split treats sep as a Java regex but array_join rejoins it as a
    # literal — quote it so a metachar separator ('.', '|', ...) splits
    # on the literal string and round-trips exactly (ADVICE r4).
    sep_rx = "".join("\\" + ch if ch in r"\.[]{}()*+-?^$|" else ch for ch in sep)
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_rx)).alias("pos", "para"),
    )
    w_para = Window.partitionBy("para")
    w_doc = Window.partitionBy("para", id_col)
    kept = (
        paras.withColumn("__min_id", F.min(id_col).over(w_para))
        .withColumn("__min_pos", F.min("pos").over(w_doc))
        .filter(
            (F.length("para") < min_chars)
            | (
                (F.col(id_col) == F.col("__min_id"))
                & (F.col("pos") == F.col("__min_pos"))
            )
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias(text_col)
    )
    # documents whose every paragraph was deduplicated away still get a
    # row (empty text) — slim id-keyed join, co-partitioned with the agg
    out = (
        df.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )
    return Frame(out, ())


def flag_contaminated(
    corpus: Frame,
    benchmark: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 13,
) -> Frame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``ngram``-gram with a benchmark/eval set (the standard
    n-gram-overlap test-set-leakage check for training corpora;
    13-gram is the common default).

    100 TB design: the benchmark side (eval sets — always small) is
    reduced to its DISTINCT gram set and broadcast; the corpus side is
    a map-side explode + broadcast semi-join, so the corpus never
    shuffles. Only the matched (id) pairs pass through one distinct
    aggregation before the flag joins back onto the corpus. The
    flag-back join carries NO broadcast hint: the hit set scales with
    corpus contamination (a majority-contaminated corpus makes it as
    big as the corpus id space), so the strategy is left to AQE, which
    still broadcasts at runtime when the hit set is actually small.
    """
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    gram = "__decon_gram"
    bench_grams = (
        benchmark.df.select(
            F.explode(_word_shingles(F.col(text_col), ngram)).alias(gram)
        )
        .distinct()
    )
    hit_ids = (
        corpus.df.select(
            F.col(id_col),
            F.explode(_word_shingles(F.col(text_col), ngram)).alias(gram),
        )
        .join(
            # Guarded hint: an eval set too big to broadcast degrades
            # to a shuffled semi-join + AQE instead of an executor OOM
            # (the hashed variant below is the sanctioned big-eval path).
            broadcast_guarded(bench_grams, what="decontamination gram set"),
            on=gram,
            how="leftsemi",
        )
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    out = corpus.df.join(hit_ids, on=id_col, how="left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )
    return Frame(out, corpus.group_vars())


def benchmark_grams(
    benchmark: Frame, text_col: str = "text", ngram: int = 13
) -> Frame:
    """The DISTINCT n-gram set of a benchmark/eval corpus, as a
    one-column (``gram``) frame — the stage-once artifact for
    decontamination sweeps: compute once, write it to parquet, and
    pass the read-back to :func:`flag_contaminated_hashed` (``grams=``)
    so each corpus sweep skips the eval-side explode+distinct
    entirely. The eval set is fixed across sweeps while the corpus
    changes, so without staging every sweep paid the eval subtree
    TWICE (hash build + exact verify — two Generates of the same
    explode in the plan)."""
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    out = (
        benchmark.df.select(
            F.explode(_word_shingles(F.col(text_col), ngram)).alias("gram")
        )
        .distinct()
    )
    return Frame(out, ())


def flag_contaminated_hashed(
    corpus: Frame,
    benchmark: Frame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 13,
    grams: Frame | None = None,
) -> Frame:
    """:func:`flag_contaminated` for benchmark-gram sets too large to
    broadcast as strings: the broadcast prefilter carries only the
    xxhash64 of each bench gram (8 bytes vs ~100 for a 13-gram), an
    order-of-magnitude smaller build side, and only the corpus grams
    that survive the hash prefilter shuffle into an EXACT string
    verification join. Hash collisions therefore cost a little extra
    verification work but can never flip a result — output is
    bit-identical to the exact path (same oracle).

    (Spark's bloom_filter_agg would compress the prefilter further but
    is an internal expression, not exposed to SQL/DataFrame in 4.x;
    a 64-bit hash set is the same prefilter idea with zero false
    positives in practice and no tuning surface.)

    ``grams=`` accepts the pre-staged distinct eval-gram set from
    :func:`benchmark_grams` (typically read back from parquet — the
    stage-once deployment shape): the eval explode+distinct subtree
    then appears in NO sweep plan at all, instead of twice per sweep
    (once under the broadcast hash build, once under the exact-verify
    join). Must have been built with the same ``ngram``; results are
    identical to the inline path by construction.
    """
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    if (benchmark is None) == (grams is None):
        raise ValueError("pass exactly one of benchmark= or grams=")
    gram, gh = "__decon_gram", "__decon_gh"
    if grams is not None:
        bench_grams = grams.df.select(F.col("gram").alias(gram))
    else:
        bench_grams = benchmark_grams(benchmark, text_col, ngram).df.select(
            F.col("gram").alias(gram)
        )
    bench_hashes = bench_grams.select(F.xxhash64(F.col(gram)).alias(gh)).distinct()
    candidates = (
        corpus.df.select(
            F.col(id_col),
            F.explode(_word_shingles(F.col(text_col), ngram)).alias(gram),
        )
        .withColumn(gh, F.xxhash64(F.col(gram)))
        .join(
            broadcast_guarded(bench_hashes, what="decontamination hash set"),
            on=gh,
            how="leftsemi",
        )
    )
    hit_ids = (
        candidates.join(bench_grams, on=gram, how="leftsemi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    out = corpus.df.join(hit_ids, on=id_col, how="left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )
    return Frame(out, corpus.group_vars())


def with_dup_ngram_frac(
    frame: Frame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Frame:
    """CORPUS-level duplicated-n-gram fraction per document: the share
    of a document's distinct k-word shingles that appear in at least
    one OTHER document (the cross-doc companion to
    ``text.with_repetition_stats``, which is within-doc only; Dolma and
    RefinedWeb gate on both).

    Plan: explode distinct shingles to 8-byte hashes, count documents
    per gram with a window over the gram key (ONE shuffle that the
    count shares — no gram-level self-join), then aggregate back to
    document grain. Gram rows are (id, hash) pairs — 16 bytes — not
    text, so the exchange stays small at corpus scale; the per-doc
    aggregate partial-combines map-side. Documents shorter than k
    words contribute their full text as a single shingle (same rule as
    ``minhash_signatures``), so every document gets a defined fraction.
    """
    grams = frame.df.select(
        F.col(id_col),
        F.explode(_word_shingles(F.col(text_col), k)).alias("g"),
    ).select(F.col(id_col), _hash64(F.col("g")).alias("gh"))
    wg = Window.partitionBy("gh")
    flagged = grams.withColumn("n_docs", F.count(F.lit(1)).over(wg))
    per_doc = (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_ngrams"
            ),
        )
        .select(
            F.col(id_col),
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.col("n_dup_ngrams").cast("long").alias("n_dup_ngrams"),
            F.round(
                F.col("n_dup_ngrams").cast("double") / F.col("n_ngrams"), 6
            ).alias("dup_ngram_frac"),
        )
    )
    return Frame(
        frame.df.join(per_doc, on=id_col, how="left"), frame.group_vars()
    )


def substring_dup_spans(
    frame: Frame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_grams: int = 1,
    max_gram_freq: int | None = None,
) -> Frame:
    """Exact-substring duplicate SPANS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for each document,
    the token-position ranges whose every ``k``-token rolling window
    also occurs in at least one OTHER document — the regions a pipeline
    can TRIM (see :func:`trim_dup_spans`) instead of dropping the whole
    document, the one dedup modality ``with_dup_ngram_frac`` (a scalar
    per-doc fraction) cannot express.

    The reference paper builds a suffix array; the distributed
    re-expression is a hashed rolling-window inverted index:

    1. positional k-gram hashes ``(doc, pos, gh)`` — map-side explode,
       16-byte rows (never the text);
    2. cross-doc test per position with ONE gram-keyed shuffle: a
       window over ``gh`` counts total occurrences and a second window
       over ``(gh, doc)`` counts within-doc occurrences — partitioning
       by ``gh`` already co-locates ``(gh, doc)``, so the second window
       adds a sort but NO exchange. A position is duplicated iff the
       gram occurs outside its own document (``cnt_all > cnt_doc`` —
       within-doc repeats alone never flag);
    3. gaps-and-islands over ``(doc, pos)`` (one doc-keyed shuffle of
       the slim duplicated positions only) merges overlapping/adjacent
       windows: a new span starts when ``pos - prev_pos > k``; the
       island aggregate reuses the doc partitioning (no third
       exchange).

    ``max_gram_freq`` is the OPT-IN hot-gram guard. Default off
    (``None``) by MEASUREMENT, not oversight: the gram-skew rehearsal
    (BENCH_REFERENCE.md r7/r8) ran the shapes head-to-head at 4M-25M
    docs — the window's hot partition is count-only integer rows
    (linear, graceful spill; 6% of wall at 20% planted boilerplate),
    while any pre-window frequency count needs its OWN pass over the
    exploded grams, costing far more than the straggler it removes
    (the agg+semi and hybrid shapes measured 2-5x total wall). Enable
    the cap when the worst case is real for your corpus — boilerplate
    grams with occurrence counts far above ``max_gram_freq``, where a
    single task's O(G) count would dominate the job. With the cap on,
    frequencies come from a partial-aggregated ``gh`` count (map-side
    combine — skew-safe) joined back (build side one row per gram;
    probe-side hot partitions are byte-splittable by AQE at true
    scale); over-cap grams short-circuit to duplicated — the LSH
    bucket-cap rule: such a gram is boilerplate whose every position
    is cross-doc duplicated anyway (documented clamp: that holds even
    in the pathological all-in-one-doc case, which a cap ≥ the corpus
    doc count rules out) — and every window partition is bounded by
    the cap, so the straggler is constant. Under-cap grams keep the
    exact test; on data with no over-cap gram the results are
    identical either way.

    Documents shorter than ``k`` tokens contribute their full text as
    the position-1 window (the ``_word_shingles`` rule), so two short
    identical documents still produce spans. Output: one row per span —
    ``(id_col, span_id, start_tok, end_tok, n_grams)`` with token
    positions 1-based inclusive (``end_tok = max_pos + k - 1``), spans
    with fewer than ``min_grams`` windows dropped."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_gram_freq is not None and max_gram_freq < 2:
        raise ValueError("max_gram_freq must be >= 2 (or None to disable)")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    gram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
    )
    pos_grams = frame.df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.cast("int").alias("pos"), _hash64(gram_at(i)).alias("gh")
                ),
            )
        ).alias("s"),
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s.gh").alias("gh"))
    if max_gram_freq is None:
        # measured-default shape: ONE gh exchange shared by both counts
        wg = Window.partitionBy("gh")
        wgd = Window.partitionBy("gh", id_col)
        dup = (
            pos_grams.withColumn("cnt_all", F.count(F.lit(1)).over(wg))
            .withColumn("cnt_doc", F.count(F.lit(1)).over(wgd))
            .filter(F.col("cnt_all") > F.col("cnt_doc"))
            .select(id_col, "pos")
        )
    else:
        # guarded shape: skew-safe aggregate count + join-back; hot
        # grams bypass the window, bounding every partition by the cap
        freq = pos_grams.groupBy("gh").agg(
            F.count(F.lit(1)).alias("__n_occ")
        )
        pg = pos_grams.join(freq, "gh")
        hot = pg.filter(F.col("__n_occ") > max_gram_freq).select(id_col, "pos")
        cold = pg.filter(F.col("__n_occ") <= max_gram_freq)
        wgd = Window.partitionBy("gh", id_col)
        dup = (
            cold.withColumn("cnt_doc", F.count(F.lit(1)).over(wgd))
            .filter(F.col("__n_occ") > F.col("cnt_doc"))
            .select(id_col, "pos")
            .unionByName(hot)
        )
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(wd)
    islands = dup.withColumn(
        "brk",
        F.when(prev.isNull() | (F.col("pos") - prev > k), 1).otherwise(0),
    ).withColumn("span_id", F.sum("brk").over(wd))
    spans = (
        islands.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + (k - 1)).cast("int").alias("end_tok"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .filter(F.col("n_grams") >= min_grams)
    )
    return Frame(spans, ())


def trim_dup_spans(
    frame: Frame,
    spans: Frame | None = None,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Frame:
    """Remove the duplicated spans from each document's text — the
    TRIM half of exact-substring dedup (the paper's remediation: cut
    the duplicated bytes, keep the unique remainder).

    ``spans`` defaults to :func:`substring_dup_spans` of the frame with
    the same ``k``. Spans collapse to one slim array per doc (a
    doc-keyed agg of (s, e) ints — co-partitioned with the span agg
    that produced them), join back onto the corpus (AQE broadcasts the
    span table when small), and the kept text is rebuilt with pure
    array ops: token i survives iff no span covers it. Documents with
    no spans pass through unchanged."""
    if spans is None:
        spans = substring_dup_spans(frame, k, text_col, id_col)
    per_doc = spans.df.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("__spans")
    )
    toks = F.split(F.col(text_col), " ")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["start_tok"]) & (i <= s["end_tok"]),
    )
    kept = F.filter(toks, lambda t, i: ~covered(i + 1))
    out = (
        frame.df.join(per_doc, on=id_col, how="left")
        .withColumn(
            text_col,
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", kept)
            ),
        )
        .drop("__spans")
    )
    return Frame(out, frame.group_vars())


def near_dedup(
    frame: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 10_000,
    max_iter: int = 25,
    keep_by: str | None = None,
) -> Frame:
    """End-to-end fuzzy dedup: MinHash -> LSH candidate pairs ->
    connected components -> keep one representative per near-dup
    cluster, all other rows unchanged.

    The representative is the min-id member by default; ``keep_by=``
    names a column of ``frame`` and keeps the HIGHEST-valued member
    instead (ties by min id, NULL scores last) — the quality-aware
    selection the FineWeb/RefinedWeb pipelines use so dedup removes
    the WORST copy of a duplicated page, not an arbitrary one.
    Compose with ``with_quality_score`` / ``with_perplexity_bucket``
    / any scorer that adds a numeric column.

    The one-call composition of ``minhash_signatures`` /
    ``minhash_lsh_pairs`` / ``dedup_clusters`` a pipeline actually
    runs. Non-representatives are removed with a single anti-join on
    the id — the loser set is bounded by the pair set, which the LSH
    bucket cap already keeps skew-safe, and the corpus itself is never
    shuffled (the anti-join build side is (id) only; the ``keep_by``
    argmax is a window over CLUSTER MEMBERS only, partitioned by
    cluster id — never a global window, never the corpus).
    """
    pairs = minhash_lsh_pairs(
        frame, text_col, id_col, n_hashes, bands, shingle_k, max_bucket_size
    )
    labels = dedup_clusters(pairs, max_iter=max_iter)
    if keep_by is None:
        losers = labels.df.filter(
            F.col("cluster_id") != F.col("doc_id")
        ).select(F.col("doc_id").alias(id_col))
    else:
        if keep_by not in frame.df.columns:
            raise ValueError(
                f"keep_by column {keep_by!r} is not in the frame "
                f"({frame.df.columns})"
            )
        from pyspark.sql import Window

        scored = labels.df.join(
            frame.df.select(
                F.col(id_col).alias("doc_id"), F.col(keep_by).alias("__kb")
            ),
            "doc_id",
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("__kb").desc_nulls_last(), F.col("doc_id")
        )
        losers = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > 1)
            .select(F.col("doc_id").alias(id_col))
        )
    return Frame(
        frame.df.join(losers, on=id_col, how="left_anti"), frame.group_vars()
    )


def flag_cross_duplicates(
    new: Frame,
    existing: Frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int | None = 10_000,
) -> Frame:
    """Incremental dedup of an incoming shard against an existing
    corpus — the production crawl-ingest pattern (the full corpus is
    never re-deduped; each new shard is checked against what's
    already kept).

    Adds to ``new``: ``is_exact_dup`` (normalized-text fingerprint
    already present in ``existing``) and ``is_near_dup`` (shares an
    LSH band bucket with ``existing``). Both checks are semi-joins on
    8-byte keys (fingerprint md5 / band hash) — documents never ride a
    shuffle. The bucket cap applies to EXISTING-side band buckets:
    a degenerate boilerplate bucket in the reference corpus would
    otherwise mark every incoming doc that touches it, and such
    content is exact-dedup's job anyway.
    """

    def fp(df):
        return F.md5(
            F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
        )

    ex_fp = existing.df.select(fp(existing.df).alias("__fp")).distinct()
    new_sigs = minhash_signatures(new, text_col, id_col, n_hashes, shingle_k).df
    ex_sigs = minhash_signatures(
        existing, text_col, id_col, n_hashes, shingle_k
    ).df
    nb = _explode_band_hashes(new_sigs, id_col, n_hashes, bands)
    eb = _explode_band_hashes(ex_sigs, id_col, n_hashes, bands)
    ebuckets = eb.groupBy("band", "bh").count()
    if max_bucket_size is not None:
        ebuckets = ebuckets.filter(F.col("count") <= max_bucket_size)
    near_ids = (
        nb.join(ebuckets.select("band", "bh"), ["band", "bh"], "left_semi")
        .select(F.col(id_col))
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    flagged = (
        new.df.withColumn("__fp_new", fp(new.df))
        .join(
            ex_fp.withColumn("__exact", F.lit(True)),
            F.col("__fp_new") == F.col("__fp"),
            "left",
        )
        .drop("__fp", "__fp_new")
        .join(near_ids, on=id_col, how="left")
        .withColumn("is_exact_dup", F.coalesce(F.col("__exact"), F.lit(False)))
        .withColumn("is_near_dup", F.coalesce(F.col("__near"), F.lit(False)))
        .drop("__exact", "__near")
    )
    return Frame(flagged, new.group_vars())
