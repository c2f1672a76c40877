"""Semantic tests for the training-pipeline operators: dedup actually
finds planted duplicates, minhash approximates jaccard, simhash is
hamming-close for near-dups, similarity search returns the planted
neighbor."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.pipeline import dedup as D
from cuplyr_spark.pipeline import similarity as S
from cuplyr_spark.pipeline import text as TX

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to the old mill by the river where it sleeps all day long"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token change
FAR = "completely different words about spark query engines and columnar execution at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, NEAR),  # near dup of 0
        (3, FAR),
        (4, "short text"),
    ]
    return from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_finds_planted_dup(docs):
    fp = TX.with_fingerprint(docs)
    out = D.exact_dedup(fp, "fingerprint", id_col="doc_id").collect()
    assert len(out) == 4  # 5 docs, one exact dup collapsed
    dup_group = out[out.n_copies == 2]
    assert dup_group["doc_id"].tolist() == [0]  # min id representative


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = D.minhash_signatures(docs).collect().set_index("doc_id")
    assert (sigs.loc[0] == sigs.loc[1]).all()
    # near-dup shares most signature components; far doc does not
    near_match = (sigs.loc[0] == sigs.loc[2]).sum()
    far_match = (sigs.loc[0] == sigs.loc[3]).sum()
    assert near_match >= 4
    assert far_match <= 1


def test_minhash_lsh_pairs_candidates(docs):
    pairs = D.minhash_lsh_pairs(docs).collect()
    tuples = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert (0, 1) in tuples  # exact dup always a candidate
    assert (0, 2) in tuples or (1, 2) in tuples  # near-dup bands collide
    assert (0, 3) not in tuples  # unrelated docs don't


def test_simhash_hamming(docs):
    sigs = D.simhash_signatures(docs).collect().set_index("doc_id")

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert hamming(sigs.loc[0, "simhash"], sigs.loc[1, "simhash"]) == 0
    assert hamming(sigs.loc[0, "simhash"], sigs.loc[2, "simhash"]) <= 4
    assert hamming(sigs.loc[0, "simhash"], sigs.loc[3, "simhash"]) >= 4


def test_ngram_jaccard(docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.4).collect()
    lookup = {(r.id_a, r.id_b): r.jaccard for r in pairs.itertuples()}
    assert lookup[(0, 1)] == 1.0
    assert (0, 2) in lookup and 0.4 <= lookup[(0, 2)] < 1.0


def test_cosine_topk_planted_neighbor(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=8).astype("float32")
    rows = [(0, base.tolist(), 0), (1, (base + 0.01).tolist(), 0)]
    for i in range(2, 30):
        rows.append((i, rng.normal(size=8).astype("float32").tolist(), 1))
    emb = from_pandas(
        spark, pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    out = S.cosine_topk(emb, k=1, query_filter="vec_id == 0").collect()
    assert out["neighbor_id"].tolist() == [1]
    assert out["score"].iloc[0] > 0.999


def test_lsh_recall_on_planted_neighbor(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=16).astype("float32")
    rows = [(0, base.tolist()), (1, (base * 1.001).tolist())]
    for i in range(2, 50):
        rows.append((i, rng.normal(size=16).astype("float32").tolist()))
    emb = from_pandas(spark, pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = S.lsh_cosine_topk(emb, k=3, n_planes=4, query_filter="vec_id == 0").collect()
    # near-identical vector must land in the same hyperplane bucket
    assert 1 in out["neighbor_id"].tolist()


def test_lang_id_marker_scoring(spark):
    docs = from_pandas(
        spark,
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "the cat and the dog is of the house to go",
                    "der hund und die katze ist nicht hier und der",
                ],
            }
        ),
    )
    out = TX.with_lang_id(docs).collect().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "de"


def test_quality_score_ranges(spark):
    docs = from_pandas(
        spark,
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "the quick brown fox and the lazy dog of the farm in the morning",
                    "x",
                ],
            }
        ),
    )
    out = TX.with_quality_score(docs).collect().set_index("doc_id")
    assert 0.0 <= out.loc[1, "quality"] < out.loc[0, "quality"] <= 1.0


def test_token_stats(spark):
    docs = from_pandas(spark, pd.DataFrame({"doc_id": [0], "text": ["a bb ccc"]}))
    out = TX.with_token_stats(docs).collect()
    assert out["n_tokens"].tolist() == [3]
    assert out["n_chars_computed"].tolist() == [8]
    assert out["avg_token_len"].tolist() == [2.0]


def test_dedup_clusters_connected_components(spark):
    pairs = from_pandas(
        spark,
        pd.DataFrame(
            # chain 1-2-3 (one cluster), island 7-9
            {"id_a": [1, 2, 7], "id_b": [2, 3, 9]}
        ),
    )
    out = D.dedup_clusters(pairs).collect().sort_values("doc_id")
    labels = out.set_index("doc_id")["cluster_id"].to_dict()
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_join_key_type_validation(spark):
    l = from_pandas(spark, pd.DataFrame({"k": ["a"], "x": [1]}))
    r = from_pandas(spark, pd.DataFrame({"k": [1], "y": [2]}))
    import pytest as _pt

    with _pt.raises(TypeError, match="incompatible key types"):
        l.inner_join(r, by="k")


def test_deterministic_split_stable_and_disjoint(spark):
    from cuplyr_spark.pipeline.sampling import deterministic_split, with_split_label

    docs = from_pandas(
        spark, pd.DataFrame({"doc_id": list(range(1000)), "x": list(range(1000))})
    )
    splits = deterministic_split(docs, "doc_id", {"train": 0.8, "test": 0.2})
    train_ids = set(splits["train"].pull("doc_id"))
    test_ids = set(splits["test"].pull("doc_id"))
    assert not train_ids & test_ids
    assert len(train_ids) + len(test_ids) == 1000
    assert 0.75 <= len(train_ids) / 1000 <= 0.85  # hash-uniformity
    # reproducible: same membership on a second evaluation
    assert set(splits["train"].pull("doc_id")) == train_ids
    # labeled single-pass variant agrees
    labeled = with_split_label(docs, "doc_id", {"train": 0.8, "test": 0.2}).collect()
    assert set(labeled[labeled.split == "train"]["doc_id"]) == train_ids


def test_stratified_hash_sample(spark):
    from cuplyr_spark.pipeline.sampling import stratified_hash_sample

    pdf = pd.DataFrame(
        {"doc_id": range(2000), "lang": ["en"] * 1600 + ["de"] * 400}
    )
    out = stratified_hash_sample(
        from_pandas(spark, pdf), "doc_id", "lang", {"en": 0.25, "de": 1.0}
    ).collect()
    en = (out.lang == "en").sum()
    de = (out.lang == "de").sum()
    assert de == 400  # fraction 1.0 keeps everything
    assert 0.20 * 1600 <= en <= 0.30 * 1600


def test_vector_centroids(spark):
    from cuplyr_spark.pipeline.similarity import vector_centroids

    pdf = pd.DataFrame(
        {
            "label": ["a", "a", "b"],
            "embedding": [[1.0, 3.0], [3.0, 5.0], [10.0, 0.0]],
        }
    )
    out = vector_centroids(from_pandas(spark, pdf), "label").collect_rows()
    got = {r["label"]: list(r["centroid"]) for r in out}
    assert got == {"a": [2.0, 4.0], "b": [10.0, 0.0]}


def test_ivf_recall_vs_bruteforce(spark):
    from cuplyr_spark.pipeline.similarity import cosine_topk, ivf_cosine_topk
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(emb, k=5, query_filter="vec_id < 5").collect()
    approx = ivf_cosine_topk(
        emb, k=5, n_cells=8, n_probe=4, query_filter="vec_id < 5"
    ).collect()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every approx score must equal the exact score for that pair
    es = {(r.query_id, r.neighbor_id): r.score for r in exact.itertuples()}
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in es:
            assert abs(es[(r.query_id, r.neighbor_id)] - r.score) < 1e-9


def test_ivf_staged_centroids_identical_to_inline(spark, tmp_path):
    """VERDICT r5 item 3: the centroids= stage-once path (train once,
    parquet round-trip, reuse) must return exactly the inline path's
    results — same contract as sigs= and pre_quantized=."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.similarity import ivf_centroids, ivf_cosine_topk
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    inline = ivf_cosine_topk(
        emb, k=5, n_cells=8, n_probe=3, refine_iters=1, query_filter="vec_id < 5"
    ).collect()

    cdir = str(tmp_path / "centroids")
    ivf_centroids(emb, n_cells=8, refine_iters=1).df.write.parquet(cdir)
    staged = ivf_cosine_topk(
        emb,
        k=5,
        n_probe=3,
        query_filter="vec_id < 5",
        centroids=Frame(spark.read.parquet(cdir), ()),
    ).collect()

    key = lambda df: sorted(
        map(tuple, df[["query_id", "neighbor_id", "score", "rank"]].values)
    )
    assert key(inline) == key(staged)


def test_gopher_flags_semantics(spark):
    long_good = " ".join(["lorem", "ipsum", "dolor", "sitam"] * 15)  # 60 words, mwl 5
    symbol_heavy = " ".join(["###"] * 60)
    bullets = "\n".join(f"- item {i}" for i in range(10))
    rows = [(0, long_good), (1, symbol_heavy), (2, bullets), (3, "tiny doc")]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TX.with_gopher_flags(f).collect().set_index("doc_id")
    assert bool(out.loc[0, "gopher_pass"])
    assert out.loc[0, "n_words"] == 60
    assert out.loc[0, "mean_word_len"] == 5.0
    # 60 '#' runs / 60 words = 1.0 symbol ratio -> fail
    assert not bool(out.loc[1, "gopher_pass"])
    assert out.loc[1, "alpha_word_ratio"] == 0.0
    assert out.loc[2, "bullet_line_ratio"] == 1.0
    # 8 words < 50 -> fail
    assert not bool(out.loc[3, "gopher_pass"])


def test_repetition_stats_known_answers(spark):
    # "a b a b a" -> grams: [a b, b a, a b, b a]; top count 2 * len 3 = 6 chars / 9
    rep = "a b a b a"
    dup_lines = "x\ny\nx\nz"  # 4 lines, 3 distinct -> 1/4
    rows = [(0, rep), (1, dup_lines), (2, "single")]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TX.with_repetition_stats(f).collect().set_index("doc_id")
    assert out.loc[0, "top_2gram_char_frac"] == pytest.approx(6 / 9, abs=1e-6)
    assert out.loc[1, "dup_line_frac"] == 0.25
    # one token -> no grams -> 0.0, not an error
    assert out.loc[2, "top_2gram_char_frac"] == 0.0
    assert out.loc[2, "dup_line_frac"] == 0.0


def test_pii_scrub_patterns(spark):
    rows = [
        (0, "mail a.b+c@ex-ample.co.uk and raw 192.168.0.1 here"),
        (1, "call +4915123456789 or 555-867-5309 now"),
        (2, "version 1.2.3.4.5 is not an ip, 1.2 neither"),
        (3, "clean text with no pii at all"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TX.with_pii_scrub(f).collect().set_index("doc_id")
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_ips"] == 1
    assert "<EMAIL>" in out.loc[0, "text_scrubbed"]
    assert "<IP>" in out.loc[0, "text_scrubbed"]
    assert out.loc[1, "n_phones"] == 2
    assert out.loc[1, "text_scrubbed"] == "call <PHONE> or <PHONE> now"
    # dotted version strings: the 4-octet prefix does match the \b ipv4
    # pattern (documented limitation), bare 1.2 must not
    assert out.loc[2, "n_emails"] == 0 and out.loc[2, "n_phones"] == 0
    assert out.loc[3, "text_scrubbed"] == "clean text with no pii at all"


def test_decontamination_flags_planted_overlap(docs, spark):
    # benchmark = the BASE text; docs 0/1 (exact) and 2 (one-token change,
    # still sharing 5-grams) must flag; FAR and the short doc must not
    bench = from_pandas(spark, pd.DataFrame([(100, BASE)], columns=["doc_id", "text"]))
    out = D.flag_contaminated(docs, bench, ngram=5).collect().set_index("doc_id")
    assert bool(out.loc[0, "contaminated"]) and bool(out.loc[1, "contaminated"])
    assert bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])
    assert not bool(out.loc[4, "contaminated"])


def test_mixture_resample_proportions(spark):
    from cuplyr_spark.pipeline.sampling import resample_to_mixture

    rows = [(i, "a" if i % 2 == 0 else ("b" if i % 4 == 1 else "c")) for i in range(4000)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "source"]))
    # a: 2000, b: 1000, c: 1000 -> target 25/25/50: binding group is c
    # (1000/0.5=2000 = min), so keep all of c, hash-sample a to ~500, b to ~500
    out = resample_to_mixture(f, "source", {"a": 0.25, "b": 0.25, "c": 0.5}).collect()
    sizes = out.groupby("source").size()
    assert sizes["c"] == 1000
    assert abs(sizes["a"] - 500) < 80 and abs(sizes["b"] - 500) < 80
    # deterministic: second run identical
    again = resample_to_mixture(f, "source", {"a": 0.25, "b": 0.25, "c": 0.5}).collect()
    assert sorted(out.doc_id) == sorted(again.doc_id)
    with pytest.raises(ValueError):
        resample_to_mixture(f, "source", {"a": 0.2, "b": 0.2})


def test_tfidf_top_terms_known_values(spark):
    import math

    rows = [(0, "a a b"), (1, "a c")]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TX.tf_idf_top_terms(f, top_k=2).collect()
    idf_rare = math.log(3 / 2) + 1  # df=1, N=2
    d0 = out[out.doc_id == 0].sort_values("rank")
    # doc0: tf(a)=2, idf(a)=ln(3/3)+1=1 -> 2.0 beats b's 1.405
    assert d0.term.tolist() == ["a", "b"]
    assert d0.tfidf.tolist() == [2.0, round(idf_rare, 6)]
    d1 = out[out.doc_id == 1].sort_values("rank")
    # doc1: rare c outranks common a
    assert d1.term.tolist() == ["c", "a"]


def test_mixture_resample_binding_group_kept_exactly(spark):
    """When group sizes already match the targets, every row is the
    binding group and must be kept whole — the FP keep-rate can land at
    0.999..., so the threshold is epsilon-bumped and clamped to
    GRANULARITY (ADVICE r2)."""
    from cuplyr_spark.pipeline.sampling import resample_to_mixture

    rows = [(i, "a" if i < 300 else "b") for i in range(900)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = resample_to_mixture(f, "source", {"a": 1 / 3, "b": 2 / 3}).collect()
    assert len(out) == 900


def test_lsh_bucket_skew_guard(spark):
    """Degenerate corpus (mass of identical boilerplate): over-cap
    buckets are dropped from candidate generation so the self-join
    stays bounded, while normal small buckets still pair (VERDICT r2
    #3). Size-1 pruning never changes results."""
    boiler = [(i, "the same boilerplate text repeated everywhere") for i in range(200)]
    near = [
        (1000, "a genuinely unique document about spark partitioning"),
        (1001, "a genuinely unique document about spark partitioning!"),
        (1002, "completely different content on another topic entirely"),
    ]
    f = from_pandas(
        spark, pd.DataFrame(boiler + near, columns=["doc_id", "text"])
    )
    out = D.minhash_lsh_pairs(f, max_bucket_size=50).collect()
    tuples = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    # the 200-doc boilerplate bucket (> cap) contributes no pairs...
    assert not any(a < 1000 and b < 1000 for a, b in tuples)
    # ...but the small near-dup bucket still does
    assert (1000, 1001) in tuples
    # uncapped, the degenerate bucket would explode quadratically
    unguarded = D.minhash_lsh_pairs(f, max_bucket_size=None).collect()
    assert len(unguarded) >= 200 * 199 // 2


def test_embedding_near_dup_auto_planes_and_cap(spark):
    """LSH-bucketed near-dup with corpus-scaled plane count and the
    bucket cap: identical vectors all land in one bucket; with the cap
    below the bucket size no pairs emerge, with it disabled they do."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    capped = S.embedding_near_dup_pairs(f, threshold=0.9, max_bucket_size=10)
    assert len(capped.collect()) == 0
    open_ = S.embedding_near_dup_pairs(f, threshold=0.9, max_bucket_size=None)
    assert len(open_.collect()) == 30 * 29 // 2


def test_decontamination_hashed_matches_exact(docs, spark):
    """The hash-compacted prefilter variant must be bit-identical to
    the exact path (collisions only add verification work)."""
    bench = from_pandas(spark, pd.DataFrame([(100, BASE)], columns=["doc_id", "text"]))
    exact = (
        D.flag_contaminated(docs, bench, ngram=5)
        .collect()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    hashed = (
        D.flag_contaminated_hashed(docs, bench, ngram=5)
        .collect()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(hashed, exact)


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Corpus-wide paragraph dedup: a boilerplate paragraph survives
    only at its (min doc, min pos) occurrence; unique paragraphs and
    sub-min_chars paragraphs survive everywhere; fully-deduplicated
    docs keep a row with empty text."""
    rows = [
        (1, "intro one\nBOILERPLATE LINE\nbody one"),
        (2, "BOILERPLATE LINE\nintro two\nBOILERPLATE LINE"),
        (3, "BOILERPLATE LINE"),
        (4, "intro four\n\nbody four"),  # empty para preserved
        (5, "intro five\n\nbody five"),  # second empty para also preserved
    ]
    fr = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = (
        D.dedup_paragraphs(fr).collect().set_index("doc_id")["text"].to_dict()
    )
    assert out[1] == "intro one\nBOILERPLATE LINE\nbody one"  # first occurrence
    assert out[2] == "intro two"  # both copies removed (doc 1 owns it)
    assert out[3] == ""  # everything removed, row kept
    assert out[4] == "intro four\n\nbody four"
    assert out[5] == "intro five\n\nbody five"  # empty line not deduped


def test_paragraph_dedup_within_doc_repeat(spark):
    """A paragraph repeated within its owning (min) doc keeps only the
    first position."""
    rows = [(1, "same para\nother\nsame para")]
    fr = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.dedup_paragraphs(fr).collect()
    assert out["text"].tolist() == ["same para\nother"]


def test_token_rarity_known_values(spark):
    """Hand-checked corpus: df('a')=3, df('b')=2, df('c')=1."""
    rows = [(1, "a b"), (2, "a a c"), (3, "a b")]
    fr = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = (
        TX.with_token_rarity(fr).collect().set_index("doc_id").sort_index()
    )
    assert out["n_tokens"].tolist() == [2, 3, 2]
    assert out["n_distinct_tokens"].tolist() == [2, 2, 2]
    # doc1: df(a)+df(b)=3+2=5; doc2: 3+3+1=7; doc3: 5
    assert out["sum_token_df"].tolist() == [5, 7, 5]


def test_decontamination_majority_contaminated(spark):
    """A heavily contaminated corpus makes the hit-id set as large as
    the corpus itself — the flag-back join must stay correct with no
    broadcast hint on it (strategy left to AQE; an explicit hint there
    is the oversized-broadcast scale hazard removed in r5). 90% of
    docs share the benchmark passage; both paths must agree."""
    n = 400
    rows = [
        (
            i,
            BASE + f" tail {i}" if i % 10 != 0 else f"totally unrelated words {i} " * 6,
        )
        for i in range(n)
    ]
    corpus = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = from_pandas(
        spark, pd.DataFrame([(100, BASE)], columns=["doc_id", "text"])
    )
    for fn in (D.flag_contaminated, D.flag_contaminated_hashed):
        out = fn(corpus, bench, ngram=5).collect().set_index("doc_id")
        assert int(out["contaminated"].sum()) == n - n // 10
        assert not out.loc[0, "contaminated"]  # i % 10 == 0 rows clean
        assert bool(out.loc[1, "contaminated"])


def test_paragraph_dedup_metachar_separator(spark):
    """sep goes to F.split as a Java regex but to array_join as a
    literal; the r5 fix regex-quotes it so metachar separators ('|',
    '.') split literally and round-trip exactly."""
    rows = [
        (0, "dup para|unique zero"),
        (1, "dup para|unique one"),
        (2, "all mine here"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = (
        D.dedup_paragraphs(f, sep="|")
        .collect()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert out[0] == "dup para|unique zero"   # first occurrence keeps it
    assert out[1] == "unique one"             # later occurrence drops it
    assert out[2] == "all mine here"


def test_source_stats_dup_rate_and_gate(spark):
    """Planted duplicate docs in one source push its dup rate over the
    gate; a short-doc source fails the mean-token floor; the clean
    source survives with exact stats."""
    rows = [
        (0, "alpha beta gamma delta", "good"),
        (1, "epsilon zeta eta theta", "good"),
        (2, "same text here today", "dupey"),
        (3, "same text here today", "dupey"),
        (4, "same text here today", "dupey"),
        (5, "other words entirely now", "dupey"),
        (6, "tiny", "short"),
        (7, "also tiny", "short"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    stats = (
        TX.with_source_stats(f)
        .collect()
        .drop_duplicates("source")
        .set_index("source")
    )
    assert stats.loc["good", "src_dup_rate"] == 0.0
    assert stats.loc["good", "src_mean_tokens"] == 4.0
    assert stats.loc["dupey", "src_dup_rate"] == 0.5  # 2 uniq / 4 docs
    assert stats.loc["short", "src_mean_tokens"] == 1.5

    kept = TX.filter_by_source_quality(
        f, max_dup_rate=0.4, min_mean_tokens=2.0
    ).collect()
    assert sorted(kept["source"].unique()) == ["good"]
    assert sorted(kept["doc_id"]) == [0, 1]


# -- round-5 additions: chunking, classifier, cross-doc dup n-grams,
#    quantization, collated sort ---------------------------------------


def test_chunk_documents_covers_text_with_overlap(spark):
    text = "abcdefghij" * 10  # 100 chars
    f = from_pandas(spark, pd.DataFrame({"doc_id": [1], "text": [text]}))
    out = TX.chunk_documents(f, size=40, overlap=10).collect()
    # stride 30: starts 1, 31, 61 (start <= len-overlap = 90)
    assert out["chunk_id"].tolist() == [0, 1, 2]
    chunks = out["chunk_text"].tolist()
    assert chunks[0] == text[0:40]
    assert chunks[1] == text[30:70]
    assert chunks[2] == text[60:100]
    # consecutive chunks overlap by exactly `overlap` chars
    assert chunks[0][-10:] == chunks[1][:10]


def test_chunk_documents_short_and_empty_docs(spark):
    f = from_pandas(
        spark, pd.DataFrame({"doc_id": [1, 2], "text": ["tiny", ""]})
    )
    out = TX.chunk_documents(f, size=100, overlap=20).collect()
    assert len(out) == 2  # one chunk each
    assert out.set_index("doc_id")["chunk_text"].to_dict() == {1: "tiny", 2: ""}


def test_chunk_documents_rejects_bad_overlap(spark):
    f = from_pandas(spark, pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        TX.chunk_documents(f, size=10, overlap=10)


def test_linear_classifier_deterministic_and_bounded(docs):
    out = TX.score_linear_classifier(docs, dims=64).collect()
    again = TX.score_linear_classifier(docs, dims=64).collect()
    assert out["clf_logit"].tolist() == again["clf_logit"].tolist()
    # mean of [-1,1] weights stays in [-1,1]
    assert out["clf_logit"].abs().max() <= 1.0
    assert (out["clf_keep"] == (out["clf_logit"] > 0)).all()
    # identical texts score identically
    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "clf_logit"] == by_id.loc[1, "clf_logit"]


def test_dup_ngram_frac_flags_cross_doc_overlap(docs):
    out = (
        D.with_dup_ngram_frac(docs, k=3)
        .collect()
        .set_index("doc_id")
    )
    # docs 0 and 1 are byte-identical: every 3-gram is shared
    assert out.loc[0, "dup_ngram_frac"] == 1.0
    assert out.loc[1, "dup_ngram_frac"] == 1.0
    # doc 2 differs by one token: most (but not all) 3-grams shared
    assert 0.5 < out.loc[2, "dup_ngram_frac"] < 1.0
    # doc 3 shares nothing
    assert out.loc[3, "dup_ngram_frac"] == 0.0
    # short doc contributes its full text as one shingle
    assert out.loc[4, "n_ngrams"] == 1


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    vecs = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.001, 0.002, -0.003, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # all-zero edge
    ]
    f = from_pandas(spark, pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    out = S.quantize_embeddings(f).collect().set_index("vec_id")
    q1, s1 = out.loc[1, "qvec"], out.loc[1, "qscale"]
    assert max(abs(int(v)) for v in q1) == 127
    # dequantized values within half a quantization step
    orig = [0.5, -1.0, 0.25, 0.0]
    for o, q in zip(orig, q1):
        assert abs(o - int(q) * s1) <= s1 / 2 + 1e-9
    assert [int(v) for v in out.loc[3, "qvec"]] == [0, 0, 0, 0]
    assert out.loc[3, "qscale"] == 0.0


def test_quantized_topk_agrees_with_exact_topk(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, rng.randn(16).astype(float).tolist()) for i in range(60)]
    f = from_pandas(spark, pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    exact = S.cosine_topk(f, k=3, query_filter="vec_id < 3").collect()
    quant = S.quantized_cosine_topk(f, k=3, query_filter="vec_id < 3").collect()
    # int8 quantization preserves neighbor rankings on random vectors:
    # top-1 neighbor matches, top-3 sets mostly overlap
    for qid in range(3):
        e = exact[exact.query_id == qid].sort_values("rank")["neighbor_id"].tolist()
        q = quant[quant.query_id == qid].sort_values("rank")["neighbor_id"].tolist()
        assert e[0] == q[0]
        assert len(set(e) & set(q)) >= 2


def test_collated_arrange_case_insensitive(spark):
    from cuplyr_spark import collate

    f = from_pandas(
        spark,
        pd.DataFrame(
            {"id": [1, 2, 3, 4], "s": ["BETA", "alpha", "Alpha", "beta"]}
        ),
    )
    out = f.arrange(collate("s"), "id").collect()
    # case-insensitive: both alphas before both betas; ties by id
    assert out["s"].tolist() == ["alpha", "Alpha", "BETA", "beta"]


def test_c4_line_clean_rules(spark):
    f = from_pandas(
        spark,
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "A good sentence right here.\nshort\nno terminal punct line\n"
                    "Another proper sentence!\nthe javascript cookie line is bad.",
                    "code { block } here\nlorem ipsum dolor sit.",
                ],
            }
        ),
    )
    out = TX.clean_lines_c4(f).collect().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 5
    assert out.loc[1, "n_kept_lines"] == 2  # terminal punct + >=3 words, no js
    assert out.loc[1, "text_clean"] == (
        "A good sentence right here.\nAnother proper sentence!"
    )
    assert bool(out.loc[2, "has_brace"]) and bool(out.loc[2, "has_lorem"])
    # all-filtered doc yields empty string, not NULL
    g = from_pandas(spark, pd.DataFrame({"doc_id": [9], "text": ["nope"]}))
    got = TX.clean_lines_c4(g).collect()
    assert got["text_clean"].tolist() == [""]


def test_normalize_url_rules(spark):
    from pyspark.sql import functions as F

    cases = {
        # host case + www + fragment + tracking param
        "HTTPS://WWW.Example.COM/Page/1?utm_source=x#frag": "https://example.com/Page/1",
        # path case preserved
        "https://example.com/Page/1": "https://example.com/Page/1",
        # trailing slash
        "https://example.com/Page/1/": "https://example.com/Page/1",
        # non-tracking params survive; tracking tail stripped
        "http://other.org/a?id=3&utm_campaign=z": "http://other.org/a?id=3",
        # utm first, real param second: leading ? re-attaches
        "http://a.io/p?utm_x=1": "http://a.io/p",
        # ADVICE r5: tracked param LEADS the query string — the '?'
        # must survive for the real param, so both orders converge
        "http://a.io/p?utm_source=t&x=1": "http://a.io/p?x=1",
        "http://a.io/p?x=1&utm_source=t": "http://a.io/p?x=1",
        # two leading tracked params then a real one
        "http://a.io/p?utm_a=1&utm_b=2&x=1": "http://a.io/p?x=1",
        # tracked params only
        "http://a.io/p?utm_a=1&utm_b=2": "http://a.io/p",
        # tracked leading, gclid trailing, real in the middle
        "http://a.io/p?utm_a=1&x=1&gclid=g": "http://a.io/p?x=1",
    }
    f = from_pandas(
        spark, pd.DataFrame({"url": list(cases)})
    )
    got = f.df.withColumn("n", TX.normalize_url(F.col("url"))).collect()
    for row in got:
        assert row["n"] == cases[row["url"]], (row["url"], row["n"])


def test_dedup_by_url_groups_equivalent_urls(spark):
    f = from_pandas(
        spark,
        pd.DataFrame(
            {
                "doc_id": [3, 1, 2, 9],
                "url": [
                    "https://example.com/x",
                    "HTTPS://WWW.EXAMPLE.COM/x#top",
                    "https://example.com/x?utm_source=a",
                    "https://example.com/y",
                ],
            }
        ),
    )
    out = TX.dedup_by_url(f).collect().sort_values("url_norm").reset_index(drop=True)
    assert out["n_copies"].tolist() == [3, 1]
    assert out["doc_id"].tolist() == [1, 9]  # min-id winner


def test_lsh_pairs_precomputed_sigs_identical(docs):
    """The staged-signatures path (compute once, reuse) must produce
    exactly the pairs of the recompute path."""
    direct = D.minhash_lsh_pairs(docs).collect()
    sigs = D.minhash_signatures(docs)
    staged = D.minhash_lsh_pairs(docs, sigs=sigs).collect()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values))
    assert key(direct) == key(staged)
    with pytest.raises(ValueError, match="lack columns"):
        D.minhash_lsh_pairs(docs, n_hashes=8, sigs=D.minhash_signatures(docs, n_hashes=4))


def test_near_dedup_keeps_one_per_cluster(docs):
    out = D.near_dedup(docs).collect()
    kept = sorted(out["doc_id"].tolist())
    # docs 0/1 byte-identical and 2 a near-dup: one survivor (min id 0)
    assert 0 in kept
    assert 1 not in kept
    assert 2 not in kept
    # unrelated docs untouched
    assert 3 in kept and 4 in kept
    # all original columns preserved
    assert set(out.columns) == {"doc_id", "text"}


def test_flag_cross_duplicates(spark):
    existing = from_pandas(
        spark, pd.DataFrame({"doc_id": [100, 101], "text": [BASE, FAR]})
    )
    new = from_pandas(
        spark,
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [BASE, NEAR, "totally novel content nothing shared"],
            }
        ),
    )
    out = (
        D.flag_cross_duplicates(new, existing)
        .collect()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "is_exact_dup"]) and bool(out.loc[1, "is_near_dup"])
    assert not bool(out.loc[2, "is_exact_dup"])
    assert bool(out.loc[2, "is_near_dup"])  # one-token change shares bands
    assert not bool(out.loc[3, "is_exact_dup"])
    assert not bool(out.loc[3, "is_near_dup"])


def test_nest_join_packs_and_empty(spark):
    x = from_pandas(spark, pd.DataFrame({"k": [1, 2, 3], "a": ["p", "q", "r"]}))
    y = from_pandas(
        spark,
        pd.DataFrame({"k": [1, 1, 2], "v": [10, 5, 7], "w": ["m", "n", "o"]}),
    )
    out = x.nest_join(y, by="k").collect().set_index("k").sort_index()
    assert [(r["v"], r["w"]) for r in out.loc[1, "y"]] == [(5, "n"), (10, "m")]
    assert [(r["v"], r["w"]) for r in out.loc[2, "y"]] == [(7, "o")]
    assert list(out.loc[3, "y"]) == []  # no match -> empty, not NULL
    with pytest.raises(ValueError, match="only key columns"):
        x.nest_join(from_pandas(spark, pd.DataFrame({"k": [1]})), by="k")


def test_semantic_dedup_survivors(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(8)
    rows = [
        (1, 0, (base + rng.randn(8) * 0.001).tolist()),   # near-dup of 2
        (2, 0, base.tolist()),
        (3, 0, rng.randn(8).tolist()),                     # distinct
        (4, 1, rng.randn(8).tolist()),                     # different block
    ]
    f = from_pandas(
        spark, pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    )
    out = S.semantic_dedup(f, threshold=0.99, block_col="label").collect()
    kept = sorted(out["vec_id"].tolist())
    assert kept == [1, 3, 4]  # min-id of the (1,2) cluster survives
    assert set(out.columns) == {"vec_id", "label", "embedding"}


def test_dedup_clusters_long_chain_converges(spark):
    """Regression (r5, caught by the sf0.1 oracle gate): a long path
    graph must fully converge to the global min label — the iteration
    cap used to silently under-merge deep chains. Pointer jumping
    makes the reachable horizon grow geometrically, so a 300-node
    chain closes well inside the default cap."""
    n = 300
    pairs = from_pandas(
        spark,
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)}),
    )
    out = D.dedup_clusters(pairs).collect()
    assert len(out) == n
    assert (out["cluster_id"] == 0).all()


def test_dedup_clusters_warns_at_cap(spark):
    import warnings as _w

    n = 40
    pairs = from_pandas(
        spark,
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)}),
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        D.dedup_clusters(pairs, max_iter=2).collect()
    assert any("before convergence" in str(x.message) for x in rec)


def test_quantized_topk_staged_equals_on_the_fly(spark):
    """The stage-once pattern: scoring against parqueted qvec codes
    must equal on-the-fly quantization (cosine is scale-invariant, so
    dropping qscale changes nothing)."""
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = [(i, rng.randn(12).astype(float).tolist()) for i in range(40)]
    f = from_pandas(spark, pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    queries = from_pandas(
        spark, pd.DataFrame(vecs[:3], columns=["vec_id", "embedding"])
    )
    fly = S.quantized_cosine_topk(f, k=3, queries=queries).collect()
    from pyspark.sql import functions as F

    staged_codes = S.quantize_embeddings(f).df.select(
        "vec_id", F.col("qvec").alias("embedding")
    )
    from cuplyr_spark.frame import Frame as _F

    staged = S.quantized_cosine_topk(
        _F(staged_codes, ()), k=3, queries=queries, pre_quantized=True
    ).collect()
    key = lambda df: sorted(
        map(tuple, df[["query_id", "neighbor_id", "score", "rank"]].values)
    )
    assert key(fly) == key(staged)
    with pytest.raises(ValueError, match="explicit float-vector"):
        S.quantized_cosine_topk(
            _F(staged_codes, ()), k=3, query_filter="vec_id < 3", pre_quantized=True
        )


def test_cluster_embeddings_partitions_corpus(spark, tmp_path):
    """Every vector gets exactly one cell; staged centroids reproduce
    the inline assignment; cluster sizes sum to the corpus."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.similarity import (
        cluster_embeddings,
        ivf_centroids,
    )
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    n = emb.df.count()
    inline = cluster_embeddings(emb, n_cells=8, refine_iters=1).collect()
    assert len(inline) == n
    assert inline["vec_id"].is_unique
    assert inline["cell"].nunique() <= 8

    cdir = str(tmp_path / "cc")
    ivf_centroids(emb, n_cells=8, refine_iters=1).df.write.parquet(cdir)
    staged = cluster_embeddings(
        emb, centroids=Frame(spark.read.parquet(cdir), ())
    ).collect()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cell", "sim"]].values))
    assert key(inline) == key(staged)


def test_substring_dup_spans_planted_overlap(spark):
    """Two documents share an exact 5-token passage at different
    offsets: each gets exactly one span covering exactly that passage;
    the unique document gets none (k=3, so windows straddling the
    passage boundary are unique and must not widen the span)."""
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, "u1 u2 u3 " + shared + " v1 v2"),   # passage at tokens 4-8
        (1, "w1 w2 " + shared + " x1 x2 x3"),   # passage at tokens 3-7
        (2, "totally unique content nothing matches here at all"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.substring_dup_spans(f, k=3).collect()
    assert sorted(out["doc_id"].tolist()) == [0, 1]
    s0 = out[out.doc_id == 0].iloc[0]
    assert (s0["start_tok"], s0["end_tok"], s0["n_grams"]) == (4, 8, 3)
    s1 = out[out.doc_id == 1].iloc[0]
    assert (s1["start_tok"], s1["end_tok"], s1["n_grams"]) == (3, 7, 3)


def test_substring_dup_spans_merges_nearby_islands(spark):
    """Two duplicated regions closer than k tokens merge into one span
    (the windows' token ranges overlap); farther apart they stay two."""
    a = "s1 s2 s3 s4"
    b = "t1 t2 t3 t4"
    rows = [
        (0, a + " " + b),                      # regions touch -> one span
        (1, a + " q1 q2 q3 q4 q5 " + b),       # 5 unique tokens apart -> two
        (2, a + " zzz " + b),                  # second carrier of both
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.substring_dup_spans(f, k=3).collect()
    d0 = out[out.doc_id == 0]
    assert len(d0) == 1
    assert (d0.iloc[0]["start_tok"], d0.iloc[0]["end_tok"]) == (1, 8)
    assert len(out[out.doc_id == 1]) == 2


def test_trim_dup_spans_cuts_only_the_duplicated_region(spark):
    """Trimming removes exactly the spanned tokens; documents with no
    spans pass through byte-identical."""
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, "u1 u2 u3 " + shared + " v1 v2"),
        (1, "w1 w2 " + shared + " x1 x2 x3"),
        (2, "totally unique content nothing matches here at all"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.trim_dup_spans(f, k=3).collect().set_index("doc_id")["text"]
    assert out[0] == "u1 u2 u3 v1 v2"
    assert out[1] == "w1 w2 x1 x2 x3"
    assert out[2] == rows[2][1]


def test_ivf_index_append_equals_full_rebuild(spark):
    """Appending the second half onto a first-half index must produce
    the same (id, cell) table as building the index over the full
    corpus with the same centroids — append cost is the delta, the
    result is not approximate."""
    from cuplyr_spark.pipeline.similarity import (
        ivf_centroids,
        ivf_index,
        ivf_index_append,
    )
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=8, refine_iters=0)
    first = emb.filter("vec_id % 2 = 0")
    late = emb.filter("vec_id % 2 = 1")
    appended = ivf_index_append(
        ivf_index(first, centroids=cents), late, centroids=cents
    ).collect()
    full = ivf_index(emb, centroids=cents).collect()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cell"]].values))
    assert key(appended) == key(full)


def test_ivf_index_append_centroid_drift_warning(spark):
    """A delta whose vectors no longer fit the trained centroids must
    trip the retrain advisory; a well-fitting delta must not."""
    import warnings

    import numpy as np

    from cuplyr_spark.pipeline.similarity import ivf_centroids, ivf_index, ivf_index_append

    rng = np.random.RandomState(7)
    base = [(i, (np.array([1.0, 0.0, 0.0, 0.0]) + 0.01 * rng.randn(4)).tolist()) for i in range(20)]
    f = from_pandas(spark, pd.DataFrame(base, columns=["vec_id", "embedding"]))
    cents = ivf_centroids(f, n_cells=4, refine_iters=0)
    idx = ivf_index(f, centroids=cents)

    good = [(100 + i, (np.array([1.0, 0.0, 0.0, 0.0]) + 0.01 * rng.randn(4)).tolist()) for i in range(5)]
    gf = from_pandas(spark, pd.DataFrame(good, columns=["vec_id", "embedding"]))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ivf_index_append(idx, gf, centroids=cents, min_mean_sim=0.5)

    drifted = [(200 + i, (np.array([-1.0, 0.0, 0.0, 0.0]) + 0.01 * rng.randn(4)).tolist()) for i in range(5)]
    df_ = from_pandas(spark, pd.DataFrame(drifted, columns=["vec_id", "embedding"]))
    with pytest.warns(UserWarning, match="retrain"):
        ivf_index_append(idx, df_, centroids=cents, min_mean_sim=0.5)


def test_ivf_index_search_with_drifted_centroids(spark):
    """Staged-vs-fresh drift (the rehearsal case CI lacked): centroids
    trained on a DIFFERENT sample than the index was built from must
    still give index-path results identical to the inline path under
    the SAME centroids — cells are defined by the centroids, not by
    the sample they were trained on."""
    from cuplyr_spark.pipeline.similarity import (
        ivf_centroids,
        ivf_cosine_topk,
        ivf_index,
    )
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    # train on a third of the corpus, index the whole corpus
    sample = emb.filter("vec_id % 3 = 0")
    cents = ivf_centroids(sample, n_cells=8, refine_iters=1)
    idx = ivf_index(emb, centroids=cents)
    via_index = ivf_cosine_topk(
        emb, k=3, n_probe=3, query_filter="vec_id < 6",
        centroids=cents, index=idx,
    ).collect()
    inline = ivf_cosine_topk(
        emb, k=3, n_probe=3, query_filter="vec_id < 6", centroids=cents
    ).collect()
    key = lambda df: sorted(
        map(tuple, df[["query_id", "neighbor_id", "score", "rank"]].values)
    )
    assert key(via_index) == key(inline)


def test_oversized_pipeline_broadcast_degrades(spark, monkeypatch):
    """The guarded broadcast path (frame.broadcast_guarded): when the
    query side's Catalyst estimate exceeds the cap, the hint is
    DROPPED with a warning and the query still returns correct results
    through a plain join — never an executor OOM / hard error."""
    import numpy as np

    from cuplyr_spark.frame import Frame

    rng = np.random.RandomState(3)
    vecs = [(i, rng.randn(8).tolist()) for i in range(30)]
    f = from_pandas(spark, pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    expected = S.cosine_topk(f, k=3, query_filter="vec_id < 4").collect()

    monkeypatch.setattr(Frame, "BROADCAST_MAX_BYTES", 1)
    with pytest.warns(UserWarning, match="hint dropped"):
        got = S.cosine_topk(f, k=3, query_filter="vec_id < 4").collect()
    key = lambda df: sorted(
        map(tuple, df[["query_id", "neighbor_id", "score", "rank"]].values)
    )
    assert key(got) == key(expected)


def test_ivf_index_append_parquet_roundtrip(spark, tmp_path):
    """Physical parquet append: appending the second half into a
    first-half cell-partitioned index on disk must read back identical
    to the full inline index (same ids, same cells), with the delta
    repartitioned on the cell so the write opens ~n_cells files."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.similarity import (
        ivf_centroids,
        ivf_index,
        ivf_index_append_parquet,
    )
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb, n_cells=8, refine_iters=0)
    d = str(tmp_path / "idx")
    ivf_index(emb.filter("vec_id % 2 = 0"), centroids=cents).df.write.partitionBy(
        "cell"
    ).parquet(d)
    ivf_index_append_parquet(d, emb.filter("vec_id % 2 = 1"), cents)

    back = Frame(spark.read.parquet(d), ()).collect()
    full = ivf_index(emb, centroids=cents).collect()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cell"]].values))
    assert key(back) == key(full)


def test_cluster_balanced_sample_quota_and_determinism(spark):
    """Per-cell quota respected, ids unique, selection deterministic
    across calls; keep_vectors=True returns the corpus rows of exactly
    the sampled ids."""
    from cuplyr_spark.pipeline.similarity import cluster_balanced_sample
    from cuplyr_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    a = cluster_balanced_sample(emb, 7, n_cells=8, refine_iters=0).collect()
    assert a["vec_id"].is_unique
    assert a.groupby("cell").size().max() <= 7
    assert (a["samp_rank"] >= 1).all() and (a["samp_rank"] <= 7).all()

    b = cluster_balanced_sample(emb, 7, n_cells=8, refine_iters=0).collect()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cell", "samp_rank"]].values))
    assert key(a) == key(b)

    rich = cluster_balanced_sample(
        emb, 7, n_cells=8, refine_iters=0, keep_vectors=True
    ).collect()
    assert sorted(rich["vec_id"]) == sorted(a["vec_id"])
    assert "embedding" in rich.columns and "samp_rank" in rich.columns

    with pytest.raises(ValueError):
        cluster_balanced_sample(emb, 0)


def test_unigram_logprob_ranks_gibberish_low(spark):
    """The corpus-LM score must rank a gibberish doc below docs made of
    corpus-common words; empty docs get n_tokens=0 and NULL scores;
    logprob is always <= 0."""
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        (0, common),
        (1, "the dog and the cat on the mat"),
        (2, "zxqv wkjh qpzm vvxk zzzz"),   # gibberish: every token unique
        (3, ""),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TX.with_unigram_logprob(f).collect().set_index("doc_id")
    assert out.loc[3, "n_tokens"] == 0 and pd.isna(out.loc[3, "logprob"])
    assert out.loc[2, "avg_logprob"] < out.loc[1, "avg_logprob"]
    assert out.loc[2, "avg_logprob"] < out.loc[0, "avg_logprob"]
    assert (out.loc[[0, 1, 2], "logprob"] <= 0).all()
    # perplexity proxy: exp(-avg) higher for gibberish
    import math

    assert math.exp(-out.loc[2, "avg_logprob"]) > math.exp(-out.loc[0, "avg_logprob"])


def test_unigram_model_staged_equals_inline_and_oov_floor(spark, tmp_path):
    """Stage-once contract for the LM: scoring the training corpus
    against its parquet-staged model is bit-identical to the inline
    path; a new batch with OOV tokens scores at the add-one floor
    (OOV logprob component = ln(1/(T+V)) per occurrence)."""
    import math

    from cuplyr_spark.frame import Frame

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    inline = TX.with_unigram_logprob(f).collect()

    d = str(tmp_path / "lm")
    TX.train_unigram_model(f).df.write.parquet(d)
    staged_model = Frame(spark.read.parquet(d), ())
    staged = TX.with_unigram_logprob(f, model=staged_model).collect()
    key = lambda df: sorted(
        map(tuple, df[["doc_id", "n_tokens", "logprob", "avg_logprob"]].values)
    )
    assert key(inline) == key(staged)

    # new batch: all-OOV doc scores exactly n * ln(1/(T+V))
    new = from_pandas(
        spark, pd.DataFrame([(9, "zz qq ww")], columns=["doc_id", "text"])
    )
    out = TX.with_unigram_logprob(new, model=staged_model).collect().iloc[0]
    t_total = 12  # 2 docs x 6 tokens
    v = staged_model.df.count()
    floor_nats = math.floor(math.log(1.0 / (t_total + v)) * 1e6 + 0.5) / 1e6
    assert out["n_tokens"] == 3
    assert abs(out["logprob"] - 3 * floor_nats) < 1e-9

    with pytest.raises(ValueError, match="lacks columns"):
        TX.with_unigram_logprob(new, model=Frame(new.df, ()))


def test_substring_dup_spans_hot_gram_cap(spark):
    """VERDICT r7: the hot-gram guard. A boilerplate gram planted at
    ~100x a tiny cap is clamped — all its positions flag as duplicated
    without entering the per-gram window — while under-cap grams keep
    the exact cross-doc test (result identical to the uncapped run on
    the same data)."""
    boiler = "b1 b2 b3"  # one k=3 window per occurrence
    rows = [(i, boiler + f" u{i}a u{i}b u{i}c") for i in range(200)]
    rows.append((999, "totally unique text nothing here"))
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))

    capped = D.substring_dup_spans(f, k=3, max_gram_freq=2).collect()
    uncapped = D.substring_dup_spans(f, k=3, max_gram_freq=None).collect()
    key = lambda df: sorted(
        map(tuple, df[["doc_id", "start_tok", "end_tok", "n_grams"]].values)
    )
    # boilerplate occurs in 200 docs: cross-doc duplicated either way,
    # so clamping is semantics-preserving here — results identical
    assert key(capped) == key(uncapped)
    assert sorted(capped["doc_id"].unique()) == list(range(200))
    assert (capped["start_tok"] == 1).all() and (capped["end_tok"] == 3).all()

    # pathological clamp case, documented rule: an over-cap gram
    # repeated >cap times inside ONE doc flags even without a second doc
    solo = from_pandas(
        spark,
        pd.DataFrame(
            [(0, " ".join(["r1 r2 r3"] * 5))], columns=["doc_id", "text"]
        ),
    )
    clamped = D.substring_dup_spans(solo, k=3, max_gram_freq=2).collect()
    assert len(clamped) == 1  # whole doc one span
    exact = D.substring_dup_spans(solo, k=3, max_gram_freq=None).collect()
    assert len(exact) == 0    # within-doc repeats alone never flag


def test_unigram_model_duplicate_tok_rows(spark):
    """ADVICE r7: a staged model assembled from two parquet writes may
    carry duplicate tok rows; scoring must re-aggregate them so the
    result equals scoring with the properly summed model."""
    f = from_pandas(
        spark,
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["aa bb aa", "bb cc"]}
        ),
    )
    model = TX.train_unigram_model(f)
    # split each tok row into two half-count rows and union: same
    # totals, duplicated keys
    half1 = model.df.selectExpr("tok", "c - CAST(c / 2 AS BIGINT) AS c")
    half2 = model.df.selectExpr("tok", "CAST(c / 2 AS BIGINT) AS c").filter(
        "c > 0"
    )
    from cuplyr_spark.frame import Frame

    dup_model = Frame(half1.unionByName(half2), ())
    clean = TX.with_unigram_logprob(f, model=model).collect().set_index("doc_id")
    dup = TX.with_unigram_logprob(f, model=dup_model).collect().set_index("doc_id")
    for d in (0, 1):
        assert clean.loc[d, "n_tokens"] == dup.loc[d, "n_tokens"]
        assert abs(clean.loc[d, "logprob"] - dup.loc[d, "logprob"]) < 1e-9


def test_importance_logratio_staged_vs_self(spark):
    """DSIR importance: a doc drawn from the target distribution
    scores higher than an off-target doc; staged raw model reproduces
    the self-trained default bit-for-bit."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.text import (
        train_unigram_model,
        with_importance_logratio,
    )

    docs = Frame(
        spark.createDataFrame(
            [
                (0, "the cat sat on the mat"),
                (1, "the dog sat on the log"),
                (2, "quantum flux capacitor array"),
                (3, "the cat and the dog"),
            ],
            "doc_id long, text string",
        )
    )
    target = train_unigram_model(
        Frame(docs.df.filter("doc_id in (0, 1)"), ())
    )
    got = with_importance_logratio(docs, target).collect()
    by_id = dict(zip(got["doc_id"], got["importance"]))
    # target-like docs beat the off-target one
    assert by_id[0] > by_id[2] and by_id[3] > by_id[2]
    # staged raw model == self-trained default
    raw = train_unigram_model(docs)
    got2 = with_importance_logratio(docs, target, raw_model=raw).collect()
    assert got.sort_values("doc_id")["importance"].tolist() == (
        got2.sort_values("doc_id")["importance"].tolist()
    )


def test_select_topk_importance_deterministic_set(spark):
    """r14: the DSIR selection loop — top-k by importance with id
    tiebreak; unscored docs last; k larger than the pool returns all."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.text import (
        select_topk_importance,
        train_unigram_model,
    )

    docs = Frame(
        spark.createDataFrame(
            [
                (0, "the cat sat on the mat"),
                (1, "the dog sat on the log"),
                (2, "quantum flux capacitor array"),
                (3, "the cat and the dog"),
                (4, ""),
            ],
            "doc_id long, text string",
        )
    )
    target = train_unigram_model(Frame(docs.df.filter("doc_id in (0, 1)"), ()))
    top2 = select_topk_importance(docs, target, k=2).collect()
    # the two most target-like docs; the empty doc never selected early
    assert 2 not in set(top2["doc_id"]) and 4 not in set(top2["doc_id"])
    assert list(top2.columns) == ["doc_id", "n_tokens", "importance",
                                  "avg_importance"]
    everything = select_topk_importance(docs, target, k=100).collect()
    assert len(everything) == 5  # unscored doc included when k allows
    assert everything["doc_id"].iloc[-1] == 4  # NULLs last
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        select_topk_importance(docs, target, k=0)


def test_perplexity_buckets_rank_exact(spark):
    """r14: CCNet-style bucketing — staged thresholds reproduce the
    inline self-bucketing exactly, bucket 1 holds the most
    target-like text, empty docs get NULL buckets."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.text import (
        perplexity_thresholds,
        with_perplexity_bucket,
    )

    rows = [(i, "the cat sat on the mat") for i in range(4)]
    rows += [(10 + i, "the dog ran") for i in range(4)]
    rows += [(20 + i, "zz qq xx vv kk jj ww yy") for i in range(4)]
    rows += [(99, "")]
    docs = Frame(spark.createDataFrame(rows, "doc_id long, text string"))
    got = with_perplexity_bucket(docs, n_buckets=3).collect()
    by_id = dict(zip(got["doc_id"], got["bucket"]))
    import math

    assert math.isnan(by_id[99]) or by_id[99] is None  # unscored
    # the gibberish docs land in the worst bucket, common text in 1
    assert all(by_id[20 + i] == 3 for i in range(4))
    assert all(by_id[i] == 1 for i in range(4))
    # staged thresholds == inline
    cuts = perplexity_thresholds(docs, n_buckets=3)
    assert len(cuts) == 2 and cuts[0] >= cuts[1]
    got2 = with_perplexity_bucket(docs, thresholds=cuts).collect()
    assert got.sort_values("doc_id")["bucket"].fillna(-1).tolist() == (
        got2.sort_values("doc_id")["bucket"].fillna(-1).tolist()
    )


def test_near_dedup_keep_by_quality(spark):
    """r14: keep_by keeps the highest-scored cluster member (ties min
    id) instead of the min-id one; unknown columns refuse loudly."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.dedup import near_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " one", 0.2),
        (2, base + " two", 0.9),   # best copy: must survive
        (3, base + " три", 0.5),
        (10, "completely unrelated text about spark manifests", 0.1),
    ]
    docs = Frame(
        spark.createDataFrame(rows, "doc_id long, text string, q double")
    )
    kept_default = near_dedup(docs).collect()
    kept_best = near_dedup(docs, keep_by="q").collect()
    # default keeps min id of the near-dup cluster; keep_by keeps doc 2
    assert 1 in set(kept_default["doc_id"])
    assert 2 in set(kept_best["doc_id"])
    assert {1, 3} & set(kept_best["doc_id"]) == set()
    # the unrelated doc always survives both ways
    assert 10 in set(kept_best["doc_id"]) and 10 in set(kept_default["doc_id"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_by"):
        near_dedup(docs, keep_by="nope")


def test_resample_to_mixture_token_mass(spark):
    """r14: weight_col switches mixture targets from row shares to
    token-mass shares; the binding group keeps every row."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.sampling import resample_to_mixture

    rows = []
    for i in range(200):
        rows.append((i, "a", "tok " * 10))          # 2000+ tokens total
    for i in range(200, 240):
        rows.append((i, "b", "tok " * 50))          # few docs, heavy
    docs = Frame(
        spark.createDataFrame(rows, "doc_id long, src string, text string")
    )
    from pyspark.sql import functions as SF

    weighted = Frame(
        docs.df.withColumn(
            "n_toks", SF.size(SF.split(SF.col("text"), " ")).cast("long")
        ),
        (),
    )
    out = resample_to_mixture(
        weighted, "src", {"a": 0.5, "b": 0.5}, weight_col="n_toks"
    ).collect()
    mass = out.groupby("src")["n_toks"].sum()
    # b is the binding group (needs 50% from ~50% of the mass): all kept
    assert (out["src"] == "b").sum() == 40
    # realized token share within sampling tolerance of the target
    share_a = mass["a"] / mass.sum()
    assert 0.35 < share_a < 0.65, share_a
    import pytest as _pytest

    with _pytest.raises(ValueError, match="weight_col"):
        resample_to_mixture(weighted, "src", {"a": 1.0}, weight_col="nope")


def test_chunk_documents_tokens_windows_and_overlap(spark):
    """r14: token-window chunking — boundaries, overlap, tail chunk,
    single-chunk docs, validation."""
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.pipeline.text import chunk_documents_tokens as chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    docs = Frame(
        spark.createDataFrame(
            [(1, text), (2, "a b c")], "doc_id long, text string"
        )
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1).collect()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_idx")
    # stride 3: starts 0,3,6 → 3 chunks (a start at 9 would add only
    # tokens the previous chunk already covers)
    assert d1["chunk_idx"].tolist() == [0, 1, 2]
    assert d1["n_chunk_tokens"].tolist() == [4, 4, 4]
    assert d1["chunk_text"].tolist()[0] == "t0 t1 t2 t3"
    assert d1["chunk_text"].tolist()[1] == "t3 t4 t5 t6"  # 1-token overlap
    assert d1["chunk_text"].tolist()[2] == "t6 t7 t8 t9"
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2["n_chunk_tokens"].iloc[0] == 3
    # reconstruction property at zero overlap: concatenation == doc
    flat = chunk_documents(docs, chunk_tokens=4).collect()
    d1f = flat[flat["doc_id"] == 1].sort_values("chunk_idx")
    assert " ".join(d1f["chunk_text"]) == text
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)
    with _pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, chunk_tokens=0)
