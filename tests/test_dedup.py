"""Dedup family tests: exact, jaccard, minhash recall, simhash, embedding
(SURVEY.md §2.3 J8; north star dedup)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from bob_vector_db_spark.operators import dedup


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup
        (3, "completely different content about spark query engines at scale"),
        (4, "completely different content about spark query engines at scale plus more"),
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    groups = dedup.exact_dedup_groups(_docs(spark)).collect()
    dup_groups = [g for g in groups if g["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["ids"] == [0, 1] or dup_groups[0]["ids"] == "0,1"


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (3, 5) not in pairs


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _docs(spark)
    exact = {(r["id_a"], r["id_b"])
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()}
    cand = {(r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8).collect()}
    # LSH with 8 bands of 2 rows has high recall at jaccard >= 0.6
    assert exact <= cand


def test_minhash_ml_approx_join_finds_exact_dups(spark):
    """Spark ML MinHashLSH variant: identical docs have identical feature
    vectors, so the (0,1) pair is always found; jaccard on the pair is 1.0."""
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.minhash_lsh_pairs_ml(_docs(spark), threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert all(j >= 0.5 for j in pairs.values())


def test_minhash_signatures_identical_for_identical_docs(spark):
    sigs = {r["id"]: r["sig"] for r in dedup.minhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_simhash_hamming_orders_similarity(spark):
    fp = {r["id"]: r["fp"] for r in dedup.simhash_table(_docs(spark)).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fp[0], fp[1]) == 0
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])


def test_simhash_pairs_blocking_finds_all_close_pairs(spark):
    docs = _docs(spark)
    fp = {r["id"]: r["fp"] for r in dedup.simhash_table(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    expect = {(a, b) for a, b in itertools.combinations(sorted(fp), 2)
              if ham(fp[a], fp[b]) <= 3}
    got = {(r["id_a"], r["id_b"]) for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert got == expect  # pigeonhole blocking is lossless


def test_simhash_chunk_blocking_cardinality(spark):
    """Scale guard: 64-bit fingerprints with 16-bit chunks must diffuse a
    20k-doc corpus over >10k distinct values per chunk index — the property
    that keeps per-bucket candidate generation sub-quadratic at 100 TB (an
    8-bit chunk caps out at 256 buckets and goes quadratic)."""
    docs = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{i}"))), 1, 8)
            for i in range(5)
        ]).alias("text"),
    )
    fp = dedup.simhash_table(docs, bits=64)
    n_chunks, chunk_bits = 4, 16
    counts = fp.select(*[
        F.countDistinct(
            F.shiftright(F.col("fp"), c * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
        ).alias(f"c{c}")
        for c in range(n_chunks)
    ]).first()
    for c in range(n_chunks):
        assert counts[f"c{c}"] > 10000, f"chunk {c}: only {counts[f'c{c}']} buckets"


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 0.0, 0.001], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    within = dedup.embedding_neardup_pairs(df, block_col="label", threshold=0.99).collect()
    ids = {(r["id_a"], r["id_b"]) for r in within}
    assert (0, 1) in ids and (0, 2) not in ids
    allpairs = dedup.embedding_neardup_pairs(df, block_col=None, threshold=0.99).collect()
    ids_all = {(r["id_a"], r["id_b"]) for r in allpairs}
    assert (0, 3) in ids_all  # cross-label pair visible without blocking


def test_embedding_neardup_vectorized_matches_sql_path(spark, sf_dir):
    from bob_vector_db_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sql_pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup.embedding_neardup_pairs(emb, threshold=0.35).collect()
    }
    blas_pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup.embedding_neardup_pairs_vectorized(emb, threshold=0.35).collect()
    }
    assert set(sql_pairs) == set(blas_pairs)
    assert all(abs(sql_pairs[k] - blas_pairs[k]) < 1e-5 for k in sql_pairs)


def test_finders_release_their_caches(spark, sf_dir):
    """VERDICT r3 #6: repeated finder calls must not grow the session's
    cache.  Each finder persists intermediates, materializes its (small)
    pair result, and unpersists before returning — so the CacheManager is
    empty after every call and the persistent-RDD set stays bounded (only
    the localCheckpoint blocks of results still referenced from Python)."""
    import gc

    from bob_vector_db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(3):
        for finder in (
            lambda d: dedup.ngram_jaccard_pairs(d, max_df=50),
            dedup.minhash_lsh_pairs,
            dedup.simhash_pairs,
        ):
            out = finder(docs)
            out.count()
            assert cache_mgr.isEmpty(), "finder left a DataFrame persisted"
            del out
    # localCheckpoint blocks of dropped results are ContextCleaner-managed:
    # after a GC cycle the persistent-RDD set must not retain one per call
    # (9 calls above; allow the in-flight tail)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    import time
    deadline = time.time() + 30
    while time.time() < deadline:
        n = spark.sparkContext._jsc.getPersistentRDDs().size()
        if n <= 2:
            break
        time.sleep(1)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    assert n <= 2, f"{n} persistent RDDs survived GC — checkpoint leak"


def test_cross_corpus_contamination(spark):
    from bob_vector_db_spark.operators.dedup import cross_corpus_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a quick brown fox appeared"),      # shares "quick brown fox"
         (2, "totally unrelated content here"),  # clean
         (3, "the quick brown fox jumps again")],  # shares several
        "doc_id long, text string")
    out = {r["id"]: r["n_hits"]
           for r in cross_corpus_contamination(train, bench, n=3).collect()}
    assert set(out) == {1, 3}
    assert out[3] > out[1] >= 1


def test_paragraph_dedup_semantics(spark):
    """CCNet/Dolma paragraph dedup pins: a paragraph in >= min_repeats
    DISTINCT docs vanishes from all of them; survivors keep original
    order; in-doc repeats below the bar stay; whitespace-only segments
    never count as paragraphs; every input id survives."""
    from bob_vector_db_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "boiler\nunique one\nboiler"),   # boiler also in docs 2,3
         (2, "unique two\nboiler"),
         (3, "boiler\n \nunique three\nunique three"),  # ws-only segment
         (4, "all alone")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(docs, min_repeats=2).collect()}
    assert out[1] == "unique one"
    assert out[2] == "unique two"
    # in-doc repeat (1 distinct doc) survives BOTH times, order kept
    assert out[3] == "unique three\nunique three"
    assert out[4] == "all alone"
    # min_repeats raises the bar: nothing removed at 4
    out4 = {r["doc_id"]: r["text"]
            for r in paragraph_dedup(docs, min_repeats=4).collect()}
    assert out4[1] == "boiler\nunique one\nboiler"
    # fully-boilerplate doc comes back EMPTY, not missing
    docs2 = spark.createDataFrame(
        [(1, "b"), (2, "b"), (3, "keep")], "doc_id long, text string")
    out2 = {r["doc_id"]: r["text"]
            for r in paragraph_dedup(docs2, min_repeats=2).collect()}
    assert out2 == {1: "", 2: "", 3: "keep"}


def test_connected_components_known_graph(spark):
    """Transitive closure on a known graph: two clusters + the chain
    case (A-B, B-C collapses even though A-C never paired)."""
    from bob_vector_db_spark.operators.dedup import (
        connected_components,
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 4)], "id_a long, id_b long")
    cc = {r["node"]: r["component"]
          for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    summ = {r["cluster"]: (r["n_members"], list(r["members"]), r["keep"])
            for r in duplicate_clusters(pairs).collect()}
    assert summ == {1: (4, [1, 2, 3, 4], 1), 10: (2, [10, 11], 10)}


def test_connected_components_long_chain_and_cap(spark):
    """A 12-node chain needs ~6 propagation rounds (min label moves one
    hop per round from each side) — converges under the default cap;
    an adversarial cap raises instead of returning a bad labeling."""
    import pytest as _pytest

    from bob_vector_db_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long")
    cc = connected_components(chain)
    assert {r["component"] for r in cc.collect()} == {0}
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(chain, max_iterations=2)


def test_connected_components_star_long_path(spark):
    """algorithm='star' (round 14, VERDICT r13 #7): a 1,000-node PATH —
    diameter 999, where min-label needs ~999 rounds — converges in the
    O(log n) star budget (well under 25 alternations) with every node
    labeled 0.  Exactly the adversarial boilerplate-chain shape."""
    from bob_vector_db_spark.operators.dedup import connected_components

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long")
    cc = connected_components(path, algorithm="star")
    rows = cc.collect()
    assert len(rows) == 1000
    assert {r["component"] for r in rows} == {0}
    assert {r["node"] for r in rows} == set(range(1000))


def test_minhash_band_cap_preserves_clusters(spark, sf_dir):
    """The band-size cap must never change the CLUSTERING: over-cap
    buckets emit star edges (n−1 rows) whose transitive closure equals
    the all-pairs bucket's, so connected components over capped pairs ==
    components over uncapped pairs — while the capped pair count per
    over-cap bucket is linear, not quadratic."""
    from bob_vector_db_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from bob_vector_db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = minhash_lsh_pairs(docs, num_hashes=16, bands=4)
    capped = minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                               max_band_size=2)
    n_full, n_capped = full.count(), capped.count()
    assert n_capped <= n_full
    cc_full = {(r["node"], r["component"])
               for r in connected_components(full).collect()}
    cc_capped = {(r["node"], r["component"])
                 for r in connected_components(capped).collect()}
    assert cc_full == cc_capped, "band cap changed the clustering"
    # degenerate cap: EVERY bucket goes star — clustering still equal
    allstar = minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                max_band_size=1)
    cc_star = {(r["node"], r["component"])
               for r in connected_components(allstar).collect()}
    assert cc_star == cc_full


def test_duplicate_clusters_quality_keep(spark):
    """Quality keep policy: highest score wins, ties break to the lowest
    id, unscored members lose to any scored member, and a fully
    unscored cluster falls back to the lowest id."""
    from bob_vector_db_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long")
    quality = spark.createDataFrame(
        # cluster {1,2,3}: 3 has top score; {10,11}: tie -> lowest id;
        # {20,21}: 21 scored, 20 not -> 21 wins despite higher id
        [(1, 5.0), (2, 7.0), (3, 9.0), (10, 4.0), (11, 4.0), (21, 0.5)],
        "id long, score double")
    out = {r["cluster"]: r["keep"]
           for r in duplicate_clusters(pairs, quality=quality).collect()}
    assert out == {1: 3, 10: 10, 20: 21}
    # a fully unscored cluster keeps the lowest id
    out2 = {r["cluster"]: r["keep"] for r in duplicate_clusters(
        pairs, quality=quality.filter("id < 0")).collect()}
    assert out2 == {1: 1, 10: 10, 20: 20}


def test_temperature_mix_quotas(spark):
    """Temperature mixing: quotas ∝ count^α with the min-1 floor; a
    stratum never contributes more rows than it has; α=1 with a big
    target keeps everything (natural distribution, capped by counts)."""
    from bob_vector_db_spark.operators.sampling import temperature_mix

    rows = ([(i, "big") for i in range(90)]
            + [(100 + i, "mid") for i in range(9)]
            + [(200, "tiny")])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mix(df, "lang", "doc_id", n_target=20, alpha=0.5)
    got = {r["lang"] for r in out.collect()}
    by = {lang: 0 for lang in got}
    for r in out.collect():
        by[r["lang"]] += 1
    # sqrt weights: 90^.5≈9.487, 9^.5=3, 1 -> tot≈13.487
    # quotas: floor(20*9.487/13.487)=14, floor(20*3/13.487)=4, max(1,1)=1
    assert by == {"big": 14, "mid": 4, "tiny": 1}, by
    # alpha=1, huge target: every stratum capped by its own size
    full = temperature_mix(df, "lang", "doc_id", n_target=10_000, alpha=1.0)
    assert full.count() == 100


def _union_find_components(pairs):
    """Driver-side union-find reference: node → min id of its component
    (the connected_components contract), over every node in ``pairs``."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_cc_property_both_algorithms_match_union_find(spark):
    """Property: on arbitrary small graphs (self-loops, dups, reversed
    duplicates included) BOTH algorithms reproduce the union-find
    labeling exactly.  Pins the star alternation's fixed-point logic
    against an independent sequential reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bob_vector_db_spark.operators.dedup import connected_components

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                    min_size=1, max_size=35))
    def run(edges):
        want = _union_find_components(edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        for algo in ("label", "star"):
            got = {r["node"]: r["component"]
                   for r in connected_components(
                       pairs, algorithm=algo).collect()}
            assert got == want, (algo, sorted(edges))

    run()


def test_connected_components_star_matches_label(spark):
    """Both algorithms are the same contract: identical (node,
    component) labeling on a mixed graph (two clusters, one chain, one
    pair), and unknown algorithms refuse."""
    import pytest as _pytest

    from bob_vector_db_spark.operators.dedup import (
        connected_components,
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long")
    lab = {(r["node"], r["component"])
           for r in connected_components(pairs).collect()}
    star = {(r["node"], r["component"])
            for r in connected_components(pairs,
                                          algorithm="star").collect()}
    assert lab == star
    # the summary shape passes algorithm through unchanged
    s1 = {r["cluster"]: (r["n_members"], r["keep"]) for r in
          duplicate_clusters(pairs, algorithm="star").collect()}
    assert s1 == {1: (4, 1), 10: (2, 10), 20: (3, 20)}
    with _pytest.raises(ValueError, match="algorithm"):
        connected_components(pairs, algorithm="bogus")


def test_substring_dedup_semantics(spark):
    """ExactSubstr: tokens covered by a width-window repeated across >=2
    DISTINCT docs drop; unique spans survive in order; every id
    survives."""
    span = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (0, f"intro one two {span} outro three four"),
        (1, f"different lead {span} different tail entirely"),
        (2, "no shared content here at all just singles"),
        (3, span),                       # fully boilerplate -> empty
        (4, f"{span} {span} within one document only is kept"),
    ]
    # doc 4 repeats the span only WITHIN itself — min_repeats counts
    # DISTINCT docs, and 0/1/3 also carry it, so it still drops there;
    # make the within-only case its own span:
    solo = "india juliet kilo lima mike november oscar papa"
    rows.append((5, f"{solo} {solo} repeated within a single doc"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in dedup.substring_dedup(docs, width=8).collect()}
    assert len(out) == 6
    for d in (0, 1, 3, 4):
        assert span.split()[0] not in out[d].split(), (d, out[d])
    assert out[3] == ""
    assert out[2] == rows[2][1]          # untouched doc unchanged
    # within-one-doc repetition does NOT cross the distinct-doc bar
    assert solo.split()[0] in out[5].split()
    # survivors keep their original order
    assert out[0].startswith("intro one two")
    assert out[0].endswith("outro three four")


def test_substring_dedup_width_longer_than_doc(spark):
    docs = spark.createDataFrame(
        [(0, "short text"), (1, "short text")], "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in dedup.substring_dedup(docs, width=8).collect()}
    # no 8-token window exists -> nothing drops (exact-dup docs pass
    # through; the DOCUMENT-level pass catches these, not ExactSubstr)
    assert out == {0: "short text", 1: "short text"}


def test_null_and_empty_text_every_ngram_path(spark):
    """Round 15: NULL text NPE'd Spark ML's NGram lambda and zero-shingle
    docs crashed MinHashLSH's approxSimilarityJoin ("at least 1 non zero
    entry") — matters because the persisted near-dup index shingles
    arbitrary stored rows, not the NULL-free fixtures.  Every n-gram path
    must now treat NULL/empty/too-short docs as contributing nothing."""
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, None), (2, ""), (3, "a b c d e"),
         (4, "solo")],
        "doc_id long, text string")
    sh = dedup.doc_shingles(docs, n=3)
    assert sorted(set(r["id"] for r in sh.collect())) == [0, 3]
    pairs = dedup.minhash_lsh_pairs(docs, n=3)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(0, 3)]
    ml = dedup.minhash_lsh_pairs_ml(docs, n=3, threshold=0.5)
    assert [(r["id_a"], r["id_b"]) for r in ml.collect()] == [(0, 3)]
    sub = {r["doc_id"]: r["text"]
           for r in dedup.substring_dedup(docs, width=3).collect()}
    assert sub[1] == "" and sub[2] == "" and sub[4] == "solo"
    assert sub[0] == "" and sub[3] == ""  # exact dups fully covered


def test_substring_dedup_matches_python_reference(spark):
    """Property: on random small-vocab corpora (guaranteeing shared
    windows), substring_dedup must equal a direct Python implementation
    of the spec — windows of `width` tokens, repeated across >=2 distinct
    docs, covered tokens dropped, survivors rejoined by single spaces."""
    import random

    width = 3
    for seed in (1, 7, 42):
        rnd = random.Random(seed)
        vocab = [f"w{i}" for i in range(8)]   # tiny vocab -> many repeats
        rows = [(i, " ".join(rnd.choice(vocab)
                             for _ in range(rnd.randint(0, 12))))
                for i in range(14)]
        # python reference
        toks = {i: t.split() for i, t in rows}
        from collections import defaultdict
        docs_per_win = defaultdict(set)
        for i, tk in toks.items():
            for s in range(len(tk) - width + 1):
                docs_per_win[tuple(tk[s:s + width])].add(i)
        rep = {w for w, ds in docs_per_win.items() if len(ds) >= 2}
        expect = {}
        for i, tk in toks.items():
            cov = set()
            for s in range(len(tk) - width + 1):
                if tuple(tk[s:s + width]) in rep:
                    cov.update(range(s, s + width))
            expect[i] = " ".join(t for p, t in enumerate(tk)
                                 if p not in cov)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["text"]
               for r in dedup.substring_dedup(docs, width=width).collect()}
        assert got == expect, f"seed {seed}"
