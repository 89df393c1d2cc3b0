"""Persisted near-duplicate indexes for a stored collection — incremental
dedup for a crawl-snapshot ingest loop (round 15, VERDICT r14 task 1).
TWO kinds share the scaffold: banded MinHash-LSH postings (the flagship,
documented below) and SimHash pigeonhole-chunk postings (round 15b, the
Hamming-distance twin at the bottom of the module) — any blocking-key
near-dup strategy persists as (id, key..., gen) postings with an
O(|delta|) delta-log refresh.

The in-memory finders in :mod:`operators.dedup` recompute shingles and
signatures from scratch every call — right for a one-shot corpus pass,
wrong for the incremental 100 TB shape where each crawl snapshot upserts a
small delta into a stored collection and only the DELTA should pay a
shuffle.  This module applies the store's own index-at-upsert maintenance
model (the Qdrant pattern the reference configures in
qdrant_embedder.py:95-103, re-expressed for a parquet store; same scheme as
``operators.index.refresh_vector_index`` and
``operators.text_search.refresh_text_index``) to the dedup family:

  build    — one full-corpus pass materializes the banded MinHash posting
             table ``(id, band, band_key, gen)`` under the collection's
             ``_index/`` dir, hash-partitioned by
             ``band_bucket = pmod(xxhash64(band, band_key), n_band_buckets)``
             so a delta probe's buckets partition-prune the scan;
  refresh  — the shared delta-log scaffold (claim generation → masks →
             pruned O(|delta|) fetch → append → commit): changed docs
             re-shingle and APPEND their band postings at generation g,
             (id, upto_gen) masks hide the stale rows — never a
             full-corpus re-shingle;
  pairs    — ``neardup_pairs_indexed`` equi-joins the masked posting table
             on the band key (identical pair semantics to
             ``dedup.minhash_lsh_pairs`` over the collection's CURRENT
             rows, including the ``max_band_size`` star-edge skew cap —
             both call the same ``dedup.banded_pairs`` emitter);
  probe    — ``neardup_pairs_for_ids`` answers "which stored docs does
             this snapshot duplicate" by banding ONLY the given ids
             (O(|delta|) signatures) and probing their band buckets
             through a static ``band_bucket IN (...)`` partition filter —
             the corpus side never full-scans.

Scale notes: posting rows are narrow (id + one short band-key string);
the pair join shuffles on the band key exactly like the in-memory path,
and the probe reads |touched buckets|/n_band_buckets of the artifact.
Band keys are layout-invariant (pure functions of the text), so refreshed
and rebuilt artifacts produce identical pairs — tested in
tests/test_neardup_index.py.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup


def _neardup_index_name(text_col: str) -> str:
    return f"{text_col}__neardup"


def neardup_index_meta(root: str, collection: str,
                       text_col: str = "document") -> dict | None:
    from .index import vector_index_meta  # noqa: PLC0415

    return vector_index_meta(root, collection, _neardup_index_name(text_col))


def neardup_index_is_fresh(root: str, collection: str,
                           text_col: str = "document") -> bool:
    from .upsert import collection_version  # noqa: PLC0415

    imeta = neardup_index_meta(root, collection, text_col)
    if imeta is None:
        return False
    return int(imeta["built_version"]) == collection_version(root, collection)


def _band_postings(df: DataFrame, id_col: str, text_col: str,
                   imeta: dict, gen: int) -> DataFrame:
    """(id, band, band_key, gen, band_bucket) posting rows for ``df`` —
    the ONE banding implementation both build and refresh run, so a
    refreshed artifact's keys are bit-identical to a rebuilt one's."""
    sig = dedup.minhash_signatures(
        df, text_col=text_col, id_col=id_col, n=int(imeta["n"]),
        num_hashes=int(imeta["num_hashes"]), seed=int(imeta["seed"]))
    banded = dedup.band_signatures(sig, int(imeta["num_hashes"]),
                                   int(imeta["bands"]))
    return (banded
            .withColumn("gen", F.lit(int(gen)))
            .withColumn("band_bucket",
                        F.pmod(F.xxhash64("band", "band_key"),
                               F.lit(int(imeta["n_band_buckets"])))
                        .cast("int")))


def build_neardup_index(spark: SparkSession, root: str, collection: str,
                        text_col: str = "document", n: int = 3,
                        num_hashes: int = 16, bands: int = 4,
                        seed: int = 42, n_band_buckets: int = 32,
                        files_per_bucket: int = 1) -> dict:
    """Materialize the banded MinHash posting table for a stored
    collection: one corpus pass (shingle → signature aggregate → band
    explode), clustered write partitioned by ``band_bucket``.  Same staged
    atomic swap and ``built_version`` staleness gate as the vector/BM25
    indexes; rebuild compacts refresh masks away."""
    from .index import INDEX_META_FILE, atomic_replace_dir, index_path  # noqa: PLC0415
    from .upsert import (  # noqa: PLC0415
        _store_exists,
        collection_meta,
        collection_path,
        collection_version,
        read_collection,
    )

    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} is not divisible by bands={bands}: "
            f"the trailing {num_hashes % bands} hashes would be silently "
            f"ignored by the banding — a persisted artifact must not bake "
            f"in a surprise recall change")
    meta = collection_meta(root, collection)
    if meta is None:
        raise ValueError(
            f"collection {collection!r} has no meta sidecar; create it via "
            f"create_collection/upsert before indexing")
    id_col = meta.get("id_col", "id")
    built_version = collection_version(root, collection)
    imeta = {
        "kind": "neardup_minhash_lsh",
        "text_col": text_col,
        "id_col": id_col,
        "n": int(n),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "seed": int(seed),
        "n_band_buckets": int(n_band_buckets),
        "built_version": built_version,
        # same LSM maintenance scheme as the vector/BM25 indexes: refresh
        # appends postings at generation g and masks changed ids' old rows
        "generation": 0,
    }
    ipath = index_path(root, collection, _neardup_index_name(text_col))
    staging = ipath + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    if _store_exists(collection_path(root, collection)):
        docs = read_collection(spark, root, collection)
        imeta["id_type"] = dict(docs.dtypes)[id_col]
        posting = _band_postings(docs, id_col, text_col, imeta, gen=0)
        (posting
         .repartition(n_band_buckets * files_per_bucket,
                      F.col("band_bucket"))
         .write.partitionBy("band_bucket")
         .parquet(os.path.join(staging, "postings")))
    else:
        imeta["id_type"] = "string"  # empty store: no files, no postings
    with open(os.path.join(staging, INDEX_META_FILE), "w") as fh:
        json.dump(imeta, fh, indent=2, sort_keys=True)
    atomic_replace_dir(staging, ipath)
    return imeta


def refresh_neardup_index(spark: SparkSession, root: str, collection: str,
                          text_col: str = "document",
                          mask_compact_threshold: int | None = None) -> dict:
    """Absorb every mutation since ``built_version`` into the stored
    posting table without re-shingling the corpus: the delta log names the
    changed ids, their current rows fetch through the store's static
    id-bucket filter (O(|delta|)), and their band postings APPEND at
    generation g into the existing band-bucket layout while (id, upto_gen)
    masks hide the ids' older rows.  Same crash-safe write order as every
    other index kind (claim g → masks → appends → commit) via
    ``operators.index.run_incremental_refresh``."""
    from .index import index_path, run_incremental_refresh  # noqa: PLC0415
    from .upsert import collection_meta  # noqa: PLC0415

    if collection_meta(root, collection) is None:
        raise ValueError(f"collection {collection!r} has no meta sidecar")
    imeta = neardup_index_meta(root, collection, text_col)
    if imeta is None:
        raise ValueError(
            f"no persisted near-dup index for {collection!r}/{text_col!r}; "
            f"run build_neardup_index first")
    id_col = imeta["id_col"]
    ipath = index_path(root, collection, _neardup_index_name(text_col))

    def append_fn(fresh: DataFrame, g: int) -> None:
        posting = _band_postings(fresh, id_col, text_col, imeta, gen=g)
        (posting.write.mode("append").partitionBy("band_bucket")
         .parquet(os.path.join(ipath, "postings")))

    return run_incremental_refresh(
        spark, root, collection, ipath, imeta, append_fn,
        data_layouts=[("postings", "id", "band_bucket")],
        mask_compact_threshold=mask_compact_threshold)


def _require_fresh(root: str, collection: str, text_col: str) -> dict:
    imeta = neardup_index_meta(root, collection, text_col)
    if imeta is None:
        raise ValueError(
            f"no persisted near-dup index for {collection!r}/{text_col!r}; "
            f"run build_neardup_index first")
    if not neardup_index_is_fresh(root, collection, text_col):
        raise ValueError(
            f"near-dup index for {collection!r}/{text_col!r} is STALE "
            f"(mutations landed after built_version="
            f"{imeta['built_version']}); run refresh_neardup_index (or "
            f"rebuild) before querying it")
    return imeta


def _masked_postings(spark: SparkSession, root: str, collection: str,
                     text_col: str) -> DataFrame:
    """The live posting rows (refresh masks applied); empty frame for an
    empty store."""
    from .index import _apply_masks, index_path  # noqa: PLC0415

    ipath = index_path(root, collection, _neardup_index_name(text_col))
    pdir = os.path.join(ipath, "postings")
    if not os.path.isdir(pdir):
        return spark.createDataFrame(
            [], "id string, band int, band_key string, gen int, "
                "band_bucket int")
    return _apply_masks(spark, ipath, spark.read.parquet(pdir), "id")


def neardup_pairs_indexed(spark: SparkSession, root: str, collection: str,
                          text_col: str = "document",
                          max_band_size: int | None = None) -> DataFrame:
    """Candidate near-dup pairs (id_a, id_b, n_bands_matched) straight off
    the persisted posting table — zero shingling, zero signature work; the
    only corpus-shaped cost left is the band-key equi-join itself.
    Identical semantics to ``dedup.minhash_lsh_pairs`` over the
    collection's current rows (same ``banded_pairs`` emitter, including
    the ``max_band_size`` star-edge cap).  Raises when the index is stale
    — a silently half-fresh pair set would make dedup drop the wrong
    docs."""
    _require_fresh(root, collection, text_col)
    banded = (_masked_postings(spark, root, collection, text_col)
              .select("id", "band", "band_key")
              .persist())  # both self-join sides read it
    return dedup._finalize(dedup.banded_pairs(banded, max_band_size),
                           banded)


def neardup_pairs_for_ids(spark: SparkSession, root: str, collection: str,
                          ids: DataFrame | list,
                          text_col: str = "document") -> DataFrame:
    """The O(|delta|) incremental probe: near-dup candidate pairs that
    INVOLVE at least one of ``ids`` (a one-column frame or a plain list),
    against the whole indexed corpus.

    Physical shape — nothing corpus-sized moves:
      1. the probe ids' current rows fetch through the store's static
         id-bucket filter (``read_rows_for_ids`` — O(|delta|));
      2. their signatures/bands recompute on just those rows;
      3. the probe bands' buckets collect driver-side (bounded by
         ``n_band_buckets``) and the posting scan takes a static
         ``band_bucket IN (...)`` partition filter;
      4. one equi-join probe-bands × pruned-postings on the band key; a
         probe-vs-probe match would surface twice (once from each side),
         so pairs normalize to (least, greatest) and dedupe per band
         before the match count.

    Returns (id_a, id_b, n_bands_matched) with id_a < id_b."""
    from .upsert import read_rows_for_ids  # noqa: PLC0415

    imeta = _require_fresh(root, collection, text_col)
    id_col = imeta["id_col"]
    if not isinstance(ids, DataFrame):
        from .localframe import local_frame  # noqa: PLC0415

        ids = local_frame(spark, [(v,) for v in ids],
                          f"id {imeta.get('id_type', 'string')}")
    probe_rows = read_rows_for_ids(spark, root, collection, ids)
    empty = spark.createDataFrame(
        [], f"id_a {imeta.get('id_type', 'string')}, "
            f"id_b {imeta.get('id_type', 'string')}, "
            f"n_bands_matched bigint")
    if probe_rows is None:
        return empty
    pb = (_band_postings(probe_rows, id_col, text_col, imeta, gen=0)
          .persist())
    # O(n_band_buckets) driver-side list — same bound as every other
    # touched-set probe in the store
    touched = sorted(r[0] for r in
                     pb.select("band_bucket").distinct().collect())
    if not touched:
        pb.unpersist()
        return empty
    pairs = _probe_pairs_plan(spark, root, collection, text_col, pb,
                              touched)
    return dedup._finalize(pairs, pb)


def neardup_pairs_for_frame(spark: SparkSession, root: str,
                            collection: str, frame: DataFrame,
                            text_col: str = "document",
                            id_col: str | None = None) -> DataFrame:
    """Screen an INCOMING frame (not yet stored) against the indexed
    corpus: near-dup candidate pairs between ``frame`` rows and STORED
    documents — the admission check a crawl-ingest loop runs BEFORE
    committing a snapshot (drop or audit the rows that duplicate the
    corpus, then upsert the survivors).  Within-frame duplicates are a
    plain ``dedup.minhash_lsh_pairs(frame)`` — this probe is
    frame-vs-stored only.

    Same physical shape as :func:`neardup_pairs_for_ids`: the frame
    bands locally (O(|frame|)), its band buckets collect driver-side
    (bounded by ``n_band_buckets``), and the posting scan takes the
    static ``band_bucket IN (...)`` partition filter.  Returns
    (id, stored_id, n_bands_matched); an incoming id that equals a
    stored id (a re-crawl) pairs with itself when the text still
    collides — callers decide whether that means "skip" or "update"."""
    imeta = _require_fresh(root, collection, text_col)
    id_col = id_col or imeta["id_col"]
    pb = (_band_postings(frame, id_col, text_col, imeta, gen=0)
          .persist())
    touched = sorted(r[0] for r in
                     pb.select("band_bucket").distinct().collect())
    if not touched:
        pb.unpersist()
        return spark.createDataFrame(
            [], f"id {imeta.get('id_type', 'string')}, "
                f"stored_id {imeta.get('id_type', 'string')}, "
                f"n_bands_matched bigint")
    postings = (_masked_postings(spark, root, collection, text_col)
                .filter(F.col("band_bucket").isin(touched)))
    pairs = (pb.select("band", "band_key", F.col("id"))
             .join(postings.select("band", "band_key",
                                   F.col("id").alias("stored_id")),
                   ["band", "band_key"])
             .groupBy("id", "stored_id")
             .agg(F.count("*").alias("n_bands_matched")))
    return dedup._finalize(pairs, pb)


# ---------------------------------------------------------------------------
# Second dedup-index kind (round 15): persisted SimHash chunk postings —
# the Hamming-distance twin of the MinHash artifact, same delta-log
# maintenance scaffold, chunk-bucket partition pruning instead of band
# buckets.  Demonstrates the dedup-index model is a FAMILY: any
# blocking-key near-dup strategy persists as (id, key..., gen) postings
# with an O(|delta|) refresh.
# ---------------------------------------------------------------------------

def _simhash_index_name(text_col: str) -> str:
    return f"{text_col}__simhash"


def simhash_index_meta(root: str, collection: str,
                       text_col: str = "document") -> dict | None:
    from .index import vector_index_meta  # noqa: PLC0415

    return vector_index_meta(root, collection, _simhash_index_name(text_col))


def simhash_index_is_fresh(root: str, collection: str,
                           text_col: str = "document") -> bool:
    from .upsert import collection_version  # noqa: PLC0415

    imeta = simhash_index_meta(root, collection, text_col)
    if imeta is None:
        return False
    return int(imeta["built_version"]) == collection_version(root, collection)


def _chunk_postings(df: DataFrame, id_col: str, text_col: str,
                    imeta: dict, gen: int) -> DataFrame:
    """(id, fp, chunk_idx, chunk_val, gen, chunk_bucket) posting rows —
    the ONE chunking implementation build and refresh share.  The
    fingerprint rides every posting row so the Hamming verify after a
    candidate join never re-reads text."""
    fp = dedup.simhash_table(df, text_col=text_col, id_col=id_col,
                             bits=int(imeta["bits"]))
    chunks = dedup.simhash_chunks(fp, int(imeta["bits"]),
                                  int(imeta["max_hamming"]))
    return (chunks
            .withColumn("gen", F.lit(int(gen)))
            .withColumn("chunk_bucket",
                        F.pmod(F.xxhash64("chunk_idx", "chunk_val"),
                               F.lit(int(imeta["n_chunk_buckets"])))
                        .cast("int")))


def build_simhash_index(spark: SparkSession, root: str, collection: str,
                        text_col: str = "document", bits: int = 64,
                        max_hamming: int = 3, n_chunk_buckets: int = 32,
                        files_per_bucket: int = 1) -> dict:
    """Materialize the SimHash chunk posting table for a stored
    collection.  ``max_hamming`` is BAKED INTO the artifact (it fixes the
    pigeonhole chunk count); queries may filter to any tighter distance
    but a looser one needs a rebuild — the guarantee "every pair within
    the distance shares a chunk" only holds for the built layout."""
    from .index import INDEX_META_FILE, atomic_replace_dir, index_path  # noqa: PLC0415
    from .upsert import (  # noqa: PLC0415
        _store_exists,
        collection_meta,
        collection_path,
        collection_version,
        read_collection,
    )

    if bits % (max_hamming + 1) != 0:
        raise ValueError(
            f"bits={bits} is not divisible by max_hamming+1="
            f"{max_hamming + 1}: the trailing bits would be silently "
            f"dropped from the chunk layout")
    meta = collection_meta(root, collection)
    if meta is None:
        raise ValueError(
            f"collection {collection!r} has no meta sidecar; create it via "
            f"create_collection/upsert before indexing")
    id_col = meta.get("id_col", "id")
    imeta = {
        "kind": "neardup_simhash",
        "text_col": text_col,
        "id_col": id_col,
        "bits": int(bits),
        "max_hamming": int(max_hamming),
        "n_chunk_buckets": int(n_chunk_buckets),
        "built_version": collection_version(root, collection),
        "generation": 0,
    }
    ipath = index_path(root, collection, _simhash_index_name(text_col))
    staging = ipath + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    if _store_exists(collection_path(root, collection)):
        docs = read_collection(spark, root, collection)
        imeta["id_type"] = dict(docs.dtypes)[id_col]
        (_chunk_postings(docs, id_col, text_col, imeta, gen=0)
         .repartition(n_chunk_buckets * files_per_bucket,
                      F.col("chunk_bucket"))
         .write.partitionBy("chunk_bucket")
         .parquet(os.path.join(staging, "postings")))
    else:
        imeta["id_type"] = "string"
    with open(os.path.join(staging, INDEX_META_FILE), "w") as fh:
        json.dump(imeta, fh, indent=2, sort_keys=True)
    atomic_replace_dir(staging, ipath)
    return imeta


def refresh_simhash_index(spark: SparkSession, root: str, collection: str,
                          text_col: str = "document",
                          mask_compact_threshold: int | None = None) -> dict:
    """O(|delta|) refresh for the SimHash artifact — same shared scaffold
    as every other index kind (claim g → masks → pruned fetch →
    chunk-posting append → commit)."""
    from .index import index_path, run_incremental_refresh  # noqa: PLC0415
    from .upsert import collection_meta  # noqa: PLC0415

    if collection_meta(root, collection) is None:
        raise ValueError(f"collection {collection!r} has no meta sidecar")
    imeta = simhash_index_meta(root, collection, text_col)
    if imeta is None:
        raise ValueError(
            f"no persisted SimHash index for {collection!r}/{text_col!r}; "
            f"run build_simhash_index first")
    id_col = imeta["id_col"]
    ipath = index_path(root, collection, _simhash_index_name(text_col))

    def append_fn(fresh: DataFrame, g: int) -> None:
        (_chunk_postings(fresh, id_col, text_col, imeta, gen=g)
         .write.mode("append").partitionBy("chunk_bucket")
         .parquet(os.path.join(ipath, "postings")))

    return run_incremental_refresh(
        spark, root, collection, ipath, imeta, append_fn,
        data_layouts=[("postings", "id", "chunk_bucket")],
        mask_compact_threshold=mask_compact_threshold)


def _require_fresh_simhash(root: str, collection: str,
                           text_col: str) -> dict:
    imeta = simhash_index_meta(root, collection, text_col)
    if imeta is None:
        raise ValueError(
            f"no persisted SimHash index for {collection!r}/{text_col!r}; "
            f"run build_simhash_index first")
    if not simhash_index_is_fresh(root, collection, text_col):
        raise ValueError(
            f"SimHash index for {collection!r}/{text_col!r} is STALE "
            f"(mutations landed after built_version="
            f"{imeta['built_version']}); run refresh_simhash_index (or "
            f"rebuild) before querying it")
    return imeta


def _masked_simhash_postings(spark: SparkSession, root: str,
                             collection: str, text_col: str) -> DataFrame:
    from .index import _apply_masks, index_path  # noqa: PLC0415

    ipath = index_path(root, collection, _simhash_index_name(text_col))
    pdir = os.path.join(ipath, "postings")
    if not os.path.isdir(pdir):
        return spark.createDataFrame(
            [], "id string, fp bigint, chunk_idx int, chunk_val bigint, "
                "gen int, chunk_bucket int")
    return _apply_masks(spark, ipath, spark.read.parquet(pdir), "id")


def simhash_pairs_indexed(spark: SparkSession, root: str, collection: str,
                          text_col: str = "document",
                          max_hamming: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) pairs off the persisted chunk postings —
    identical semantics to ``dedup.simhash_pairs`` over the collection's
    current rows.  ``max_hamming`` may TIGHTEN the stored distance (the
    chunk layout still finds every candidate); loosening raises."""
    imeta = _require_fresh_simhash(root, collection, text_col)
    built_h = int(imeta["max_hamming"])
    if max_hamming is None:
        max_hamming = built_h
    if max_hamming > built_h:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the built layout's "
            f"{built_h}: the pigeonhole guarantee only covers distances "
            f"≤ the built value — rebuild with a larger max_hamming")
    chunks = (_masked_simhash_postings(spark, root, collection, text_col)
              .select("id", "fp", "chunk_idx", "chunk_val")
              .persist())  # both self-join sides read it
    return dedup._finalize(
        dedup.simhash_chunk_pairs(chunks, max_hamming), chunks)


def simhash_pairs_for_ids(spark: SparkSession, root: str, collection: str,
                          ids: DataFrame | list,
                          text_col: str = "document") -> DataFrame:
    """The O(|delta|) SimHash probe: pairs involving at least one of
    ``ids`` — probe rows re-fingerprint (O(|delta|)), their chunk
    buckets collect driver-side, and the posting scan takes the static
    ``chunk_bucket IN (...)`` partition filter.  Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    from .upsert import read_rows_for_ids  # noqa: PLC0415

    imeta = _require_fresh_simhash(root, collection, text_col)
    id_col = imeta["id_col"]
    max_h = int(imeta["max_hamming"])
    if not isinstance(ids, DataFrame):
        from .localframe import local_frame  # noqa: PLC0415

        ids = local_frame(spark, [(v,) for v in ids],
                          f"id {imeta.get('id_type', 'string')}")
    probe_rows = read_rows_for_ids(spark, root, collection, ids)
    empty = spark.createDataFrame(
        [], f"id_a {imeta.get('id_type', 'string')}, "
            f"id_b {imeta.get('id_type', 'string')}, hamming int")
    if probe_rows is None:
        return empty
    pb = (_chunk_postings(probe_rows, id_col, text_col, imeta, gen=0)
          .persist())
    touched = sorted(r[0] for r in
                     pb.select("chunk_bucket").distinct().collect())
    if not touched:
        pb.unpersist()
        return empty
    postings = (_masked_simhash_postings(spark, root, collection, text_col)
                .filter(F.col("chunk_bucket").isin(touched)))
    joined = (pb.select("chunk_idx", "chunk_val",
                        F.col("id").alias("_p_id"),
                        F.col("fp").alias("_p_fp"))
              .join(postings.select("chunk_idx", "chunk_val",
                                    F.col("id").alias("_c_id"),
                                    F.col("fp").alias("_c_fp")),
                    ["chunk_idx", "chunk_val"])
              .filter(F.col("_p_id") != F.col("_c_id")))
    pairs = (joined.select(
        F.least("_p_id", "_c_id").alias("id_a"),
        F.greatest("_p_id", "_c_id").alias("id_b"),
        F.bit_count(F.col("_p_fp").bitwiseXOR(F.col("_c_fp")))
        .alias("hamming"))
        .distinct()  # probe-vs-probe matches arrive once per side
        .filter(F.col("hamming") <= max_h))
    return dedup._finalize(pairs, pb)


def _probe_pairs_plan(spark: SparkSession, root: str, collection: str,
                      text_col: str, pb: DataFrame,
                      touched: list[int]) -> DataFrame:
    """The probe join plan — separate from the finalizing wrapper so tests
    can assert the static band_bucket partition filter BEFORE the result
    is checkpointed (checkpointing cuts the visible plan)."""
    postings = (_masked_postings(spark, root, collection, text_col)
                .filter(F.col("band_bucket").isin(touched)))
    joined = (pb.select("band", "band_key", F.col("id").alias("_p_id"))
              .join(postings.select("band", "band_key",
                                    F.col("id").alias("_c_id")),
                    ["band", "band_key"])
              .filter(F.col("_p_id") != F.col("_c_id")))
    return (joined.select(
        "band",
        F.least("_p_id", "_c_id").alias("id_a"),
        F.greatest("_p_id", "_c_id").alias("id_b"))
        .distinct()  # probe-vs-probe matches arrive once per side
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands_matched")))
