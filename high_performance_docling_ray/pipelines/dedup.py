"""Corpus deduplication pipelines over the ``documents`` table.

Five strategies, all Ray-Data-first (SURVEY.md §2.6 corpus-level ops):

* exact         — md5(text) hash keys; local per-batch combiner, then one
                  hash-shuffle groupby keeping the min doc_id per hash.
* minhash LSH   — per-batch MinHash signatures (stateful actor pool:
                  permutation params built once in ``__init__``), band
                  keys flat-mapped to (band_key, doc) rows, groupby on
                  band buckets, candidate verification by signature
                  similarity inside the group. Only candidate pairs —
                  never the full cross product — cross the wire.
* simhash       — 64-bit simhash, segment-bucket grouping, Hamming
                  verification within buckets.
* n-gram jaccard— exact Jaccard verification of LSH candidates.
* embedding     — cosine near-dup over the ``embeddings`` table via
                  LSH-free block-broadcast: per-batch normalized matmul
                  against a broadcast (ray.put) normalized matrix.
                  Quadratic in corpus size, so the batch side streams
                  while the broadcast side is the smaller index; at
                  100 TB you'd shard the index (IVF) — documented in
                  pipelines/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.dedup import MinHasher, hamming64, simhash64, simhash_bucket_keys
from ..kernels.text_stats import jaccard, md5_fingerprint, ngram_set


def read_documents(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# -- exact ------------------------------------------------------------------

def _add_md5(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return batch.append_column(
        "text_hash", pa.array([md5_fingerprint(t) for t in texts])
    )


def _local_min_doc(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep min doc_id per hash before the shuffle."""
    order = pc.sort_indices(
        batch, sort_keys=[("text_hash", "ascending"), ("doc_id", "ascending")]
    )
    tbl = batch.take(order)
    hashes = tbl.column("text_hash").to_pylist()
    mask = [i == 0 or hashes[i] != hashes[i - 1] for i in range(len(hashes))]
    return tbl.filter(pa.array(mask))


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Keep the lowest doc_id per exact text hash. Returns
    (doc_id, text_hash) of survivors."""
    ds = read_documents(sf_dir)
    return (
        ds.map_batches(_add_md5, batch_format="pyarrow")
        .select_columns(["doc_id", "text_hash"])
        .map_batches(_local_min_doc, batch_format="pyarrow")
        .groupby("text_hash")
        .min("doc_id")
    )


# -- minhash LSH ------------------------------------------------------------

class MinHashStage:
    """Actor-pool stage: signature + band keys per document."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3) -> None:
        self.hasher = MinHasher(num_perm=num_perm, ngram=ngram)
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc: list[int] = []
        out_key: list[str] = []
        out_sig: list[bytes] = []
        for doc_id, text in zip(doc_ids, texts):
            sig = self.hasher.signature(text)
            sig_bytes = sig.tobytes()
            for key in self.hasher.band_keys(sig, self.bands):
                out_doc.append(doc_id)
                out_key.append(key)
                out_sig.append(sig_bytes)
        return pa.Table.from_pydict(
            {"doc_id": out_doc, "band_key": out_key, "signature": out_sig}
        )


def _bucket_pairs(group: pa.Table, threshold: float) -> pa.Table:
    """Within one LSH bucket: verify candidate pairs by estimated
    Jaccard (signature agreement); emit doc_a < doc_b pairs."""
    doc_ids = group.column("doc_id").to_pylist()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in group.column("signature").to_pylist()]
    rows = sorted(range(len(doc_ids)), key=lambda i: doc_ids[i])
    out_a, out_b, out_sim = [], [], []
    for ii in range(len(rows)):
        for jj in range(ii + 1, len(rows)):
            i, j = rows[ii], rows[jj]
            if doc_ids[i] == doc_ids[j]:
                continue
            sim = float(np.mean(sigs[i] == sigs[j]))
            if sim >= threshold:
                a, b = sorted((doc_ids[i], doc_ids[j]))
                out_a.append(a)
                out_b.append(b)
                out_sim.append(sim)
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "est_jaccard": pa.array(out_sim, pa.float64()),
        }
    )


def minhash_candidate_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs (doc_a, doc_b, est_jaccard),
    deduped across bands."""
    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) // 2))
    ds = read_documents(sf_dir)
    pairs = (
        ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs={"num_perm": num_perm, "bands": bands},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby("band_key")
        .map_groups(lambda g: _bucket_pairs(g, threshold), batch_format="pyarrow")
    )
    # A pair can surface from several bands: dedup on (doc_a, doc_b).
    return pairs.groupby(["doc_a", "doc_b"]).max("est_jaccard")


def minhash_dedup(sf_dir: str, threshold: float = 0.7) -> ray.data.Dataset:
    """Survivors after dropping the higher doc_id of each near-dup pair."""
    pairs = minhash_candidate_pairs(sf_dir, threshold)
    drop = set(r["doc_b"] for r in pairs.select_columns(["doc_b"]).take_all())
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = [i not in d for i in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return read_documents(sf_dir, columns=("doc_id",)).map_batches(
        keep, batch_format="pyarrow"
    )


# -- simhash ----------------------------------------------------------------

def _simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_doc, out_key, out_hash = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        h = simhash64(text)
        for key in simhash_bucket_keys(h):
            out_doc.append(doc_id)
            out_key.append(key)
            out_hash.append(h)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "bucket": out_key,
            "simhash": pa.array(out_hash, pa.uint64()),
        }
    )


def _simhash_bucket_pairs(group: pa.Table, max_hamming: int) -> pa.Table:
    doc_ids = group.column("doc_id").to_pylist()
    hashes = group.column("simhash").to_pylist()
    out_a, out_b, out_d = [], [], []
    order = sorted(range(len(doc_ids)), key=lambda i: doc_ids[i])
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            if doc_ids[i] == doc_ids[j]:
                continue
            d = hamming64(int(hashes[i]), int(hashes[j]))
            if d <= max_hamming:
                a, b = sorted((doc_ids[i], doc_ids[j]))
                out_a.append(a)
                out_b.append(b)
                out_d.append(d)
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_d, pa.int32()),
        }
    )


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    ds = read_documents(sf_dir)
    pairs = (
        ds.map_batches(_simhash_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _simhash_bucket_pairs(g, max_hamming), batch_format="pyarrow"
        )
    )
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming")


# -- exact n-gram jaccard verification --------------------------------------

def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, ngram: int = 3
) -> ray.data.Dataset:
    """LSH candidates verified with EXACT n-gram Jaccard: join the
    candidate pairs back to texts via a broadcast lookup (documents is
    the small side per bucket at test scale; at corpus scale this would
    be a co-partitioned join on doc_id)."""
    texts = {
        r["doc_id"]: r["text"] for r in read_documents(sf_dir).take_all()
    }
    text_ref = ray.put(texts)
    cands = minhash_candidate_pairs(sf_dir, threshold=0.3, num_perm=64, bands=32)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(text_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(
            batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()
        ):
            j = jaccard(ngram_set(lookup[a], ngram), ngram_set(lookup[b], ngram))
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return cands.map_batches(verify, batch_format="pyarrow")
