"""Incremental (shard-vs-corpus) exact dedup against a PERSISTED
hash store — the shape a continuously-crawled corpus needs: the base
corpus is hashed ONCE into a bucket-partitioned parquet store, and
each incoming shard probes that store instead of re-reading 100 TB of
history.

Store layout follows the repo's persisted-artifact convention
(``build_inverted_index`` / ``build_ivf_index``): content-keyed cache
dir under /tmp, ``_SUCCESS`` marker, crash-wipe rebuild, parquet
partitioned by ``bucket = hash(text_hash) % num_buckets`` so the probe
join reads bucket partitions in parallel (and prunes when a shard maps
to few buckets).

The probe itself never broadcasts and never moves text: shard rows are
(doc_id, text_hash) keys, the store side is distinct hashes, and both
meet in the standard union-cogroup join; the within-shard keep-first
winner is decided vectorized inside a bucket-keyed ``map_groups`` (one
lexsort + run scan per bucket, not one Python call per hash).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.text_stats import md5_fingerprint
from .joins import cogroup_attach, string_key_buckets
from .text_analysis import read_documents

DEFAULT_SHARD_SOURCE = "src1"


def _plant_collisions(batch: pa.Table) -> pa.Table:
    """Deterministic planted collisions (mirrored exactly in the SQL
    oracle — the redact_pii/clean_corpus idiom): the organic corpus has
    no cross-source duplicate texts, so without planting the
    history-hit and within-shard-dup branches never fire.

    - ``doc_id % 20 in (1, 2) and (doc_id//20) % 5 == 0``: the same
      'hist shared <v>' text lands in the shard (src1) AND the base
      (src2) -> history hits.
    - ``doc_id % 20 == 1 and (doc_id//20) % 5 == 2``: 'shard dup <v>'
      texts repeat WITHIN the shard only -> keep-first winners that
      are genuinely new.
    """
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    m = ids // 20
    hist = ((ids % 20 == 1) | (ids % 20 == 2)) & (m % 5 == 0)
    dup = (ids % 20 == 1) & (m % 5 == 2)
    if not (hist.any() or dup.any()):
        return batch
    text = np.asarray(batch.column("text").to_pylist(), object)
    text[hist] = [f"hist shared {v}" for v in (m[hist] % 4)]
    text[dup] = [f"shard dup {v}" for v in (m[dup] % 3)]
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(text.tolist(), pa.string()),
    )


def _hash_rows(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "text_hash": pa.array(
                [md5_fingerprint(t or "") for t in texts], pa.string()
            ),
        }
    )


def build_hash_store(
    sf_dir: str,
    exclude_source: str = DEFAULT_SHARD_SOURCE,
    num_buckets: int = 16,
    out_dir: str | None = None,
) -> str:
    """Persist the base corpus's distinct text hashes (every source
    except ``exclude_source`` — the slice that plays "history") as
    bucket-partitioned parquet. Single streaming pass + one key-only
    distinct groupby; text never leaves the map stage."""
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        tag = hashlib.md5(
            f"{src}:{exclude_source}:{num_buckets}:{content_tag}:planted"
            .encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_hashstore/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def base_hashes(batch: pa.Table) -> pa.Table:
        batch = _plant_collisions(batch)
        keep = pc.not_equal(
            pc.fill_null(batch.column("source"), ""), exclude_source
        )
        batch = batch.filter(keep)
        rows = _hash_rows(batch).select(["text_hash"])
        # local distinct before the global one
        rows = rows.group_by("text_hash").aggregate([])
        return rows.append_column(
            "bucket",
            pa.array(
                string_key_buckets(rows.column("text_hash"), num_buckets),
                pa.int32(),
            ),
        )

    # global distinct VECTORIZED per bucket (a groupby(text_hash)
    # map_groups would make one Python call per distinct hash); the
    # bucket doubles as the store partition key
    def distinct_in_bucket(group: pa.Table) -> pa.Table:
        return group.group_by(["text_hash", "bucket"]).aggregate([])

    distinct = (
        docs.map_batches(base_hashes, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pyarrow")
    )

    distinct.write_parquet(out_dir, partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def incremental_dedup(
    sf_dir: str,
    shard_source: str = DEFAULT_SHARD_SOURCE,
    store_dir: str | None = None,
) -> ray.data.Dataset:
    """Dedup the incoming shard (``source == shard_source``) against
    the persisted base-corpus hash store AND against itself:
    (doc_id, text_hash, is_new) where ``is_new`` means the doc is the
    first occurrence of its text within the shard (min doc_id) and the
    hash is absent from the store."""
    if store_dir is None:
        store_dir = build_hash_store(sf_dir, exclude_source=shard_source)

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def shard_rows(batch: pa.Table) -> pa.Table:
        batch = _plant_collisions(batch)
        keep = pc.equal(
            pc.fill_null(batch.column("source"), ""), shard_source
        )
        return _hash_rows(batch.filter(keep))

    shard = docs.map_batches(shard_rows, batch_format="pyarrow")
    store = ray.data.read_parquet(store_dir, columns=["text_hash"])

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "in_store", pa.array(np.ones(batch.num_rows, bool))
        )

    attached = cogroup_attach(
        shard,
        store.map_batches(mark, batch_format="pyarrow"),
        "text_hash",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("text_hash", pa.string()),
        ],
        payload_fields=[pa.field("in_store", pa.bool_())],
    )

    # verdicts per BUCKET of hashes, resolved vectorized with one
    # lexsort + run-boundary scan — a groupby(text_hash).map_groups
    # would make one Python call per distinct hash
    num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(
                string_key_buckets(batch.column("text_hash"), num_parts),
                pa.int32(),
            ),
        )

    def verdict_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        codes = (
            pc.dictionary_encode(group.column("text_hash").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        stored = pc.fill_null(group.column("in_store"), False).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ids, codes))
        cs = codes[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        # any in_store across each hash run (stored is per-row: the
        # cogroup marks every row of a stored hash)
        run_stored = np.logical_or.reduceat(stored[order], starts)
        is_new = np.zeros(len(ids), bool)
        is_new[order[starts]] = ~run_stored
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text_hash": group.column("text_hash"),
                "is_new": pa.array(is_new, pa.bool_()),
            }
        )

    return (
        attached.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verdict_bucket, batch_format="pyarrow")
    )


# -- incremental NEAR-dup (MinHash shard-vs-store) ---------------------------

NEAR_PASSAGE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    " mu nu xi omicron pi rho sigma tau upsilon"
)  # 20 tokens -> ~19 3-gram shingles; one appended token => J ~ 0.95


def _plant_near(batch: pa.Table) -> pa.Table:
    """Planting for the MinHash incremental probe (mirrored in SQL):
    the exact 'hist shared' rule from ``_plant_collisions`` (J = 1
    cross-partition pairs) plus a NEAR rule — doc_id % 20 in (1, 6)
    and (doc_id//20) % 5 == 1 docs share a 20-token passage, with the
    shard copies carrying one extra trailing token so the pair is
    near- but not exact-duplicate (J ~ 0.95 >= 0.8). The corpus
    generator sets source = src{doc_id % 20}, so residue 1 lands in
    the shard and residue 6 in the base."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    m = ids // 20
    hist = ((ids % 20 == 1) | (ids % 20 == 2)) & (m % 5 == 0)
    near = ((ids % 20 == 1) | (ids % 20 == 6)) & (m % 5 == 1)
    if not (hist.any() or near.any()):
        return batch
    src = np.asarray(
        pc.fill_null(batch.column("source"), "").to_pylist(), object
    )
    text = np.asarray(batch.column("text").to_pylist(), object)
    text[hist] = [f"hist shared {v}" for v in (m[hist] % 4)]
    is_shard = src == DEFAULT_SHARD_SOURCE
    text[near] = [
        f"near shared {v} {NEAR_PASSAGE}" + (" shardtail" if s else "")
        for v, s in zip(m[near] % 4, is_shard[near])
    ]
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(text.tolist(), pa.string()),
    )


def build_minhash_store(
    sf_dir: str,
    exclude_source: str = DEFAULT_SHARD_SOURCE,
    num_perm: int = 64,
    bands: int = 16,
    out_dir: str | None = None,
) -> str:
    """Persist the base corpus's LSH index: ``bands/`` holds distinct
    (band_key, doc_id) rows and ``sigs/`` the 512-byte signatures —
    the artifact a continuously-crawled corpus keeps so each incoming
    shard probes the index instead of re-reading 100 TB of history.
    Same content-keyed cache + _SUCCESS discipline as the exact-dup
    hash store."""
    from .dedup import make_minhash_fn, MinHashStage, _MINHASH_CACHE

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        # "planted2" versions the _plant_near rule: changing the
        # planting must invalidate the cached store
        tag = hashlib.md5(
            f"mh:{src}:{exclude_source}:{num_perm}:{bands}:{content_tag}"
            f":planted2".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_minhash_store/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def base_only(batch: pa.Table) -> pa.Table:
        batch = _plant_near(batch)
        keep = pc.not_equal(
            pc.fill_null(batch.column("source"), ""), exclude_source
        )
        return batch.filter(keep)

    base = docs.map_batches(base_only, batch_format="pyarrow")
    band_fn = make_minhash_fn(num_perm, bands)
    base.map_batches(band_fn, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "bands")
    )

    def sig_rows(batch: pa.Table) -> pa.Table:
        hasher = _MINHASH_CACHE.setdefault(
            (num_perm, bands), MinHashStage(num_perm, bands)
        ).hasher
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array(
                    [
                        hasher.signature(t).tobytes()
                        for t in batch.column("text").to_pylist()
                    ],
                    pa.binary(),
                ),
            }
        )

    base.map_batches(sig_rows, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "sigs")
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def incremental_minhash(
    sf_dir: str,
    shard_source: str = DEFAULT_SHARD_SOURCE,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    store_dir: str | None = None,
) -> ray.data.Dataset:
    """Near-dup the incoming shard against the PERSISTED MinHash LSH
    store: (shard_doc, base_doc, est_jaccard) for every shard doc
    whose signature agrees with a history doc on >= 1 of ``bands``
    bands AND whose estimated Jaccard >= ``threshold``.

    Everything is key-only or spilled: shard and store band rows meet
    in one coarse band_key-bucketed groupby that emits CROSS pairs
    (shard x base only, vectorized per band run); pair dedup is an
    aggregate; signatures attach through two ``cogroup_attach`` rounds
    (shard side computed in-flight, store side read from the persisted
    parquet) — no broadcast, no driver materialization at any tier.
    """
    from .dedup import make_minhash_fn, MinHashStage, _MINHASH_CACHE

    if store_dir is None:
        store_dir = build_minhash_store(
            sf_dir, exclude_source=shard_source,
            num_perm=num_perm, bands=bands,
        )

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def shard_only(batch: pa.Table) -> pa.Table:
        batch = _plant_near(batch)
        keep = pc.equal(
            pc.fill_null(batch.column("source"), ""), shard_source
        )
        return batch.filter(keep)

    shard = docs.map_batches(shard_only, batch_format="pyarrow")
    band_fn = make_minhash_fn(num_perm, bands)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8))
            )

        return f

    shard_bands = shard.map_batches(band_fn, batch_format="pyarrow")
    store_bands = ray.data.read_parquet(os.path.join(store_dir, "bands"))
    tagged = shard_bands.map_batches(tag(0), batch_format="pyarrow").union(
        store_bands.map_batches(tag(1), batch_format="pyarrow")
    )

    num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(
                string_key_buckets(batch.column("band_key"), num_parts),
                pa.int32(),
            ),
        )

    def cross_pairs(group: pa.Table) -> pa.Table:
        """Per bucket: for each band_key run, emit shard x base pairs
        — one dictionary-encode + lexsort, vectorized emission."""
        keys = group.column("band_key").combine_chunks()
        codes = (
            pc.dictionary_encode(keys)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        side = group.column("side").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, side, codes))
        c, s, d = codes[order], side[order], ids[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.r_[starts[1:], len(c)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for lo, hi in zip(starts, ends):
            sh = d[lo:hi][s[lo:hi] == 0]
            ba = d[lo:hi][s[lo:hi] == 1]
            if len(sh) and len(ba):
                out_a.append(np.repeat(sh, len(ba)))
                out_b.append(np.tile(ba, len(sh)))
        if not out_a:
            return pa.Table.from_pydict(
                {"shard_doc": pa.array([], pa.int64()),
                 "base_doc": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "shard_doc": pa.array(np.concatenate(out_a), pa.int64()),
                "base_doc": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    pairs = (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: cross_pairs(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        # a pair can surface from several bands: aggregate-dedup
        .groupby(["shard_doc", "base_doc"])
        .count()
        .map_batches(
            lambda b: b.select(["shard_doc", "base_doc"]),
            batch_format="pyarrow",
        )
    )

    def shard_sigs(batch: pa.Table) -> pa.Table:
        hasher = _MINHASH_CACHE.setdefault(
            (num_perm, bands), MinHashStage(num_perm, bands)
        ).hasher
        return pa.Table.from_pydict(
            {
                "shard_doc": batch.column("doc_id"),
                "sig_a": pa.array(
                    [
                        hasher.signature(t).tobytes()
                        for t in batch.column("text").to_pylist()
                    ],
                    pa.binary(),
                ),
            }
        )

    j1 = cogroup_attach(
        pairs,
        shard.map_batches(shard_sigs, batch_format="pyarrow"),
        "shard_doc",
        left_fields=[
            pa.field("shard_doc", pa.int64()),
            pa.field("base_doc", pa.int64()),
        ],
        payload_fields=[pa.field("sig_a", pa.binary())],
    )

    def rename_store(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["base_doc", "sig_b"])

    j2 = cogroup_attach(
        j1,
        ray.data.read_parquet(os.path.join(store_dir, "sigs")).map_batches(
            rename_store, batch_format="pyarrow"
        ),
        "base_doc",
        left_fields=[
            pa.field("shard_doc", pa.int64()),
            pa.field("base_doc", pa.int64()),
            pa.field("sig_a", pa.binary()),
        ],
        payload_fields=[pa.field("sig_b", pa.binary())],
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = np.frombuffer(
            b"".join(batch.column("sig_a").to_pylist() or [b""]), np.uint64
        ).reshape(batch.num_rows, num_perm) if batch.num_rows else np.zeros(
            (0, num_perm), np.uint64
        )
        b_ = np.frombuffer(
            b"".join(batch.column("sig_b").to_pylist() or [b""]), np.uint64
        ).reshape(batch.num_rows, num_perm) if batch.num_rows else np.zeros(
            (0, num_perm), np.uint64
        )
        est = (a == b_).mean(axis=1) if batch.num_rows else np.zeros(0)
        keep = est >= threshold
        return pa.Table.from_pydict(
            {
                "shard_doc": batch.column("shard_doc").filter(
                    pa.array(keep)
                ),
                "base_doc": batch.column("base_doc").filter(pa.array(keep)),
                "est_jaccard": pa.array(
                    np.round(est[keep], 6), pa.float64()
                ),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


# -- corpus snapshot diff (dataset versioning) -------------------------------


def corpus_diff(sf_dir: str) -> ray.data.Dataset:
    """Dataset-versioning diff between two corpus snapshots: per doc
    ``(doc_id, status)`` with status in added / removed / modified /
    unchanged, decided by CONTENT HASH comparison (the mechanism a
    real snapshot diff uses), not by knowing the edit plan. v2 is
    derived deterministically from v1 so the oracle is a closed form
    of the planting: doc_id % 31 == 4 removed (checked first),
    else % 17 == 3 modified (text + ' v2prime'), and % 23 == 5 spawns
    an added doc at doc_id + 1_000_000.

    Scale shape: ONE read emits both sides' key-only (doc_id, h, side)
    rows per batch (v2 is derived in-batch; with a real second
    snapshot this is a union of two pruned reads — text never
    shuffles either way), then one doc-bucketed exchange where each
    bucket resolves statuses vectorized (lexsort + run scan).
    """
    from .joins import default_num_buckets, int_key_buckets

    docs = read_documents(sf_dir, ("doc_id", "text"))
    num_parts = default_num_buckets()

    def both_sides(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        h1 = np.asarray(
            [md5_fingerprint(t or "") for t in texts], object
        )
        removed = ids % 31 == 4
        modified = (ids % 17 == 3) & ~removed
        spawns = ids % 23 == 5
        # v1 side
        d = [ids]
        h = [h1]
        s = [np.zeros(len(ids), np.int8)]
        # v2 side: survivors (modified docs re-hash)
        keep = ~removed
        h2 = h1.copy()
        if modified.any():
            h2[modified] = [
                md5_fingerprint((texts[i] or "") + " v2prime")
                for i in np.flatnonzero(modified)
            ]
        d.append(ids[keep])
        h.append(h2[keep])
        s.append(np.ones(int(keep.sum()), np.int8))
        # v2 side: added docs
        if spawns.any():
            idx = np.flatnonzero(spawns)
            d.append(ids[idx] + 1_000_000)
            h.append(
                np.asarray(
                    [md5_fingerprint((texts[i] or "") + " new") for i in idx],
                    object,
                )
            )
            s.append(np.ones(len(idx), np.int8))
        dd = np.concatenate(d)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(dd, pa.int64()),
                "h": pa.array(np.concatenate(h).tolist(), pa.string()),
                "side": pa.array(np.concatenate(s), pa.int8()),
                "bucket": pa.array(int_key_buckets(dd, num_parts)),
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                }
            )
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s = group.column("side").to_numpy(zero_copy_only=False)
        h = np.asarray(group.column("h").to_pylist(), object)
        order = np.lexsort((s, d))
        d, s, h = d[order], s[order], h[order]
        first = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.r_[first, len(d)])
        status = np.empty(len(first), object)
        two = counts == 2
        f2 = first[two]
        status[two] = np.where(h[f2] == h[f2 + 1], "unchanged", "modified")
        one = counts == 1
        status[one] = np.where(s[first[one]] == 0, "removed", "added")
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d[first], pa.int64()),
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    return (
        docs.map_batches(both_sides, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def build_eval_shingle_store(
    sf_dir: str,
    n: int = 8,
    holdout_mod: int = 50,
    out_dir: str | None = None,
) -> str:
    """Persist the eval set's DISTINCT shingle hashes — the benchmark
    artifact a continuously-crawled corpus screens every incoming
    shard against (the eval suite changes rarely; rehashing it per
    shard ingest would be waste). Same content-keyed cache + _SUCCESS
    discipline as the MinHash/exact-dup stores; the hashes are the
    decontaminate ones (md5 ``hash64`` == ``md5_number_upper``)."""
    from .lm_filters import _plant_leaks, _shingle_hash_rows

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        # "leaks1" versions the _plant_leaks rule (a cache tag must
        # version the planting)
        tag = hashlib.md5(
            f"evalsh:{src}:{n}:{holdout_mod}:{content_tag}:leaks1".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_eval_shingles/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def eval_partial(batch: pa.Table) -> pa.Table:
        batch = _plant_leaks(batch, holdout_mod)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % holdout_mod == 0))
        hv, _ = _shingle_hash_rows(sub, n)
        return pa.Table.from_pydict(
            {"h": pa.array(np.unique(hv).view(np.int64), pa.int64())}
        )

    # one key-only groupby makes the store globally distinct (the
    # probe cogroup requires a unique right side)
    (
        docs.map_batches(eval_partial, batch_format="pyarrow")
        .groupby("h")
        .count()
        .map_batches(
            lambda b: b.select(["h"]), batch_format="pyarrow"
        )
        .write_parquet(os.path.join(out_dir, "shingles"))
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def incremental_decontaminate(
    sf_dir: str,
    shard_source: str = "src3",
    n: int = 8,
    holdout_mod: int = 50,
    store_dir: str | None = None,
) -> ray.data.Dataset:
    """Screen ONE incoming shard against the persisted benchmark
    store: (doc_id, n_hits) for every shard doc sharing >= 1 lowercased
    word ``n``-gram with any eval doc. The store is read from parquet
    (never recomputed, never broadcast); shard shingle rows are
    per-batch distinct == globally distinct (docs don't straddle
    batches), so the probe is ONE hash-keyed cogroup + ONE
    ``groupby(doc_id).count()`` — key-only exchanges throughout."""
    from .lm_filters import _plant_leaks, _shingle_hash_rows

    if store_dir is None:
        store_dir = build_eval_shingle_store(sf_dir, n, holdout_mod)

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def shard_rows(batch: pa.Table) -> pa.Table:
        batch = _plant_leaks(batch, holdout_mod)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src_ok = pc.equal(
            pc.fill_null(batch.column("source"), ""), shard_source
        ).to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(src_ok & (ids % holdout_mod != 0)))
        hv, dv = _shingle_hash_rows(sub, n)
        return pa.Table.from_pydict(
            {
                "h": pa.array(hv.view(np.int64), pa.int64()),
                "doc_id": pa.array(dv, pa.int64()),
            }
        )

    store = ray.data.read_parquet(
        os.path.join(store_dir, "shingles")
    ).map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "h": b.column("h"),
                "hit": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = cogroup_attach(
        docs.map_batches(shard_rows, batch_format="pyarrow"),
        store,
        key="h",
        left_fields=[
            pa.field("h", pa.int64()),
            pa.field("doc_id", pa.int64()),
        ],
        payload_fields=[pa.field("hit", pa.int8())],
    )

    def keep_hits(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.equal(batch.column("hit"), 1), False)
        return batch.filter(mask).select(["doc_id"])

    return (
        joined.map_batches(keep_hits, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "doc_id": b.column("doc_id"),
                    "n_hits": pc.cast(b.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def build_extract_store(sf_dir: str, out_dir: str | None = None) -> str:
    """Persist the v1 crawl's extraction: ``text/`` holds (url,
    extracted_text) and ``hashes/`` (url, page content hash64) — the
    per-partition lineage artifact that lets a later crawl of the same
    corpus re-extract ONLY what changed. Content-keyed cache +
    _SUCCESS discipline like every other store here."""
    from ..kernels.sketch import hash64_strings
    from ..sources.pages import pages_from_documents
    from .extract import extract_pipeline

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        tag = hashlib.md5(
            f"exstore:{src}:{content_tag}:v1".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_extract_store/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    pages = pages_from_documents(sf_dir)

    def hash_rows(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column("html").combine_chunks(), pa.string())
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "h": pa.array(
                    hash64_strings(html).view(np.int64), pa.int64()
                ),
            }
        )

    pages.map_batches(hash_rows, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "hashes")
    )
    (
        extract_pipeline(
            pages_from_documents(sf_dir), dedup=True, explode_giant=False
        )
        .select_columns(["url", "extracted_text"])
        .write_parquet(os.path.join(out_dir, "text"))
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def incremental_extract(
    sf_dir: str,
    store_dir: str | None = None,
    changed_broadcast_budget: int = 4_000_000,
) -> ray.data.Dataset:
    """Extract the v2 crawl INCREMENTALLY against the persisted v1
    store: pages whose content hash is unchanged reuse the stored
    text (the extraction kernels never see them); changed pages
    re-extract. Output: (url, extracted_text, reused) — byte-identical
    to a from-scratch v2 extraction, which is exactly what the oracle
    checks.

    Scale shape: the change verdict is ONE key-only cogroup of (url,
    h2) against the hash store. Under ``changed_broadcast_budget`` the
    changed-url set broadcasts (sorted membership probe; the page
    payloads never shuffle); past it, the verdict cogroup-attaches
    onto the pages directly (full-row exchange of ONLY the changed
    fraction's batches is impossible to avoid without a second source
    read — the same documented fallback class as the exact-dedup
    winner filter). Unchanged rows attach the stored text through one
    more key-only cogroup. Tiers pinned equal in tests."""
    from ..kernels.sketch import hash64_strings
    from ..sources.pages import pages_from_documents
    from .dedup import _collect_within_budget
    from .extract import extract_pipeline

    if store_dir is None:
        store_dir = build_extract_store(sf_dir)

    pages = pages_from_documents(sf_dir, snapshot="v2")

    def key_rows(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column("html").combine_chunks(), pa.string())
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "h2": pa.array(
                    hash64_strings(html).view(np.int64), pa.int64()
                ),
            }
        )

    v2_keys = pages.map_batches(key_rows, batch_format="pyarrow")
    store_hashes = ray.data.read_parquet(os.path.join(store_dir, "hashes"))
    verdict = cogroup_attach(
        v2_keys,
        store_hashes,
        key="url",
        left_fields=[
            pa.field("url", pa.string()),
            pa.field("h2", pa.int64()),
        ],
        payload_fields=[pa.field("h", pa.int64())],
    )

    def changed_only(batch: pa.Table) -> pa.Table:
        same = pc.fill_null(
            pc.equal(batch.column("h2"), batch.column("h")), False
        )
        return batch.filter(pc.invert(same)).select(["url"])

    changed = verdict.map_batches(changed_only, batch_format="pyarrow")
    changed_tbl = _collect_within_budget(changed, changed_broadcast_budget)

    if changed_tbl is not None:
        urls = (
            np.sort(
                np.asarray(changed_tbl.column("url").to_pylist(), object)
            )
            if changed_tbl.num_rows and "url" in changed_tbl.column_names
            else np.empty(0, object)
        )
        ref = ray.put(urls)

        def split_mask(batch: pa.Table) -> np.ndarray:
            want = ray.get(ref)
            u = np.asarray(batch.column("url").to_pylist(), object)
            if len(want) == 0 or len(u) == 0:
                return np.zeros(len(u), bool)
            pos = np.minimum(np.searchsorted(want, u), len(want) - 1)
            return want[pos] == u

        changed_pages = pages.map_batches(
            lambda b: b.filter(pa.array(split_mask(b))),
            batch_format="pyarrow",
        )
    else:
        # over-budget tier: attach the verdict onto the pages (the
        # documented full-row fallback) and filter
        marked = cogroup_attach(
            pages,
            changed.map_batches(
                lambda b: b.append_column(
                    "chg", pa.array(np.ones(b.num_rows, np.int8), pa.int8())
                ),
                batch_format="pyarrow",
            ),
            key="url",
            left_fields=[
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ],
            payload_fields=[pa.field("chg", pa.int8())],
        )
        changed_pages = marked.map_batches(
            lambda b: b.filter(
                pc.fill_null(pc.equal(b.column("chg"), 1), False)
            ).select(["url", "warc_ts", "html", "text", "lang"]),
            batch_format="pyarrow",
        )

    def finish_fresh(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "url": b.column("url"),
                # parquet round-trips large_string as string; keep both
                # union sides on the same type
                "extracted_text": pc.cast(
                    b.column("extracted_text"), pa.string()
                ),
                "reused": pa.array(np.zeros(b.num_rows, bool)),
            }
        )

    fresh = (
        extract_pipeline(changed_pages, dedup=True, explode_giant=False)
        .select_columns(["url", "extracted_text"])
        .map_batches(finish_fresh, batch_format="pyarrow")
    )

    # unchanged rows: key-only attach of the stored text
    def unchanged_only(batch: pa.Table) -> pa.Table:
        same = pc.fill_null(
            pc.equal(batch.column("h2"), batch.column("h")), False
        )
        return batch.filter(same).select(["url"])

    unchanged = verdict.map_batches(unchanged_only, batch_format="pyarrow")
    store_text = ray.data.read_parquet(
        os.path.join(store_dir, "text")
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("extracted_text"),
            "extracted_text",
            pc.cast(b.column("extracted_text"), pa.string()),
        ),
        batch_format="pyarrow",
    )
    reused = cogroup_attach(
        unchanged,
        store_text,
        key="url",
        left_fields=[pa.field("url", pa.string())],
        payload_fields=[pa.field("extracted_text", pa.string())],
    ).map_batches(
        lambda b: b.append_column(
            "reused", pa.array(np.ones(b.num_rows, bool))
        ),
        batch_format="pyarrow",
    )

    return fresh.union(reused)
