"""Similarity search over the ``embeddings`` table (list<float> column).

* ``knn_brute`` — brute-force cosine top-k: the query matrix is tiny
  and broadcast once via ``ray.put``; each Arrow batch does one
  float64 matmul (vectorized numpy), emits its local top-k, and a
  final small sort picks the global top-k. Streaming: the corpus side
  never materializes.
* ``knn_ivf`` — the scale path over a PERSISTED index
  (``build_ivf_index``): one-time coarse-quantizer train + full-corpus
  assignment written as parquet partitioned by list id; each query
  loads the centroids and reads ONLY its ``nprobe`` list partitions.
  Approximate by design (recall depends on nprobe) — rows-only at the
  driver gate; nprobe == n_lists equals brute force (test-pinned).
* ``embedding_neardup_pairs`` — EXACT cosine >= threshold pairs via
  broadcast blocked matmul (no shuffle; oracle-verified); past the
  broadcast budget it routes to the IVF-sharded tier.
* ``embedding_neardup_ivf`` — the same EXACT contract with NO corpus
  broadcast: persisted IVF lists + per-list angular radii prune list
  pairs with a provably lossless spherical-cap bound; each surviving
  list pair is one independent exact block matmul task.
* ``embedding_neardup_lsh`` — the approximate variant: sign-LSH with
  multi-probe, (vec_id, bucket)-only shuffle, vectorized verify
  against the broadcast normalized matrix; recall asserted vs the
  exact pipeline on planted near-duplicates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    from .io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def embeddings_num_rows(sf_dir: str) -> int:
    """Corpus vector count from parquet FOOTER metadata — the tier
    probe. Never spend a full Ray execution (``ds.count()``) on a
    budget decision (session-8 sharp edge)."""
    from .io import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/embeddings.parquet")


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """list<float> column -> (N, D) float64 without a Python round-trip.

    The Arrow list values buffer is contiguous when every row has the
    same dimension (our embeddings do), so flatten() + reshape is a
    single buffer view + one dtype cast; falls back to to_pylist for
    ragged input."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding").combine_chunks()
    n = len(col)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if n and (widths == widths[0]).all():
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mat = np.asarray(flat, dtype=np.float64).reshape(n, int(widths[0]))
    else:
        mat = np.array(col.to_pylist(), dtype=np.float64).reshape(n, -1)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def knn_brute(
    sf_dir: str, query: np.ndarray, k: int = 10
) -> pa.Table:
    """Global cosine top-k for one query vector.

    Returns (vec_id, cosine) sorted desc, ties broken by vec_id asc —
    the same ordering the oracle SQL uses.
    """
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _normalize(mat) @ qv
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1)[:kk] if kk else np.array([], int)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cosine": pa.array(np.round(sims[part], 6), pa.float64()),
            }
        )

    local = read_embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow")
    # Global reduce: local top-k rows are tiny (k per block).
    rows = local.take_all()
    rows.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    top = rows[:k]
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


class IvfIndex:
    """Coarse quantizer trained once (per driver) and broadcast to the
    probe stage. Deterministic: seeded k-means-lite (a few Lloyd
    iterations over a fixed sample)."""

    def __init__(self, centroids: np.ndarray) -> None:
        self.centroids = _normalize(centroids)

    @classmethod
    def train(cls, sample: np.ndarray, n_lists: int = 16, iters: int = 5,
              seed: int = 0) -> "IvfIndex":
        rng = np.random.RandomState(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        picks = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
        centroids = sample[np.sort(picks)].copy()
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
        return cls(centroids)

    def probe_lists(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        sims = self.centroids @ (q / (np.linalg.norm(q) or 1.0))
        return np.argsort(-sims, kind="stable")[:nprobe]


def build_ivf_index(
    sf_dir: str,
    n_lists: int = 16,
    out_dir: str | None = None,
    sample_rows: int = 2048,
) -> str:
    """One-time PERSISTED IVF index build (the 10^12-vector shape).

    Trains the coarse quantizer on a bounded sample, then assigns the
    FULL corpus in one streaming ``map_batches`` pass and writes it as
    parquet partitioned by ``list_id`` (plus ``centroids.npy``). Every
    subsequent query loads the centroids and reads ONLY its ``nprobe``
    list partitions — no retraining, no full-corpus re-assignment
    (VERDICT r1: the old knn_ivf re-trained per query).

    Returns the index directory. Idempotent: an existing ``_SUCCESS``
    marker short-circuits the rebuild.
    """
    import hashlib
    import os

    from .io import atomic_store

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        # idempotence key includes a CONTENT fingerprint: regenerating
        # the parquet at the same path invalidates the cached index
        tag = hashlib.md5(
            f"{src}:{n_lists}:{content_tag}".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_ivf/{tag}"

    def _build(d: str) -> None:
        # Deterministic hash-sample for the quantizer train set: a
        # multiplicative hash on vec_id keeps ~target rows drawn
        # uniformly from the WHOLE corpus (the old limit() prefix
        # sampled only the first file's rows — biased, and fixed-size
        # regardless of n_lists). Scales with list count; exact at
        # small corpora.
        target = max(sample_rows, 32 * n_lists)
        n_total = embeddings_num_rows(sf_dir)
        sample_src = read_embeddings(sf_dir)
        if n_total > 2 * target:
            frac = min(1.0, 2.0 * target / n_total)
            cut = np.uint64(min(2**64 - 1, int(frac * 2.0**64)))

            def hash_keep(b: pa.Table) -> pa.Table:
                ids = (
                    b.column("vec_id").to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                h = ids * np.uint64(0x9E3779B97F4A7C15)  # wraps mod 2^64
                return b.filter(pa.array(h < cut))

            sample_src = sample_src.map_batches(
                hash_keep, batch_format="pyarrow"
            )
        sample = np.array(
            [
                r["embedding"]
                for r in sample_src.limit(4 * target).take_all()
            ],
            dtype=np.float64,
        )
        index = IvfIndex.train(sample, n_lists=n_lists)
        np.save(os.path.join(d, "centroids.npy"), index.centroids)
        cent_ref = ray.put(index.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            centroids = ray.get(cent_ref)
            _ids, mat = _batch_matrix(batch)
            lists = np.argmax(_normalize(mat) @ centroids.T, axis=1)
            return batch.append_column(
                "list_id", pa.array(lists.astype(np.int32), pa.int32())
            )

        read_embeddings(sf_dir).map_batches(
            assign, batch_format="pyarrow"
        ).write_parquet(os.path.join(d, "lists"), partition_cols=["list_id"])

    return atomic_store(out_dir, _build)


def knn_ivf(
    sf_dir: str, query: np.ndarray, k: int = 10, n_lists: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF ANN over the PERSISTED index: load centroids, pick the
    ``nprobe`` nearest lists, and read only those parquet partitions —
    partition pruning does the candidate filtering, the scan never
    touches the other ``n_lists - nprobe`` lists."""
    import os

    index_dir = build_ivf_index(sf_dir, n_lists=n_lists)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    index = IvfIndex(centroids)
    q = np.asarray(query, dtype=np.float64)
    probes = index.probe_lists(q, nprobe).tolist()
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    import glob

    paths = [
        f
        for l in probes
        for f in sorted(
            glob.glob(
                os.path.join(index_dir, "lists", f"list_id={int(l)}", "*.parquet")
            )
        )
    ]
    if not paths:
        return pa.Table.from_pydict(
            {"vec_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _normalize(mat) @ qv
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1)[:kk] if kk else np.array([], int)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cosine": pa.array(np.round(sims[part], 6), pa.float64()),
            }
        )

    rows = (
        ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    top = rows[:k]
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


def _ivf_list_radii(index_dir: str) -> np.ndarray:
    """Per-list angular radius ``r_l = max angle(member, centroid_l)``
    of a persisted IVF index, computed in ONE streaming pass over the
    list partitions and cached as ``radii.npy`` beside the centroids.

    The radii power the EXACT list-pair pruning bound in
    ``embedding_neardup_ivf``: on the unit sphere the angular triangle
    inequality gives ``theta(x, y) >= theta(c1, c2) - r1 - r2`` for any
    ``x`` in list 1 and ``y`` in list 2, so
    ``cos(x, y) <= cos(max(0, theta_c - r1 - r2))`` — a list pair whose
    bound falls below the threshold provably contains no qualifying
    pair and is never read."""
    import os

    cache = os.path.join(index_dir, "radii.npy")
    if os.path.exists(cache):
        return np.load(cache)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    cent_ref = ray.put(centroids)
    n_lists = len(centroids)

    def partial_max(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        lists = (
            batch.column("list_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        _ids, mat = _batch_matrix(batch)
        # angle to the OWN centroid only: one gather + row-dot, not a
        # full matmul against every centroid
        dots = np.einsum("ij,ij->i", _normalize(mat), cent[lists])
        ang = np.arccos(np.clip(dots, -1.0, 1.0))
        out = np.zeros(len(cent), dtype=np.float64)
        np.maximum.at(out, lists, ang)
        present = np.zeros(len(cent), dtype=bool)
        present[lists] = True
        return pa.Table.from_pydict(
            {
                "list_id": pa.array(
                    np.nonzero(present)[0].astype(np.int64), pa.int64()
                ),
                "radius": pa.array(out[present], pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(os.path.join(index_dir, "lists"))
        .map_batches(partial_max, batch_format="pyarrow")
        .take_all()
    )  # tiny: <= n_lists rows per input block
    radii = np.zeros(n_lists, dtype=np.float64)
    for r in partials:
        li = int(r["list_id"])
        radii[li] = max(radii[li], float(r["radius"]))
    np.save(cache, radii)
    return radii


def _ivf_candidate_list_pairs(
    index_dir: str, threshold: float
) -> list[dict]:
    """List pairs (l1 <= l2) surviving the lossless spherical-cap
    bound; on clustered corpora this prunes most of the k*(k+1)/2
    pairs, on isotropic-random ones (radii near pi/2) it keeps all."""
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    radii = _ivf_list_radii(index_dir)
    theta_c = np.arccos(np.clip(centroids @ centroids.T, -1.0, 1.0))
    slack = np.maximum(0.0, theta_c - radii[:, None] - radii[None, :])
    keep = np.triu(np.cos(slack) >= threshold - 1e-9)
    ii, jj = np.nonzero(keep)
    return [{"l1": int(a), "l2": int(b)} for a, b in zip(ii, jj)]


def embedding_neardup_ivf(
    sf_dir: str,
    threshold: float = 0.4,
    n_lists: int = 16,
) -> ray.data.Dataset:
    """EXACT cosine >= threshold pairs, IVF-sharded — the 10^12-vector
    shape of ``embedding_neardup_pairs`` (same output contract, no
    corpus broadcast anywhere).

    Shape: the persisted IVF index (``build_ivf_index``) partitions the
    corpus by list id once; per-list angular radii (``_ivf_list_radii``)
    prune list pairs with the spherical-cap bound
    ``cos(x, y) <= cos(max(0, theta(c1, c2) - r1 - r2))`` — pruning is
    PROVABLY lossless, so the output is exactly the brute-force pair
    set (test-pinned, and hash-verified against the same cross-join
    oracle as the broadcast path). Each surviving list pair becomes one
    independent task that reads ONLY its two partitions: the smaller
    side loads whole, the larger streams row-group-wise, so task memory
    is one list + one row group (at larger corpora, raise ``n_lists``
    to shrink lists). Every pair surfaces exactly once because list
    assignment is unique — no shuffle, no pair dedup."""
    import glob
    import os

    import pyarrow.parquet as pq

    index_dir = build_ivf_index(sf_dir, n_lists=n_lists)
    cand = _ivf_candidate_list_pairs(index_dir, threshold)

    def _list_paths(l: int) -> list[str]:
        return sorted(
            glob.glob(
                os.path.join(index_dir, "lists", f"list_id={l}", "*.parquet")
            )
        )

    empty = pa.Table.from_pydict(
        {
            "vec_id_a": pa.array([], pa.int64()),
            "vec_id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def _load_list(paths: list[str]) -> tuple[np.ndarray, np.ndarray]:
        t = pq.read_table(paths, columns=["vec_id", "embedding"])
        return _batch_matrix(t)

    def _emit(
        aid: np.ndarray, amat: np.ndarray, bid: np.ndarray, bmat: np.ndarray
    ) -> pa.Table | None:
        sims = amat @ bmat.T
        ri, ci = np.nonzero(sims >= threshold)
        if not len(ri):
            return None
        a, b = aid[ri], bid[ci]
        keep = a != b
        a, b, cos = a[keep], b[keep], sims[ri[keep], ci[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(lo, pa.int64()),
                "vec_id_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    def pair_task(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():  # batch_size=1: one list pair
            l1, l2 = row["l1"], row["l2"]
            p1, p2 = _list_paths(l1), _list_paths(l2)
            if not p1 or not p2:
                continue
            if l1 == l2:
                ids, mat = _load_list(p1)
                nm = np.ascontiguousarray(_normalize(mat))
                sims = nm @ nm.T
                ri, ci = np.triu_indices(len(ids), k=1)
                ok = sims[ri, ci] >= threshold
                if ok.any():
                    a, b = ids[ri[ok]], ids[ci[ok]]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    outs.append(
                        pa.Table.from_pydict(
                            {
                                "vec_id_a": pa.array(lo, pa.int64()),
                                "vec_id_b": pa.array(hi, pa.int64()),
                                "cosine": pa.array(
                                    sims[ri[ok], ci[ok]], pa.float64()
                                ),
                            }
                        )
                    )
                continue
            # cross pair: smaller side whole, larger side streamed
            if sum(os.path.getsize(p) for p in p1) > sum(
                os.path.getsize(p) for p in p2
            ):
                p1, p2 = p2, p1
            aid, amat = _load_list(p1)
            anm = np.ascontiguousarray(_normalize(amat))
            for path in p2:
                pf = pq.ParquetFile(path)
                for rb in pf.iter_batches(columns=["vec_id", "embedding"]):
                    bid, bmat = _batch_matrix(pa.Table.from_batches([rb]))
                    got = _emit(aid, anm, bid, _normalize(bmat))
                    if got is not None:
                        outs.append(got)
        return pa.concat_tables(outs) if outs else empty

    src = ray.data.from_items(cand, override_num_blocks=max(1, len(cand)))
    return src.map_batches(pair_task, batch_size=1, batch_format="pyarrow")


def _embedding_dim(sf_dir: str) -> int:
    rows = read_embeddings(sf_dir).limit(1).take_all()
    return len(rows[0]["embedding"]) if rows else 0


def _embedding_cogroup_verify(
    sf_dir: str, pairs_ds: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """Distributed verify tier: normalized vectors attach to candidate
    pairs through the union-cogroup join by vec_id (the
    ``_minhash_cogroup_verify`` pattern, dedup.py) — the corpus matrix
    never lands on the driver and never broadcasts. Two keyed rounds
    (one per pair side); vectors travel as fixed-size binary rows and
    the cosine is one zero-copy buffer view + einsum per batch."""
    from .joins import cogroup_attach

    d = _embedding_dim(sf_dir)
    width = d * 8
    nv_type = pa.binary(width)

    def side_reader(col: str) -> ray.data.Dataset:
        def rename(b: pa.Table) -> pa.Table:
            ids, mat = _batch_matrix(b)
            nm = np.ascontiguousarray(_normalize(mat))
            arr = pa.FixedSizeBinaryArray.from_buffers(
                nv_type, len(ids), [None, pa.py_buffer(nm.tobytes())]
            )
            return pa.Table.from_pydict(
                {col: pa.array(ids, pa.int64()), f"nv_{col}": arr}
            )

        return read_embeddings(sf_dir).map_batches(
            rename, batch_format="pyarrow"
        )

    j1 = cogroup_attach(
        pairs_ds,
        side_reader("vec_id_a"),
        "vec_id_a",
        left_fields=[
            pa.field("vec_id_a", pa.int64()),
            pa.field("vec_id_b", pa.int64()),
        ],
        payload_fields=[pa.field("nv_vec_id_a", nv_type)],
    )
    j2 = cogroup_attach(
        j1,
        side_reader("vec_id_b"),
        "vec_id_b",
        left_fields=[
            pa.field("vec_id_a", pa.int64()),
            pa.field("vec_id_b", pa.int64()),
            pa.field("nv_vec_id_a", nv_type),
        ],
        payload_fields=[pa.field("nv_vec_id_b", nv_type)],
    )

    def _mat(col: pa.ChunkedArray) -> np.ndarray:
        a = col.combine_chunks()
        flat = np.frombuffer(a.buffers()[1], dtype=np.float64)
        return flat[a.offset * d : (a.offset + len(a)) * d].reshape(-1, d)

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column("nv_vec_id_a")),
                pc.is_valid(batch.column("nv_vec_id_b")),
            )
        )
        empty = pa.Table.from_pydict(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        a = np.asarray(batch.column("vec_id_a").to_numpy(), dtype=np.int64)
        b = np.asarray(batch.column("vec_id_b").to_numpy(), dtype=np.int64)
        cos = np.einsum(
            "ij,ij->i",
            _mat(batch.column("nv_vec_id_a")),
            _mat(batch.column("nv_vec_id_b")),
        )
        keep = cos >= threshold
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


def _normalized_index(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, normalized matrix) of the whole embeddings table, built
    with a streaming per-batch normalize and one driver concat. This is
    the broadcast side of the IN-BUDGET tiers only; past the budget the
    exact path is ``embedding_neardup_ivf`` and LSH verify is
    ``_embedding_cogroup_verify`` — neither touches this."""
    def norm_batch(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "nemb": pa.array(list(_normalize(mat)), pa.list_(pa.float64())),
            }
        )

    parts = (
        read_embeddings(sf_dir)
        .map_batches(norm_batch, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    tabs = [t for t in ray.get(parts) if t.num_rows]
    tbl = pa.concat_tables(tabs)
    ids = np.asarray(tbl.column("vec_id").to_numpy(zero_copy_only=False))
    mat = np.array(tbl.column("nemb").to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def embedding_neardup_pairs(
    sf_dir: str,
    threshold: float = 0.4,
    broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """EXACT cosine >= threshold pairs (vec_id_a < vec_id_b, cosine).

    In-budget tier — broadcast blocked matmul: the normalized index
    matrix is ``ray.put`` ONCE; each streaming batch computes one
    float64 batch @ index.T (vectorized) and emits its qualifying pairs
    with id_a < id_b — each pair surfaces in exactly one batch, so
    there is NO shuffle and no pair dedup. Past ``broadcast_budget``
    vectors (the regime where the corpus matrix cannot land on one
    node) it routes to ``embedding_neardup_ivf`` — the IVF-sharded
    tier with lossless list-pair pruning, same exact output
    (tier-equality test-pinned). ``embedding_neardup_lsh`` is the
    approximate path with the same output contract."""
    if embeddings_num_rows(sf_dir) > broadcast_budget:
        return embedding_neardup_ivf(sf_dir, threshold=threshold)
    ids, nm = _normalized_index(sf_dir)
    idx_ref = ray.put((ids, nm))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, index = ray.get(idx_ref)
        bids, mat = _batch_matrix(batch)
        sims = _normalize(mat) @ index.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < all_ids[jj]
        ii, jj = ii[keep], jj[keep]
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(bids[ii], pa.int64()),
                "vec_id_b": pa.array(all_ids[jj], pa.int64()),
                "cosine": pa.array(sims[ii, jj], pa.float64()),
            }
        )

    return read_embeddings(sf_dir).map_batches(
        block_pairs, batch_format="pyarrow"
    )


def embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 3,
    verify_broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Approximate cosine near-dup pairs via sign-LSH + exact verify.

    Scale shape: ONLY (vec_id, bucket) rows cross the shuffle — the
    embedding itself never replicates through the exchange. Buckets
    (exact key + all 1-bit multi-probe flips) group on a coarse
    partition of the bucket key; candidate pairs come out of vectorized
    per-run pairing; verification is one fancy-indexed row-product
    against the broadcast normalized matrix — or, when the corpus
    exceeds ``verify_broadcast_budget`` vectors (the regime where the
    matrix cannot broadcast), the distributed union-cogroup attach
    (``_embedding_cogroup_verify``; both tiers test-pinned equal).
    Recall is high but not 1 (sign-LSH misses are possible) — asserted
    against the exact pipeline in tests/test_state_and_ops.py with
    planted near-duplicates.
    """
    from .dedup import _runs_apply

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        planes_local = np.random.RandomState(seed).randn(mat.shape[1], n_planes)
        nm = _normalize(mat)
        bits = (nm @ planes_local) > 0
        weights = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)
        keys = bits.astype(np.int64) @ weights
        flips = keys[:, None] ^ (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        out_key = np.concatenate([keys[:, None], flips], axis=1).ravel()
        out_id = np.repeat(ids, n_planes + 1)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(out_key, pa.int64()),
            }
        )

    num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        part = (bk % num_parts).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def run_pairs(run: pa.Table) -> pa.Table:
        n = run.num_rows
        empty = pa.Table.from_pydict(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        ids = np.unique(
            np.asarray(run.column("vec_id").to_numpy(), dtype=np.int64)
        )
        if len(ids) < 2:
            return empty
        if len(ids) > 4096:  # deterministic hot-bucket cap (see dedup)
            print(f"[neardup] hot LSH bucket capped: {len(ids)} -> 4096")
            ids = ids[:4096]
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(ids[ii], pa.int64()),
                "vec_id_b": pa.array(ids[jj], pa.int64()),
            }
        )

    key_rows = read_embeddings(sf_dir).map_batches(
        sig_batch, batch_format="pyarrow"
    )
    from .dedup import _pairs_from_key_rows

    # budgeted driver path (see dedup._pairs_from_key_rows); bucketed
    # Ray groupby as the over-budget fallback
    direct = _pairs_from_key_rows(key_rows, "bucket", run_pairs)
    if direct is not None:
        pair_tbl = direct.group_by(["vec_id_a", "vec_id_b"]).aggregate([])
    else:
        cand = (
            key_rows.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: _runs_apply(
                    g.drop_columns(["part"]), "bucket", run_pairs
                ),
                batch_format="pyarrow",
            )
        )
        from .relational import _combine_partials

        # materialize once: the None fallback's groupby then reuses
        # these blocks instead of re-running the upstream DAG
        cand = cand.materialize()
        merged = _combine_partials(cand, ["vec_id_a", "vec_id_b"], [], agg="max")
        if merged is None:
            pair_tbl = pa.Table.from_pylist(
                cand.groupby(["vec_id_a", "vec_id_b"]).count().take_all()
            ).select(["vec_id_a", "vec_id_b"])
        else:
            pair_tbl = merged.select(["vec_id_a", "vec_id_b"])

    n_vectors = embeddings_num_rows(sf_dir)
    if n_vectors > verify_broadcast_budget:
        return _embedding_cogroup_verify(
            sf_dir, ray.data.from_arrow(pair_tbl), threshold
        )

    ids, nm = _normalized_index(sf_dir)
    pos = {int(v): i for i, v in enumerate(ids)}
    idx_ref = ray.put((pos, nm))

    def verify(batch: pa.Table) -> pa.Table:
        lookup, index = ray.get(idx_ref)
        a = np.asarray(batch.column("vec_id_a").to_numpy(), dtype=np.int64)
        b = np.asarray(batch.column("vec_id_b").to_numpy(), dtype=np.int64)
        if not len(a):
            return pa.Table.from_pydict(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ia = np.fromiter((lookup[int(x)] for x in a), np.int64, len(a))
        ib = np.fromiter((lookup[int(x)] for x in b), np.int64, len(b))
        cos = np.einsum("ij,ij->i", index[ia], index[ib])
        keep = cos >= threshold
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return ray.data.from_arrow(pair_tbl).map_batches(
        verify, batch_format="pyarrow"
    )


def quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Per-vector int8 scalar quantization stats: ``scale =
    max(|v|) / 127``, ``q_i = round(v_i / scale)``, reporting the
    reconstruction MSE and max abs error — the storage-shrink pass an
    embedding corpus runs before ANN indexing (4x smaller vectors;
    the stats column tells you whether recall will survive).

    Pure vectorized map (one matmul-free numpy pass per batch), no
    exchange at any scale. Emits stats rather than the int8 payload so
    the driver-gate oracle can reproduce it in SQL; the quantized
    bytes themselves would be written next to the IVF lists in a real
    deployment (same partitioned-store discipline).
    """

    def f(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        absmax = np.abs(mat).max(axis=1)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0)
        q = np.round(mat / scale[:, None])
        err = mat - q * scale[:, None]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "scale": pa.array(np.round(scale, 6), pa.float64()),
                "mse": pa.array(
                    np.round((err * err).mean(axis=1), 6), pa.float64()
                ),
                "max_abs_err": pa.array(
                    np.round(np.abs(err).max(axis=1), 6), pa.float64()
                ),
            }
        )

    return read_embeddings(sf_dir).map_batches(f, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-class embedding diagnostics a curator reads before trusting
    labels or training a classifier: ``(label, n_vecs, mean_norm,
    centroid_norm, mean_cos_to_centroid)`` — low mean cosine flags a
    mixed/noisy class, centroid_norm << mean_norm flags a class whose
    members cancel out.

    Pass 1: per-batch per-label (count, vector-sum, norm-sum) partials
    — one (labels x D) matrix per block regardless of corpus size —
    merged on the driver like HLL/CMS registers (elementwise add).
    Pass 2: centroids broadcast via ``ray.put``; each batch folds its
    cosine-to-own-centroid sums per label. Vectors never ride an
    exchange; both exchanges are replaced by register-style partials
    because the state is (labels x D), bounded by the label domain.
    """
    ds = read_embeddings(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _batch_matrix(batch)
        labels = (
            batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), np.float64)
        np.add.at(sums, inv, mat)
        norms = np.linalg.norm(mat, axis=1)
        n = np.bincount(inv).astype(np.int64)
        norm_sum = np.bincount(inv, weights=norms)
        return pa.Table.from_pydict(
            {
                "label": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
                "norm_sum": pa.array(norm_sum, pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "label": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
                "mean_norm": pa.array([], pa.float64()),
                "centroid_norm": pa.array([], pa.float64()),
                "mean_cos_to_centroid": pa.array([], pa.float64()),
            }
        )
    merged: dict[int, list] = {}
    for t in parts:
        labs = t.column("label").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        nsum = t.column("norm_sum").to_numpy(zero_copy_only=False)
        vs = t.column("vec_sum").to_pylist()
        for lab, n_, s_, v_ in zip(labs, ns, nsum, vs):
            cur = merged.setdefault(
                int(lab), [0, 0.0, np.zeros(len(v_), np.float64)]
            )
            cur[0] += int(n_)
            cur[1] += float(s_)
            cur[2] += np.asarray(v_, np.float64)
    labels_sorted = sorted(merged)
    centroids = {
        lab: merged[lab][2] / merged[lab][0] for lab in labels_sorted
    }
    cent_ref = ray.put(centroids)

    def cos_partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        _, mat = _batch_matrix(batch)
        labels = (
            batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        uniq, inv = np.unique(labels, return_inverse=True)
        cmat = np.stack([cents[int(l)] for l in uniq])
        cnorm = np.linalg.norm(cmat, axis=1)
        vnorm = np.linalg.norm(mat, axis=1)
        dots = np.einsum("ij,ij->i", mat, cmat[inv])
        denom = vnorm * cnorm[inv]
        denom[denom == 0.0] = 1.0
        cos = dots / denom
        return pa.Table.from_pydict(
            {
                "label": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "cos_sum": pa.array(
                    np.bincount(inv, weights=cos), pa.float64()
                ),
            }
        )

    cos_merged: dict[int, list] = {}
    for t in ray.get(
        ds.map_batches(cos_partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if t.num_rows == 0:
            continue
        for lab, n_, c_ in zip(
            t.column("label").to_numpy(zero_copy_only=False),
            t.column("n").to_numpy(zero_copy_only=False),
            t.column("cos_sum").to_numpy(zero_copy_only=False),
        ):
            cur = cos_merged.setdefault(int(lab), [0, 0.0])
            cur[0] += int(n_)
            cur[1] += float(c_)
    return pa.Table.from_pydict(
        {
            "label": pa.array(labels_sorted, pa.int64()),
            "n_vecs": pa.array(
                [merged[lab][0] for lab in labels_sorted], pa.int64()
            ),
            "mean_norm": pa.array(
                [
                    round(merged[lab][1] / merged[lab][0], 6)
                    for lab in labels_sorted
                ],
                pa.float64(),
            ),
            "centroid_norm": pa.array(
                [
                    round(float(np.linalg.norm(centroids[lab])), 6)
                    for lab in labels_sorted
                ],
                pa.float64(),
            ),
            "mean_cos_to_centroid": pa.array(
                [
                    round(cos_merged[lab][1] / cos_merged[lab][0], 6)
                    for lab in labels_sorted
                ],
                pa.float64(),
            ),
        }
    )


# -- bulk kNN-graph construction ----------------------------------------------

def _knn_graph_store(sf_dir: str) -> str:
    """Normalized whole-table shard store for the out-of-core kNN
    tier (content-keyed cache + _SUCCESS, the bitext convention)."""
    import hashlib
    import os

    from .io import atomic_store

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = hashlib.md5(f"{src}:knngraph:v1:{content_tag}".encode()).hexdigest()[
        :12
    ]
    out_dir = f"/tmp/graft_knngraph/{tag}"

    def norm_batch(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b)
        order = np.argsort(ids, kind="stable")
        nm = _normalize(mat)[order]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "nemb": pa.array(list(nm), pa.list_(pa.float64())),
            }
        )

    return atomic_store(
        out_dir,
        lambda d: read_embeddings(sf_dir)
        .map_batches(norm_batch, batch_format="pyarrow")
        .write_parquet(d),
    )


def knn_graph(
    sf_dir: str, k: int = 5, broadcast_budget: int = 2_000_000
) -> ray.data.Dataset:
    """k-nearest-neighbor GRAPH over the whole embeddings table — the
    bulk primitive behind graph-ANN indexes and SemDeDup-style
    clustering: every vector gets its k best cosine neighbors
    (self excluded), ranked.

    In-budget: the normalized matrix rides ``ray.put`` once; each
    streaming batch is one blocked matmul + vectorized row top-k.
    Past the budget: each batch streams the persisted normalized shard
    store instead (the bitext out-of-core tier) keeping a running
    top-k per row — nothing pinned on the driver; tiers test-pinned
    equal. Output: (vec_id, neighbor_id, cosine, rank).
    """
    import os

    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    in_budget = n_rows <= broadcast_budget
    if in_budget:
        ids_all, nm = _normalized_index(sf_dir)
        ref = ray.put((ids_all, nm))
        files = None
    else:
        from .bitext import _store_files

        files = _store_files(_knn_graph_store(sf_dir))

    def emit_topk(
        bids: np.ndarray, sims: np.ndarray, nbr_ids: np.ndarray
    ) -> pa.Table:
        # fully vectorized row top-k: argpartition + per-row lexsort
        kk = min(k, sims.shape[1])
        rows = np.arange(len(bids))[:, None]
        sel = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        top_c = sims[rows, sel]
        top_i = nbr_ids[sel]
        order = np.lexsort((top_i, -top_c), axis=1)
        top_c = top_c[rows, order]
        top_i = top_i[rows, order]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(np.repeat(bids, kk), pa.int64()),
                "neighbor_id": pa.array(top_i.ravel(), pa.int64()),
                "cosine": pa.array(
                    np.round(top_c.ravel(), 6), pa.float64()
                ),
                "rank": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), len(bids)),
                    pa.int64(),
                ),
            }
        )

    def block(batch: pa.Table) -> pa.Table:
        bids, mat = _batch_matrix(batch)
        bmat = _normalize(mat)
        if in_budget:
            all_ids, index = ray.get(ref)
            sims = bmat @ index.T
            # exclude self: set own column to -inf
            pos = np.searchsorted(all_ids, bids)
            sims[np.arange(len(bids)), pos] = -np.inf
            return emit_topk(bids, sims, all_ids)
        # out-of-core: running top-k across shards
        best_c = np.full((len(bids), k), -np.inf)
        best_id = np.full((len(bids), k), np.iinfo(np.int64).max, np.int64)
        from .bitext import _store_matrix

        for path in files:
            oids, opp = _store_matrix(path)
            sims = bmat @ opp.T
            hit = oids[None, :] == bids[:, None]
            sims[hit] = -np.inf
            cand_c = np.concatenate([best_c, sims], axis=1)
            cand_i = np.concatenate(
                [best_id, np.broadcast_to(oids, sims.shape)], axis=1
            )
            sel = np.argpartition(-cand_c, k - 1, axis=1)[:, :k]
            rows = np.arange(len(bids))[:, None]
            best_c = cand_c[rows, sel]
            best_id = cand_i[rows, sel]
        # final exact ordering per row: (cosine desc, neighbor asc)
        order = np.lexsort(
            (best_id, -best_c), axis=1
        )
        rows = np.arange(len(bids))[:, None]
        best_c = best_c[rows, order]
        best_id = best_id[rows, order]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(
                    np.repeat(bids, k), pa.int64()
                ),
                "neighbor_id": pa.array(best_id.ravel(), pa.int64()),
                "cosine": pa.array(
                    np.round(best_c.ravel(), 6), pa.float64()
                ),
                "rank": pa.array(
                    np.tile(np.arange(1, k + 1, dtype=np.int64), len(bids)),
                    pa.int64(),
                ),
            }
        )

    return read_embeddings(sf_dir).map_batches(block, batch_format="pyarrow")


# -- reciprocal-rank fusion (hybrid lexical + dense retrieval) -----------------


def rrf_fusion(
    sf_dir: str,
    query: np.ndarray | list | None = None,
    k_each: int = 20,
    k_out: int = 10,
    rrf_k: int = 60,
) -> pa.Table:
    """Hybrid retrieval: fuse the BM25 lexical top-``k_each`` (fixed
    query tokens, :func:`corpus_clean.bm25_topk`) with the dense
    cosine top-``k_each`` (query = vec 0's embedding by default,
    :func:`knn_brute`) by reciprocal-rank fusion
    (Cormack/Clarke/Buettcher 2009):

        rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))

    vec_id is the document's doc_id (the embeddings table is the
    documents' embedding column). Both candidate lists rank by their
    6dp-ROUNDED score with doc_id tie-break — exactly the oracle's
    ROW_NUMBER — so the integer ranks (and therefore the fused floats)
    are bit-identical to SQL by construction. Docs absent from a list
    contribute nothing for it (the standard top-k RRF contract).

    Scale shape: both retrieval legs are the existing distributed
    pipelines (register-partial BM25, per-block top-k cosine); the
    fusion itself touches <= 2*k_each rows on the driver —
    contract-bounded like every top-k in this repo.
    """
    from .corpus_clean import bm25_topk

    if query is None:
        import pyarrow.parquet as pq

        emb = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = emb.column("vec_id").to_numpy(zero_copy_only=False)
        pos = int(np.nonzero(ids == 0)[0][0]) if (ids == 0).any() else 0
        query = emb.column("embedding").to_pylist()[pos]

    lex = bm25_topk(sf_dir, k=k_each)
    den = knn_brute(sf_dir, np.asarray(query, np.float64), k=k_each)

    def ranked(tbl: pa.Table, id_col: str, score_col: str) -> dict[int, int]:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sc = tbl.column(score_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))  # score desc, id asc
        return {int(ids[i]): r + 1 for r, i in enumerate(order)}

    ra = ranked(lex, "doc_id", "score")
    rb = ranked(den, "vec_id", "cosine")
    all_ids = sorted(set(ra) | set(rb))
    rows = []
    for d in all_ids:
        a = ra.get(d)
        b = rb.get(d)
        s = (1.0 / (rrf_k + a) if a is not None else 0.0) + (
            1.0 / (rrf_k + b) if b is not None else 0.0
        )
        rows.append((d, round(s, 6), a, b))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k_out]
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "rrf_score": pa.array([r[1] for r in rows], pa.float64()),
            "bm25_rank": pa.array([r[2] for r in rows], pa.int64()),
            "cosine_rank": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# -- hard-negative mining ------------------------------------------------------

_HN_EMPTY = pa.Table.from_pydict(
    {
        "vec_id": pa.array([], pa.int64()),
        "neg_id": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def _hardneg_store(sf_dir: str) -> str:
    """Normalized + LABELED shard store for the out-of-core
    hard-negative tier (content-keyed cache + _SUCCESS, the knn-store
    convention) — the kNN store minus nothing, plus the label column
    the different-label mask needs. At 10^12 rows neither the matrix
    NOR the label vector is broadcastable, so labels ride the shards."""
    import hashlib
    import os

    from .io import atomic_store

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = hashlib.md5(
        f"{src}:hardneg:v1:{content_tag}".encode()
    ).hexdigest()[:12]
    out_dir = f"/tmp/graft_hardneg/{tag}"

    def norm_batch(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b)
        labs = b.column("label").to_numpy(zero_copy_only=False).astype(
            np.int32
        )
        order = np.argsort(ids, kind="stable")
        nm = _normalize(mat)[order]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "label": pa.array(labs[order], pa.int32()),
                "nemb": pa.array(list(nm), pa.list_(pa.float64())),
            }
        )

    return atomic_store(
        out_dir,
        lambda d: read_embeddings(sf_dir)
        .map_batches(norm_batch, batch_format="pyarrow")
        .write_parquet(d),
    )


def _store_matrix_labeled(
    path: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    labs = t.column("label").to_numpy(zero_copy_only=False).astype(np.int32)
    col = t.column("nemb").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, labs, np.asarray(flat, np.float64).reshape(len(col), -1)


def hard_negatives(
    sf_dir: str, broadcast_budget: int = 2_000_000
) -> ray.data.Dataset:
    """Hard-negative mining for contrastive training: for every
    vector, its single most-similar neighbor with a DIFFERENT label
    (cosine top-1 under the different-label mask) — the standard
    negative-sampling pass a contrastive/embedding-training pipeline
    runs over the corpus after labeling/clustering. Vectors whose
    label is the only one in the corpus drop (no negative exists),
    mirroring the oracle's inner join.

    Cosines round to 6dp BEFORE the (cosine DESC, neg_id ASC)
    selection so the argmax tie-break matches the oracle's
    ``row_number() OVER (ORDER BY round(cos, 6) DESC, neg_id)``
    exactly (the knn_brute convention). In-budget: the normalized
    matrix + label vector ride ``ray.put`` once, one blocked matmul
    per streaming batch. Past the budget: each batch streams the
    persisted LABELED shard store (labels are corpus-sized too —
    never driver-pinned) with a running best-(cos, id) merge, which
    is associative, so shard order can't change the answer;
    ``hard_negatives_sharded`` forces this tier against the shared
    oracle."""
    in_budget = embeddings_num_rows(sf_dir) <= broadcast_budget
    if in_budget:
        ids_all, nm = _normalized_index(sf_dir)
        import pyarrow.parquet as _pq

        lab_tbl = _pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
        )
        lids = lab_tbl.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        labs_all = lab_tbl.column("label").to_numpy(
            zero_copy_only=False).astype(np.int32)
        labs_all = labs_all[np.argsort(lids, kind="stable")][
            np.searchsorted(np.sort(lids), ids_all)
        ]
        ref = ray.put((ids_all, labs_all, nm))
        files = None
    else:
        from .bitext import _store_files

        ref = None
        files = _store_files(_hardneg_store(sf_dir))

    def shard_best(
        bmat: np.ndarray, blabs: np.ndarray,
        oids: np.ndarray, olabs: np.ndarray, omat: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray]:
        sims = np.round(bmat @ omat.T, 6)
        sims[blabs[:, None] == olabs[None, :]] = -np.inf
        mx = sims.max(axis=1) if sims.shape[1] else np.full(
            len(bmat), -np.inf
        )
        cand = sims == mx[:, None]
        nid = np.where(cand, oids[None, :], np.iinfo(np.int64).max).min(
            axis=1
        )
        return mx, nid

    def block(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return _HN_EMPTY
        bids, mat = _batch_matrix(batch)
        blabs = batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int32)
        bmat = _normalize(mat)
        best_c = np.full(len(bids), -np.inf)
        best_i = np.full(len(bids), np.iinfo(np.int64).max, np.int64)
        if files is None:
            oids, olabs, omat = ray.get(ref)
            best_c, best_i = shard_best(bmat, blabs, oids, olabs, omat)
        else:
            for path in files:
                oids, olabs, omat = _store_matrix_labeled(path)
                mx, nid = shard_best(bmat, blabs, oids, olabs, omat)
                upd = (mx > best_c) | ((mx == best_c) & (nid < best_i))
                best_c[upd] = mx[upd]
                best_i[upd] = nid[upd]
        keep = best_c > -np.inf
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(bids[keep], pa.int64()),
                "neg_id": pa.array(best_i[keep], pa.int64()),
                "cosine": pa.array(best_c[keep], pa.float64()),
            }
        )

    return read_embeddings(sf_dir).map_batches(
        block, batch_format="pyarrow"
    )
