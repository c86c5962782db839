"""Margin-based bitext mining (Artetxe & Schwenk 2019, the
LASER/CCMatrix recipe): pair up vectors from two corpora when each is
the other's best match under the RATIO MARGIN

    margin(x, y) = cos(x, y) / ((tkA(x) + tkB(y)) / 2)

where tkA(x) is the mean cosine of x's k nearest neighbors in B and
tkB(y) the mean of y's k nearest in A — the neighborhood terms cancel
hubness, the classic failure of raw-cosine mining. The two "languages"
here are deterministic halves of the embeddings table (even vs odd
vec_id); a real run would pass two tables.

Tiers (pinned equal by tests):
  - IN-BUDGET: one materialize loads and splits both sides; the
    normalized matrices ride ``ray.put`` once; ONE parity-branching
    stats pass (mean top-k per row) + ONE parity-branching best pass,
    all blocked matmuls — three topologies total. No shuffle until
    the final mutual check.
  - OUT-OF-CORE (past ``broadcast_budget`` vectors per side): each
    side is persisted as a normalized parquet shard store
    (content-keyed cache + _SUCCESS, the IVF-store convention); the
    stat pass streams the OPPOSITE store shard-by-shard inside each
    batch task (blocked out-of-core matmul — read amplification is
    #batches, the standard trade), stats re-attach to the stores via
    one key-only ``cogroup_attach``, and the best pass streams the
    augmented store the same way. Nothing is ever pinned on the
    driver.

Both tiers keep bit-identical float math: per-row top-k values are
sorted descending before the mean (one summation order), and the best
match is (max margin, then min id), tracked with exact float64
comparisons — so shard boundaries cannot flip a result.

The mutual-best check is ONE key-only exchange: forward and backward
best rows union, bucket by a pair hash, and a vectorized run-scan
keeps pairs present from both directions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .joins import cogroup_attach, int_key_buckets
from .similarity import _batch_matrix, _normalize, read_embeddings

K_NEIGHBORS = 4


def _side_ds(sf_dir: str, side: int) -> ray.data.Dataset:
    """One 'language' side: vec_id % 2 == side."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 2 == side)).select(
            ["vec_id", "embedding"]
        )

    return read_embeddings(sf_dir).map_batches(f, batch_format="pyarrow")


def _topk_mean(sims: np.ndarray, k: int) -> np.ndarray:
    """Row-wise mean of the k largest values, summed in DESCENDING
    order (one canonical summation order for both tiers)."""
    k = min(k, sims.shape[1])
    part = np.partition(sims, sims.shape[1] - k, axis=1)[:, -k:]
    part = -np.sort(-part, axis=1)  # descending
    return part.sum(axis=1, dtype=np.float64) / k


def _merge_topk(acc: np.ndarray | None, sims: np.ndarray, k: int) -> np.ndarray:
    """Running per-row top-k candidate set across shard chunks."""
    if acc is None:
        cand = sims
    else:
        cand = np.concatenate([acc, sims], axis=1)
    if cand.shape[1] <= k:
        return cand
    return np.partition(cand, cand.shape[1] - k, axis=1)[:, -k:]


def _best_update(
    best_m: np.ndarray,
    best_id: np.ndarray,
    margins: np.ndarray,
    ids: np.ndarray,
) -> None:
    """In-place (max margin, then min id) update — exact float64
    comparisons, so shard order cannot change the winner."""
    j = np.argmax(margins, axis=1)
    rows = np.arange(margins.shape[0])
    m = margins[rows, j]
    cand_id = ids[j]
    # within this chunk argmax takes the FIRST max = min index = min id
    # (ids ascend within a sorted shard); across chunks compare explicitly
    take = (m > best_m) | ((m == best_m) & (cand_id < best_id))
    best_m[take] = m[take]
    best_id[take] = cand_id[take]


# -- in-budget tier -----------------------------------------------------------

def _mutual_pairs(
    rows: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """(src_id, tgt_id, margin, dir) rows -> mutual-best pairs above
    threshold. One bucketed key-only exchange + vectorized run-scan."""
    num_parts = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        tgt = batch.column("tgt_id").to_numpy(zero_copy_only=False)
        pair = src.astype(np.int64) * np.int64(1 << 32) + tgt
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(pair, num_parts), pa.int32())
        )

    def runs(group: pa.Table) -> pa.Table:
        src = group.column("src_id").to_numpy(zero_copy_only=False)
        tgt = group.column("tgt_id").to_numpy(zero_copy_only=False)
        mg = group.column("margin").to_numpy(zero_copy_only=False)
        order = np.lexsort((tgt, src))
        src, tgt, mg = src[order], tgt[order], mg[order]
        same = (src[1:] == src[:-1]) & (tgt[1:] == tgt[:-1])
        keep = np.flatnonzero(same)  # second row of each mutual pair
        ok = mg[keep] >= threshold
        keep = keep[ok]
        return pa.Table.from_pydict(
            {
                "src_id": pa.array(src[keep], pa.int64()),
                "tgt_id": pa.array(tgt[keep], pa.int64()),
                "margin": pa.array(np.round(mg[keep], 6), pa.float64()),
            }
        )

    return (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: runs(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


def bitext_mine(
    sf_dir: str,
    threshold: float = 1.06,
    k: int = K_NEIGHBORS,
    broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Mutual-best margin pairs between the even- and odd-id halves of
    the embeddings table: (src_id, tgt_id, margin) with margin
    rounded to 6dp, margin >= threshold.

    In-budget topology count matters more than FLOPs at bench scale:
    the tier runs ONE materialize (both sides split driver-side), ONE
    parity-branching stats pass, and ONE parity-branching best pass
    fused into the mutual groupby — 3 executions, not 5 per-side ones
    (the q3/q5 lesson from NOTES_r3: operator spin-up dominates small
    build sides). The budget probe reads parquet metadata, not a
    ``count()`` execution."""
    import os

    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows
    if n_rows > broadcast_budget:
        return _bitext_mine_sharded(sf_dir, threshold=threshold, k=k)

    parts = [
        t
        for t in ray.get(
            read_embeddings(sf_dir).materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    ids, mat = _batch_matrix(pa.concat_tables(parts))
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], _normalize(mat[order])
    amask = ids % 2 == 0
    ids_a, mat_a = ids[amask], mat[amask]
    ids_b, mat_b = ids[~amask], mat[~amask]
    ref = ray.put((ids_a, mat_a, ids_b, mat_b))

    def stats_f(batch: pa.Table) -> pa.Table:
        a_ids, a_mat, b_ids, b_mat = ray.get(ref)
        bids, bmat = _batch_matrix(batch)
        bmat = _normalize(bmat)
        even = bids % 2 == 0
        tk = np.empty(len(bids), np.float64)
        if even.any():
            tk[even] = _topk_mean(bmat[even] @ b_mat.T, k)
        if (~even).any():
            tk[~even] = _topk_mean(bmat[~even] @ a_mat.T, k)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(bids, pa.int64()),
                "tk": pa.array(tk, pa.float64()),
            }
        )

    stats_tbl = pa.concat_tables(
        t
        for t in ray.get(
            read_embeddings(sf_dir)
            .map_batches(stats_f, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    )
    svid = stats_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    stk = stats_tbl.column("tk").to_numpy(zero_copy_only=False)
    tk_all = np.empty(len(ids), np.float64)
    tk_all[np.searchsorted(ids, svid)] = stk
    sref = ray.put((ids_a, tk_all[amask], ids_b, tk_all[~amask]))

    def best_f(batch: pa.Table) -> pa.Table:
        a_ids, a_mat, b_ids, b_mat = ray.get(ref)
        sa_ids, sa_tk, sb_ids, sb_tk = ray.get(sref)
        bids, bmat = _batch_matrix(batch)
        bmat = _normalize(bmat)
        even = bids % 2 == 0
        out_src, out_tgt, out_m = [], [], []
        for side_mask, own_ids, own_tk, opp_ids, opp_mat, opp_tk in (
            (even, sa_ids, sa_tk, b_ids, b_mat, sb_tk),
            (~even, sb_ids, sb_tk, a_ids, a_mat, sa_tk),
        ):
            if not side_mask.any() or len(opp_ids) == 0:
                continue
            rows = bids[side_mask]
            sims = bmat[side_mask] @ opp_mat.T
            pos = np.searchsorted(own_ids, rows)
            margins = sims / ((own_tk[pos][:, None] + opp_tk[None, :]) / 2.0)
            best_m = np.full(len(rows), -np.inf)
            best_id = np.full(len(rows), np.iinfo(np.int64).max, np.int64)
            _best_update(best_m, best_id, margins, opp_ids)
            if own_ids is sa_ids:  # forward: src = own (A side)
                out_src.append(rows)
                out_tgt.append(best_id)
            else:  # backward: src = partner (A side)
                out_src.append(best_id)
                out_tgt.append(rows)
            out_m.append(best_m)
        if not out_m:
            return pa.Table.from_pydict(
                {
                    "src_id": pa.array([], pa.int64()),
                    "tgt_id": pa.array([], pa.int64()),
                    "margin": pa.array([], pa.float64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "src_id": pa.array(np.concatenate(out_src), pa.int64()),
                "tgt_id": pa.array(np.concatenate(out_tgt), pa.int64()),
                "margin": pa.array(np.concatenate(out_m), pa.float64()),
            }
        )

    rows = read_embeddings(sf_dir).map_batches(
        best_f, batch_format="pyarrow"
    )
    return _mutual_pairs(rows, threshold)


# -- out-of-core tier ---------------------------------------------------------

def _side_store(sf_dir: str, side: int) -> str:
    """Persist one side as a NORMALIZED parquet shard store (vec_id,
    nemb list<float64>), rows sorted by vec_id within each shard."""
    import hashlib
    import os
    import shutil

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = hashlib.md5(
        f"{src}:side{side}:v1:{content_tag}".encode()
    ).hexdigest()[:12]
    out_dir = f"/tmp/graft_bitext/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

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

    _side_ds(sf_dir, side).map_batches(
        norm_batch, batch_format="pyarrow"
    ).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _store_files(store_dir: str) -> list[str]:
    import os

    return sorted(
        os.path.join(store_dir, p)
        for p in os.listdir(store_dir)
        if p.endswith(".parquet")
    )


def _store_matrix(path: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = t.column("nemb").combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, np.asarray(flat, np.float64).reshape(n, -1)


def _bitext_mine_sharded(
    sf_dir: str, threshold: float, k: int = K_NEIGHBORS
) -> ray.data.Dataset:
    """Out-of-core tier: streams the opposite side's persisted shards
    inside each batch task; stats re-attach via one key-only cogroup;
    the driver never holds a matrix."""
    from .io import read_parquet_clean

    store_a = _side_store(sf_dir, 0)
    store_b = _side_store(sf_dir, 1)

    def stats_pass(opp_store: str):
        files = _store_files(opp_store)

        def f(batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            col = batch.column("nemb").combine_chunks()
            mat = np.asarray(
                col.flatten().to_numpy(zero_copy_only=False), np.float64
            ).reshape(len(col), -1)
            acc = None
            for path in files:
                _, opp = _store_matrix(path)
                acc = _merge_topk(acc, mat @ opp.T, k)
            part = -np.sort(-acc, axis=1)  # descending, canonical order
            kk = min(k, part.shape[1])
            tk = part[:, :kk].sum(axis=1, dtype=np.float64) / kk
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(bids, pa.int64()),
                    "tk": pa.array(tk, pa.float64()),
                }
            )

        return f

    def augmented(store: str, opp_store: str) -> ray.data.Dataset:
        side = read_parquet_clean(store)
        stats = side.map_batches(
            stats_pass(opp_store), batch_format="pyarrow"
        )
        return cogroup_attach(
            side,
            stats,
            key="vec_id",
            left_fields=[
                pa.field("vec_id", pa.int64()),
                pa.field("nemb", pa.list_(pa.float64())),
            ],
            payload_fields=[pa.field("tk", pa.float64())],
        )

    def _aug_store(store: str, opp_store: str) -> str:
        import os
        import shutil

        out_dir = store.rstrip("/") + f"_aug{k}"
        marker = os.path.join(out_dir, "_SUCCESS")
        if os.path.exists(marker):
            return out_dir
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        augmented(store, opp_store).write_parquet(out_dir)
        with open(marker, "w") as f:
            f.write("ok")
        return out_dir

    aug_a = _aug_store(store_a, store_b)
    aug_b = _aug_store(store_b, store_a)

    def best_pass(opp_aug: str, direction: int):
        files = _store_files(opp_aug)

        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            bids = batch.column("vec_id").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            col = batch.column("nemb").combine_chunks()
            mat = np.asarray(
                col.flatten().to_numpy(zero_copy_only=False), np.float64
            ).reshape(len(col), -1)
            own_tk = batch.column("tk").to_numpy(zero_copy_only=False)
            best_m = np.full(len(bids), -np.inf)
            best_id = np.full(len(bids), np.iinfo(np.int64).max, np.int64)
            for path in files:
                t = pq.read_table(path)
                oids = t.column("vec_id").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                ocol = t.column("nemb").combine_chunks()
                opp = np.asarray(
                    ocol.flatten().to_numpy(zero_copy_only=False), np.float64
                ).reshape(len(ocol), -1)
                opp_tk = t.column("tk").to_numpy(zero_copy_only=False)
                sims = mat @ opp.T
                margins = sims / (
                    (own_tk[:, None] + opp_tk[None, :]) / 2.0
                )
                _best_update(best_m, best_id, margins, oids)
            src = bids if direction == 0 else best_id
            tgt = best_id if direction == 0 else bids
            return pa.Table.from_pydict(
                {
                    "src_id": pa.array(src, pa.int64()),
                    "tgt_id": pa.array(tgt, pa.int64()),
                    "margin": pa.array(best_m, pa.float64()),
                }
            )

        return f

    fwd = read_parquet_clean(aug_a).map_batches(
        best_pass(aug_b, 0), batch_format="pyarrow"
    )
    bwd = read_parquet_clean(aug_b).map_batches(
        best_pass(aug_a, 1), batch_format="pyarrow"
    )
    return _mutual_pairs(fwd.union(bwd), threshold)
