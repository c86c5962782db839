"""Exact edit-distance self-join (fuzzy string join), SymSpell-style.

``edit_distance_pairs`` finds every pair of documents whose derived
join key (the first ``key_len`` characters of ``text``, with
deterministic planted edits so distances 1-2 genuinely occur in the
synthetic corpus) is within Levenshtein distance ``k`` — the
record-linkage / near-duplicate-title join the dedup family lacks
(MinHash etc. are token-set measures; this is CHARACTER-edit
similarity).

Pipeline (exact at every step):

1. **Distinct-key collapse.** Web corpora carry huge EXACT-duplicate
   cliques (boilerplate); a clique of g docs sharing one key would
   otherwise emit g x ~326 identical variant rows and g(g-1)/2 x 326
   duplicate candidate pairs (measured: 97M candidate rows for 1M true
   pairs on a replica-heavy 100k corpus). So docs first group by key:
   one representative per DISTINCT key runs the fuzzy machinery;
   distance-0 pairs fall out of the member groups directly; the few
   (rep_a, rep_b, dist>=1) key pairs expand back to doc pairs with a
   one-to-many cogroup at the very end. Every stage is bounded by
   distinct keys or true output size.
2. **Deletion neighborhoods (SymSpell).** ed(a, b) <= k implies some
   string obtained by <= k deletions from ``a`` equals one obtained by
   <= k deletions from ``b`` (the pigeonhole), so each distinct key
   emits hashes of ALL <= k-deletion variants; equal hashes are
   candidates, verified with an exact banded DP. False negatives are
   impossible (equal strings hash equal); hash collisions only cost a
   wasted verify.
3. **Algebraic variant hashes.** With a polynomial hash
   H = sum(c_t * B^t) mod 2^64 over an ODD base B (invertible mod
   2^64), deleting position i is O(1):

       del_i(H) = P_i + B^-1 * (H - P_i - c_i * B^i)

   where P_i is the prefix sum below i; double deletions (i < j)
   apply the identity twice (delete j first so lower indices stay
   valid). One (n, W) uint64 cumsum per batch replaces ~W^2/2 string
   slices per ROW. Zero padding is free: trailing NULs contribute 0,
   so variants of different lengths hash consistently.

Scale shape: variant rows are (hash, key_id) KEY rows over DISTINCT
keys only; candidate dedup is the budgeted driver combine with a
bucketed-groupby fallback; representative keys attach to candidates
via broadcast under a budget or TWO ``cogroup_attach`` passes past
it; the member expansion is a bucketed one-to-many cogroup. Tier
equality is test-pinned; the driver gate hash-matches a DuckDB
``levenshtein`` cross-join oracle at both SFs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _collect_within_budget
from .joins import cogroup_attach, int_key_buckets
from .relational import _read

KEY_LEN = 24
_W = KEY_LEN + 1  # planted insertion can lengthen a key by one
_B = np.uint64(1099511628211)  # odd (FNV prime) => invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _drop_null_text(batch: pa.Table) -> pa.Table:
    """NULL text derives a NULL key, and SQL NULL keys fall out of
    every equality/distance join predicate — drop those rows up front
    so both engines agree (ADVICE r4: a None text otherwise crashes
    the planted-edit slicing, or str()-ifies to the literal 'None')."""
    col = batch.column("text")
    if col.null_count:
        batch = batch.filter(pc.is_valid(col))
    return batch


def derive_keys(doc_id: np.ndarray, text: pa.ChunkedArray) -> list[str]:
    """The join key: first KEY_LEN characters, with deterministic
    planted edits (mirrored in the SQL oracle CASE, first-match
    precedence): doc_id%13==5 deletes one character, doc_id%17==3
    inserts an 'x'. The base slice is vectorized; the surgery touches
    only the ~13% of rows in a planted residue (bounded, not a hot
    path)."""
    base = pc.utf8_slice_codeunits(
        text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
        0, KEY_LEN,
    ).to_pylist()
    out = list(base)
    dele = doc_id % 13 == 5
    ins = (doc_id % 17 == 3) & ~dele  # CASE precedence: first branch wins
    for idx in np.flatnonzero(dele):
        kstr = out[idx]
        p = int(doc_id[idx] % 12) + 1
        out[idx] = kstr[:p] + kstr[p + 1:]
    for idx in np.flatnonzero(ins):
        kstr = out[idx]
        q = int(doc_id[idx] % 10) + 2
        out[idx] = kstr[:q] + "x" + kstr[q:]
    return out


def _codepoint_matrix(keys: list[str]) -> np.ndarray:
    """(n, _W) uint64 code points, zero-padded. ASCII keys take the
    zero-copy buffer path (join + frombuffer); any non-ASCII row falls
    back to a per-row ord() fill (the synthetic corpus has none in the
    key window, but the kernel stays correct if one appears)."""
    n = len(keys)
    mat = np.zeros((n, _W), dtype=np.uint64)
    joined = "".join(k.ljust(_W, "\x00") for k in keys)
    enc = joined.encode("utf-8")
    if len(enc) == n * _W:  # pure ASCII: one reshape
        mat[:] = np.frombuffer(enc, dtype=np.uint8).reshape(n, _W)
        return mat
    for i, k in enumerate(keys):
        cps = [ord(ch) for ch in k[:_W]]
        mat[i, : len(cps)] = cps
    return mat


def _variant_hashes(mat: np.ndarray) -> np.ndarray:
    """All <=2-deletion variant hashes per row: (n, 1 + W + W(W-1)/2)
    uint64, via the O(1) algebraic deletion identity."""
    n = mat.shape[0]
    powers = np.empty(_W, dtype=np.uint64)
    powers[0] = 1
    np.multiply.accumulate(np.full(_W, _B, dtype=np.uint64)[:-1],
                           out=powers[1:])
    terms = mat * powers  # wraps mod 2^64
    pref = np.zeros((n, _W + 1), dtype=np.uint64)
    np.cumsum(terms, axis=1, out=pref[:, 1:])
    h0 = pref[:, _W]

    def del_at(h: np.ndarray, cols: slice | int) -> np.ndarray:
        p = pref[:, cols]
        t = terms[:, cols]
        if p.ndim == 1:
            return p + _BINV * (h - p - t)
        return p + _BINV * (h[:, None] - p - t)

    out = [h0[:, None], del_at(h0, slice(0, _W))]
    for j in range(1, _W):
        h1 = del_at(h0, j)  # delete j first: indices < j stay valid
        out.append(del_at(h1, slice(0, j)))
    return np.concatenate(out, axis=1)


def _ed_at_most(a: str, b: str, k: int = 2) -> int:
    """Banded Levenshtein: exact distance if <= k, else k+1."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if a == b:
        return 0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [k + 1] * lb
        lo, hi = max(1, i - k), min(lb, i + k)
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[max(0, i - k): min(lb, i + k) + 1]) > k:
            return k + 1
        prev = cur
    return prev[lb] if prev[lb] <= k else k + 1


_PAIR_EMPTY = pa.Table.from_pydict(
    {"a_id": pa.array([], pa.int64()),
     "b_id": pa.array([], pa.int64()),
     "n": pa.array([], pa.int64())}
)


def _emit_all_pairs(group: pa.Table, h_col: str, id_col: str) -> pa.Table:
    """All unordered id pairs within equal-``h_col`` runs, fully
    vectorized: one global (h, id) dedup, then one broadcast gather
    per DISTINCT run size (a python loop per RUN was the wall-time of
    this stage on dup-heavy data)."""
    vh = group.column(h_col).to_numpy().astype(np.int64)
    did = group.column(id_col).to_numpy().astype(np.int64)
    comp = np.unique(np.stack([vh, did], axis=1), axis=0)
    vh, did = comp[:, 0], comp[:, 1]
    starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
    lens = np.diff(np.r_[starts, len(vh)])
    multi_start = starts[lens >= 2]
    multi_len = lens[lens >= 2]
    if not len(multi_start):
        return _PAIR_EMPTY
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for m in np.unique(multi_len):
        runs = multi_start[multi_len == m]
        ia, ib = np.triu_indices(int(m), 1)
        a_out.append(did[(runs[:, None] + ia[None, :]).ravel()])
        b_out.append(did[(runs[:, None] + ib[None, :]).ravel()])
    a = np.concatenate(a_out)
    b = np.concatenate(b_out)
    t = pa.Table.from_pydict(
        {"a_id": pa.array(a, pa.int64()),
         "b_id": pa.array(b, pa.int64()),
         "n": pa.array(np.ones(len(a), dtype=np.int64))}
    )
    # local dedup (a near-pair shares ~300 variants): one group_by here
    # keeps the global exchange near |true pairs| rows
    return t.group_by(["a_id", "b_id"]).aggregate(
        [("n", "sum")]
    ).rename_columns(["a_id", "b_id", "n"])


def _symspell_key_pairs(
    rep_ds: ray.data.Dataset,
    pair_budget: int,
    key_budget: int,
    num_parts: int,
) -> pa.Table:
    """(a_id, b_id, dist) over DISTINCT-key representative rows
    (columns doc_id, key; doc_id is the key's representative id).
    dist >= 1 by construction (equal keys share one representative).
    """

    def variants(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {"vhash": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64())}
            )
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        mat = _codepoint_matrix(batch.column("key").to_pylist())
        vh = _variant_hashes(mat).view(np.int64)
        flat = vh.reshape(-1)
        return pa.Table.from_pydict(
            {"vhash": pa.array(flat, pa.int64()),
             "doc_id": pa.array(np.repeat(did, vh.shape[1]), pa.int64())}
        )

    var_rows = rep_ds.map_batches(variants, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        flat = batch.column("vhash").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array(int_key_buckets(flat, num_parts), pa.int32()),
        )

    cand = (
        var_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _emit_all_pairs(
                g.drop_columns(["bucket"]), "vhash", "doc_id"
            ),
            batch_format="pyarrow",
        )
    )
    from .relational import _combine_partials

    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    cand = cand.materialize()
    pairs = _combine_partials(cand, ["a_id", "b_id"], ["n"], pair_budget)
    if pairs is None:
        pairs_ds = cand.groupby(["a_id", "b_id"]).sum("n")
        pairs_ds = pairs_ds.map_batches(
            lambda t: t.select(["a_id", "b_id"]), batch_format="pyarrow"
        )
    else:
        pairs_ds = ray.data.from_arrow(pairs.select(["a_id", "b_id"]))

    key_tbl = _collect_within_budget(rep_ds, key_budget)
    if key_tbl is not None and key_tbl.num_rows:
        kid = key_tbl.column("doc_id").to_numpy().astype(np.int64)
        kstr = np.asarray(key_tbl.column("key").to_pylist(), dtype=object)
        order = np.argsort(kid, kind="stable")
        key_ref = ray.put((kid[order], kstr[order]))

        def attach_keys(batch: pa.Table) -> pa.Table:
            ks, vs = ray.get(key_ref)
            a = batch.column("a_id").to_numpy().astype(np.int64)
            b = batch.column("b_id").to_numpy().astype(np.int64)
            return pa.Table.from_pydict(
                {"a_id": batch.column("a_id"),
                 "b_id": batch.column("b_id"),
                 "a_key": pa.array(
                     vs[np.searchsorted(ks, a)].tolist(), pa.string()),
                 "b_key": pa.array(
                     vs[np.searchsorted(ks, b)].tolist(), pa.string())}
            )

        enriched = pairs_ds.map_batches(attach_keys, batch_format="pyarrow")
    else:
        # over-budget: two key-only cogroups (by a_id, then b_id)
        pair_fields = [pa.field("a_id", pa.int64()),
                       pa.field("b_id", pa.int64())]
        enriched = cogroup_attach(
            pairs_ds,
            rep_ds.map_batches(
                lambda t: t.rename_columns(["a_id", "a_key"]),
                batch_format="pyarrow",
            ),
            "a_id", pair_fields, [pa.field("a_key", pa.string())],
        )
        enriched = cogroup_attach(
            enriched,
            rep_ds.map_batches(
                lambda t: t.rename_columns(["b_id", "b_key"]),
                batch_format="pyarrow",
            ),
            "b_id",
            pair_fields + [pa.field("a_key", pa.string())],
            [pa.field("b_key", pa.string())],
        )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy().astype(np.int64)
        b = batch.column("b_id").to_numpy().astype(np.int64)
        ak = batch.column("a_key").to_pylist()
        bk = batch.column("b_key").to_pylist()
        # exact banded DP per CANDIDATE key pair (bounded by true
        # near-pairs of DISTINCT keys + vanishing collision rate)
        dist = np.fromiter(
            (_ed_at_most(x, y, 2) for x, y in zip(ak, bk)),
            dtype=np.int64, count=len(ak),
        )
        keep = dist <= 2
        return pa.Table.from_pydict(
            {"a_id": pa.array(a[keep], pa.int64()),
             "b_id": pa.array(b[keep], pa.int64()),
             "dist": pa.array(dist[keep], pa.int64())}
        )

    parts = [
        t for t in ray.get(
            enriched.map_batches(verify, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"a_id": pa.array([], pa.int64()),
             "b_id": pa.array([], pa.int64()),
             "dist": pa.array([], pa.int64())}
        )
    return pa.concat_tables(parts)


def _expand_one_to_many(
    pairs_ds: ray.data.Dataset,
    members: ray.data.Dataset,
    key_col: str,
    carry: list[pa.Field],
    num_parts: int,
) -> ray.data.Dataset:
    """Replace ``pairs_ds[key_col]`` (a key id) with EVERY member doc
    of that key — the one-to-many cogroup ``cogroup_attach`` (unique
    right side) cannot express. Both sides bucket by hash(key); inside
    a bucket the members sort once and each pair row gathers its
    member range via two searchsorted probes + one np.repeat — output
    rows are bounded by true expansion size."""
    carry_names = [f.name for f in carry]
    wide = {key_col: pa.int64(), **{f.name: f.type for f in carry},
            "member": pa.int64()}

    def tag(side: int, key_name: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch.column(key_name).to_numpy(zero_copy_only=False)
            cols = {}
            for name, typ in wide.items():
                if name in batch.column_names and name != key_col:
                    cols[name] = batch.column(name)
                elif name == key_col:
                    cols[name] = pa.array(keys.astype(np.int64), pa.int64())
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            cols["__part"] = pa.array(
                int_key_buckets(keys.astype(np.int64), num_parts), pa.int32()
            )
            return pa.Table.from_pydict(cols)

        return f

    tagged = pairs_ds.map_batches(tag(0, key_col), batch_format="pyarrow").union(
        members.map_batches(
            lambda t: tag(1, "key_id")(
                t.append_column("member", t.column("doc_id"))
            ),
            batch_format="pyarrow",
        )
    )

    def expand(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        p_tbl = group.filter(pa.array(side == 0))
        m_tbl = group.filter(pa.array(side == 1))
        empty = {key_col: pa.array([], pa.int64()),
                 **{c: pa.array([], wide[c]) for c in carry_names}}
        if p_tbl.num_rows == 0 or m_tbl.num_rows == 0:
            return pa.Table.from_pydict(empty)
        mk = m_tbl.column(key_col).to_numpy().astype(np.int64)
        # fill_null BEFORE to_numpy: nullable int64 promotes to float64
        mv = np.asarray(pc.fill_null(m_tbl.column("member"), 0)
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(mk, kind="stable")
        mk, mv = mk[order], mv[order]
        pk = p_tbl.column(key_col).to_numpy().astype(np.int64)
        lo = np.searchsorted(mk, pk, side="left")
        hi = np.searchsorted(mk, pk, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.Table.from_pydict(empty)
        # gather indices: per pair row, the contiguous member range
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.repeat(lo, counts) + (np.arange(total) - offs)
        out = {key_col: pa.array(mv[idx], pa.int64())}
        rep_idx = pa.array(np.repeat(np.arange(p_tbl.num_rows), counts),
                           pa.int64())
        for c in carry_names:
            out[c] = p_tbl.column(c).take(rep_idx)
        return pa.Table.from_pydict(out)

    return tagged.groupby("__part").map_groups(
        lambda g: expand(g.drop_columns(["__part"])),
        batch_format="pyarrow",
    )


def edit_distance_pairs(
    sf_dir: str,
    k: int = 2,
    pair_budget: int = 2_000_000,
    key_budget: int = 5_000_000,
    num_parts: int | None = None,
) -> pa.Table:
    """All (a_id < b_id, dist) document pairs whose derived keys are
    within Levenshtein distance ``k`` (<= 2; the deletion-neighborhood
    generator is built for k=2). See module docstring for the stages
    and tiers.
    """
    if k != 2:
        raise ValueError("edit_distance_pairs is built for k=2")
    if num_parts is None:
        num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        batch = _drop_null_text(batch)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = derive_keys(did, batch.column("text"))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(did, pa.int64()),
             "key": pa.array(keys, pa.string())}
        )

    keys_ds = docs.map_batches(keyed, batch_format="pyarrow")

    # 1. distinct-key collapse in ONE bucketed exchange: each bucket
    # holds whole key groups (hash(key) partitioning), so it can emit
    # both the representative rows (key_id = min doc_id, key string)
    # and the member rows (key_id, doc_id) in a single pass — a
    # groupby(key) + cogroup back-attach would cost two AllToAlls for
    # the same result.
    from .joins import string_key_buckets

    def key_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(string_key_buckets(batch.column("key"), num_parts),
                     pa.int32()),
        )

    def collapse(group: pa.Table) -> pa.Table:
        did = group.column("doc_id").to_numpy().astype(np.int64)
        keys = np.asarray(group.column("key").to_numpy(zero_copy_only=False),
                          dtype=object)
        uniq, codes = np.unique(keys, return_inverse=True)
        # min doc_id per key code
        rep_of = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(rep_of, codes, did)
        return pa.Table.from_pydict(
            {"key_id": pa.array(
                np.concatenate([rep_of, rep_of[codes]]), pa.int64()),
             "doc_id": pa.array(np.concatenate([rep_of, did]), pa.int64()),
             "key": pa.array(
                 uniq.tolist() + [None] * len(did),
                 pa.string()),
             "kind": pa.array(
                 np.r_[np.zeros(len(uniq), np.int8),
                       np.ones(len(did), np.int8)])}
        )

    collapsed = (
        keys_ds.map_batches(key_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: collapse(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        .materialize()  # reps + members, consumed by three stages
    )
    members = collapsed.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
        .select(["key_id", "doc_id"]),
        batch_format="pyarrow",
    )

    # 2. distance-0 pairs: all pairs inside each key's member group
    def mem_bucket(batch: pa.Table) -> pa.Table:
        kid = np.asarray(
            pc.fill_null(batch.column("key_id"), 0)
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(kid, num_parts), pa.int32())
        )

    dist0 = (
        members.map_batches(mem_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _emit_all_pairs(
                g.drop_columns(["bucket"]), "key_id", "doc_id"
            ),
            batch_format="pyarrow",
        )
    )
    dist0_parts = [
        t.select(["a_id", "b_id"])
        for t in ray.get(dist0.materialize().to_arrow_refs())
        if t.num_rows > 0
    ]

    # 3. SymSpell join over DISTINCT keys only
    rep_rows = collapsed.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t.filter(pc.equal(t.column("kind"), 0)).column("key_id"),
             "key": t.filter(pc.equal(t.column("kind"), 0)).column("key")}
        ),
        batch_format="pyarrow",
    )
    key_pairs = _symspell_key_pairs(
        rep_rows, pair_budget, key_budget, num_parts
    )

    # 4. expand key pairs back to doc pairs (two one-to-many cogroups)
    if key_pairs.num_rows:
        kp_ds = ray.data.from_arrow(key_pairs)
        ex_a = _expand_one_to_many(
            kp_ds, members, "a_id",
            [pa.field("b_id", pa.int64()), pa.field("dist", pa.int64())],
            num_parts,
        )
        ex_ab = _expand_one_to_many(
            ex_a, members, "b_id",
            [pa.field("a_id", pa.int64()), pa.field("dist", pa.int64())],
            num_parts,
        )
        near_parts = [
            t for t in ray.get(ex_ab.materialize().to_arrow_refs())
            if t.num_rows > 0
        ]
    else:
        near_parts = []

    rows_a: list[np.ndarray] = []
    rows_b: list[np.ndarray] = []
    rows_d: list[np.ndarray] = []
    for t in dist0_parts:
        a = t.column("a_id").to_numpy().astype(np.int64)
        b = t.column("b_id").to_numpy().astype(np.int64)
        rows_a.append(np.minimum(a, b))
        rows_b.append(np.maximum(a, b))
        rows_d.append(np.zeros(len(a), dtype=np.int64))
    for t in near_parts:
        a = t.column("a_id").to_numpy().astype(np.int64)
        b = t.column("b_id").to_numpy().astype(np.int64)
        rows_a.append(np.minimum(a, b))
        rows_b.append(np.maximum(a, b))
        rows_d.append(t.column("dist").to_numpy().astype(np.int64))
    if not rows_a:
        return pa.Table.from_pydict(
            {"a_id": pa.array([], pa.int64()),
             "b_id": pa.array([], pa.int64()),
             "dist": pa.array([], pa.int64())}
        )
    return pa.Table.from_pydict(
        {"a_id": pa.array(np.concatenate(rows_a), pa.int64()),
         "b_id": pa.array(np.concatenate(rows_b), pa.int64()),
         "dist": pa.array(np.concatenate(rows_d), pa.int64())}
    ).sort_by([("a_id", "ascending"), ("b_id", "ascending")])


# -- Jaro–Winkler blocked self-join ------------------------------------------

_JW_EMPTY = pa.Table.from_pydict(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jw": pa.array([], pa.float64()),
    }
)


def _byte_matrix(keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 encode a key list into a zero-padded ``(k, L)`` uint8
    matrix + byte-length vector. DuckDB's ``jaro_winkler_similarity``
    operates on BYTES (empirically: 'café x' vs 'cafe x' scores as the
    7-vs-6 byte strings, not the 6-char ones), so the kernel does
    too — byte-level agreement is what makes the oracle hash match."""
    bs = [k.encode("utf-8") for k in keys]
    lk = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    width = max(1, int(lk.max()) if len(bs) else 1)
    mat = np.array(bs, dtype=f"S{width}").view(np.uint8).reshape(
        len(bs), width
    )
    return np.ascontiguousarray(mat), lk


def _jw_pairs(
    U: np.ndarray, lk: np.ndarray, u: np.ndarray, v: np.ndarray
) -> np.ndarray:
    """Vectorized-across-pairs Jaro–Winkler over byte matrices —
    bit-identical to DuckDB's scalar (differential-pinned over 6k
    random/adversarial pairs incl. multi-byte UTF-8, transpositions,
    empty strings in tests). The greedy window match runs as
    O(L · 2w) MASKED boolean vector ops over ALL pairs at once (no
    per-pair Python): position i of every left string claims its
    first unused in-window match simultaneously via a running `done`
    mask. Conventions matched to DuckDB: window = max(la,lb)//2 - 1
    (>= 0), either side empty -> 0.0 (even both-empty), prefix boost
    0.1 · l<=4 applied only when jaro > 0.7."""
    A, B = U[u], U[v]
    la, lb = lk[u], lk[v]
    n, width = A.shape
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(w.max()) if n else 0
    used_b = np.zeros((n, width), bool)
    match_a = np.zeros((n, width), bool)
    for i in range(width):
        ai = A[:, i]
        done = ~(i < la)
        if done.all():
            continue
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w, lb - 1)
        for j in range(max(0, i - wmax), min(width, i + wmax + 1)):
            can = (
                (~done) & (j >= lo) & (j <= hi)
                & (~used_b[:, j]) & (B[:, j] == ai)
            )
            if can.any():
                used_b[can, j] = True
                match_a[can, i] = True
                done |= can
    m = match_a.sum(1)
    # transpositions: k-th matched byte of A (i order) vs k-th used
    # byte of B (j order); scatter both into dense (n, width) slots
    ka = np.cumsum(match_a, 1) - 1
    kb = np.cumsum(used_b, 1) - 1
    seq_a = np.zeros((n, width), np.uint8)
    seq_b = np.zeros((n, width), np.uint8)
    r, c = np.nonzero(match_a)
    seq_a[r, ka[r, c]] = A[r, c]
    r, c = np.nonzero(used_b)
    seq_b[r, kb[r, c]] = B[r, c]
    t = ((seq_a != seq_b) & (np.arange(width) < m[:, None])).sum(1) // 2
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            mf / la.astype(np.float64)
            + mf / lb.astype(np.float64)
            + (mf - t) / mf
        ) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    pmax = min(4, width)
    pre = (A[:, :pmax] == B[:, :pmax]) & (
        np.arange(pmax) < np.minimum(np.minimum(la, lb), 4)[:, None]
    )
    lpre = np.cumprod(pre, 1).sum(1)
    return np.where(jaro > 0.7, jaro + 0.1 * lpre * (1.0 - jaro), jaro)


def _run_pairs(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run (i < j) LOCAL index pairs for runs of the given
    sizes, two allocations (the theil_sen repeat+ramp trick): returns
    (left, right) indices into the concatenated run elements."""
    n = int(counts.sum())
    starts = np.cumsum(counts) - counts
    local = np.arange(n) - np.repeat(starts, counts)
    total = int(local.sum())
    right = np.repeat(np.arange(n), local)
    csum = np.cumsum(local) - local
    ramp = np.arange(total) - np.repeat(csum, local)
    left = np.repeat(np.repeat(starts, counts), local) + ramp
    return left, right


def _jw_block_pass(
    doc_ids: np.ndarray,
    keys: np.ndarray,
    threshold: float,
    hot_pair_cap: int,
    block_chars: int,
) -> pa.Table:
    """One vectorized pass over (doc_id, key) rows spanning one or
    more prefix blocks: distinct-key collapse -> per-block distinct
    key pairs -> JW kernel -> expansion back to doc pairs. Block
    contiguity is free after the key sort (the block IS a prefix of
    the key, and prefix classes are contiguous under lexicographic
    order), so multi-block driver batches and single-block distributed
    groups share this code path."""
    if not len(doc_ids):
        return _JW_EMPTY
    order = np.lexsort((doc_ids, keys))
    doc_ids, keys = doc_ids[order], keys[order]
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    kstarts = np.nonzero(new_key)[0]
    g = np.diff(np.append(kstarts, len(keys)))  # members per distinct key
    kvals = keys[kstarts]
    uniq = [str(s) for s in kvals]
    blk = pc.utf8_slice_codeunits(
        pa.array(uniq, pa.string()), 0, block_chars
    ).to_numpy(zero_copy_only=False)
    new_blk = np.concatenate(([True], blk[1:] != blk[:-1]))
    bcounts = np.diff(np.append(np.nonzero(new_blk)[0], len(blk)))
    ui, vi = _run_pairs(bcounts)  # distinct-key pairs within blocks
    if len(ui) > hot_pair_cap:
        raise ValueError(
            "jaro_winkler_pairs: distinct-key candidate pairs "
            f"({len(ui)}) exceed hot_pair_cap ({hot_pair_cap}); use a "
            "longer block prefix (block_chars), pass hot_sample=N for "
            "the deterministic subsample tier, or raise the cap"
        )
    mat, lk = _byte_matrix(uniq)
    out: list[pa.Table] = []
    if len(ui):
        # length-ratio prune, lossless: jw <= 0.8 + 0.2 * min/max
        s = np.minimum(lk[ui], lk[vi]).astype(np.float64)
        big = np.maximum(lk[ui], lk[vi]).astype(np.float64)
        ok = 0.8 + 0.2 * (s / np.maximum(big, 1.0)) >= threshold
        ui, vi = ui[ok], vi[ok]
    if len(ui):
        jw = _jw_pairs(mat, lk, ui, vi)
        keep = jw >= threshold
        ui, vi, jw = ui[keep], vi[keep], jw[keep]
        if len(ui):
            # expand each surviving distinct-key pair to its member
            # doc cross product (true-output-bounded)
            gu, gv = g[ui], g[vi]
            reps = gu * gv
            total = int(reps.sum())
            pid = np.repeat(np.arange(len(ui)), reps)
            off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            da = doc_ids[kstarts[ui][pid] + off // gv[pid]]
            db = doc_ids[kstarts[vi][pid] + off % gv[pid]]
            out.append(
                pa.Table.from_pydict(
                    {
                        "doc_a": pa.array(np.minimum(da, db), pa.int64()),
                        "doc_b": pa.array(np.maximum(da, db), pa.int64()),
                        "jw": pa.array(jw[pid], pa.float64()),
                    }
                )
            )
    # same-key cliques: identical non-empty keys score exactly 1.0
    # (identical EMPTY keys score 0.0 in DuckDB — excluded unless the
    # threshold admits 0)
    same_jw = np.where(lk > 0, 1.0, 0.0)
    eligible = (g >= 2) & (same_jw >= threshold)
    if eligible.any():
        idx = np.nonzero(eligible)[0]
        li, ri = _run_pairs(g[idx])
        base = np.repeat(kstarts[idx] - (np.cumsum(g[idx]) - g[idx]),
                         g[idx] * (g[idx] - 1) // 2)
        da = doc_ids[li + base]
        db = doc_ids[ri + base]
        out.append(
            pa.Table.from_pydict(
                {
                    "doc_a": pa.array(da, pa.int64()),
                    "doc_b": pa.array(db, pa.int64()),
                    "jw": pa.array(
                        np.repeat(same_jw[idx], g[idx] * (g[idx] - 1) // 2),
                        pa.float64(),
                    ),
                }
            )
        )
    if not out:
        return _JW_EMPTY
    return pa.concat_tables(out)


def _jw_block_pass_sampled(
    doc_ids: np.ndarray,
    keys: np.ndarray,
    threshold: float,
    hot_pair_cap: int,
    block_chars: int,
    hot_sample: int,
) -> pa.Table:
    """Opt-in hot-block subsample tier (VERDICT r4 #5): blocks whose
    DISTINCT-key count exceeds ``hot_sample`` are reduced to their
    ``hot_sample`` keys with the smallest crc32 (deterministic,
    partition-independent, seed-free) before the quadratic pair
    enumeration; every emitted pair carries a ``sampled`` flag saying
    whether its block was estimated from a subsample. Cold blocks run
    the exact pass unchanged."""
    import zlib

    if not len(doc_ids):
        return _JW_EMPTY.append_column("sampled", pa.array([], pa.bool_()))
    order = np.lexsort((doc_ids, keys))
    doc_ids, keys = doc_ids[order], keys[order]
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    kstarts = np.nonzero(new_key)[0]
    g = np.diff(np.append(kstarts, len(keys)))
    uniq = [str(s) for s in keys[kstarts]]
    blk = pc.utf8_slice_codeunits(
        pa.array(uniq, pa.string()), 0, block_chars
    ).to_numpy(zero_copy_only=False)
    new_blk = np.concatenate(([True], blk[1:] != blk[:-1]))
    bidx = np.repeat(
        np.arange(int(new_blk.sum())),
        np.diff(np.append(np.nonzero(new_blk)[0], len(blk))),
    )
    bcounts = np.bincount(bidx)
    hot = bcounts > hot_sample
    if not hot.any():
        # no hot block: skip the per-key crc/mask machinery entirely
        # and run the exact pass with an all-False flag
        t = _jw_block_pass(
            doc_ids, keys, threshold, hot_pair_cap, block_chars
        )
        return t.append_column(
            "sampled", pa.array(np.zeros(t.num_rows, bool), pa.bool_())
        )
    # distinct-key keep mask: cold blocks keep all keys; hot blocks
    # keep the hot_sample smallest-crc32 keys
    crc = np.array([zlib.crc32(s.encode()) for s in uniq], np.int64)
    horder = np.lexsort((crc, bidx))
    local = np.arange(len(uniq)) - np.repeat(
        np.cumsum(bcounts) - bcounts, bcounts
    )
    key_keep = np.empty(len(uniq), dtype=bool)
    key_keep[horder] = local < hot_sample
    key_hot = hot[bidx]
    member_hot = np.repeat(key_hot, g)
    member_keep = np.repeat(key_keep | ~key_hot, g)
    out = []
    cold = ~member_hot
    if cold.any():
        t = _jw_block_pass(
            doc_ids[cold], keys[cold], threshold, hot_pair_cap,
            block_chars,
        )
        out.append(t.append_column(
            "sampled", pa.array(np.zeros(t.num_rows, bool), pa.bool_())
        ))
    hot_rows = member_hot & member_keep
    if hot_rows.any():
        t = _jw_block_pass(
            doc_ids[hot_rows], keys[hot_rows], threshold, hot_pair_cap,
            block_chars,
        )
        out.append(t.append_column(
            "sampled", pa.array(np.ones(t.num_rows, bool), pa.bool_())
        ))
    if not out:
        return _JW_EMPTY.append_column("sampled", pa.array([], pa.bool_()))
    return pa.concat_tables(out)


def jaro_winkler_pairs(
    sf_dir: str,
    threshold: float = 0.9,
    block_chars: int = 2,
    driver_budget: int = 2_000_000,
    hot_pair_cap: int = 20_000_000,
    hot_sample: int | None = None,
) -> ray.data.Dataset | pa.Table:
    """Blocked Jaro–Winkler record-linkage self-join: every doc pair
    whose derived keys (the edit-distance family's ``derive_keys``)
    share a ``block_chars``-char prefix and score
    ``jaro_winkler_similarity >= threshold`` — the weighted-similarity
    complement to ``edit_distance_pairs``' exact-k join (JW grades
    NEAR matches continuously and privileges shared prefixes, the
    name/title-matching standard in record linkage).

    Exactness: the kernel is bit-identical to DuckDB's byte-level JW
    (see ``_jw_pairs``); blocking is mirrored in the oracle's join
    predicate, so the driver gate hash-matches end to end. Scale: the
    distinct-key collapse (this module's boilerplate-clique defense)
    bounds kernel work by DISTINCT keys per block; the length-ratio
    prune is lossless under the winkler-boost upper bound
    ``jw <= 0.8 + 0.2·min/max``; per-pass candidate volume refuses
    past ``hot_pair_cap`` with remediation. Driver fast tier under
    the documents FOOTER probe; ``jaro_winkler_pairs_grouped`` forces
    the per-block exchange (groupby on the prefix, whole blocks
    co-located — identical results pinned by tests)."""
    from .io import parquet_num_rows

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        batch = _drop_null_text(batch)
        did = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = derive_keys(did, batch.column("text"))
        karr = pa.array(keys, pa.string())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(did, pa.int64()),
                "key": karr,
                "blk": pc.utf8_slice_codeunits(karr, 0, block_chars),
            }
        )

    keys_ds = docs.map_batches(keyed, batch_format="pyarrow")

    def run_pass(group: pa.Table) -> pa.Table:
        args = (
            group.column("doc_id").to_numpy().astype(np.int64),
            np.asarray(
                group.column("key").to_numpy(zero_copy_only=False),
                dtype=object,
            ),
            threshold, hot_pair_cap, block_chars,
        )
        if hot_sample is not None:
            return _jw_block_pass_sampled(*args, hot_sample)
        return _jw_block_pass(*args)

    if (
        driver_budget
        and parquet_num_rows(f"{sf_dir}/documents.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(keys_ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return (
                _JW_EMPTY
                if hot_sample is None
                else _JW_EMPTY.append_column(
                    "sampled", pa.array([], pa.bool_())
                )
            )
        whole = pa.concat_tables(parts).combine_chunks()
        return run_pass(whole).sort_by(
            [("doc_a", "ascending"), ("doc_b", "ascending")]
        )

    return keys_ds.groupby("blk").map_groups(
        lambda grp: run_pass(grp.drop_columns(["blk"])),
        batch_format="pyarrow",
    )
