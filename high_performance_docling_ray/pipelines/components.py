"""Connected components over a near-duplicate pair set — the step that
turns pairwise dedup output into duplicate CLUSTERS (each doc labeled
with the min doc_id of its component; canonical-representative
selection, transitive "A~B~C means A,C are dups" semantics).

Tiers, the repo's standard discipline:

* pairs within ``pairs_broadcast_budget``: one driver union-find over
  the edge list (path-halving, vectorized row feed), then the label
  map broadcasts and ALL docs stream through a pure map — singletons
  label themselves, no shuffle of the corpus.
* past the budget: DISTRIBUTED MIN-LABEL PROPAGATION — labels start as
  (node, node); each round attaches current labels to the symmetric
  edge list by src (``cogroup_attach``), emits (dst, src_label)
  candidates, and folds them into the labels with a key-only
  ``groupby(node).min``. Labels decrease monotonically, so the global
  label SUM is a convergence certificate: a round that leaves the sum
  unchanged is the fixpoint. Rounds needed = graph diameter (near-dup
  clusters are shallow; a handful of rounds in practice) and every
  round is a key-only exchange — nothing about the corpus payload
  moves.

Both tiers are pinned equal in tests; the driver-gate oracle rebuilds
the same labels with a recursive-CTE reachability min in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import _collect_within_budget, ngram_jaccard_pairs
from .joins import cogroup_attach
from .text_analysis import read_documents


def _union_find_labels(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Driver union-find (path halving + union by min), returning a
    node -> min-node-in-component map for nodes that appear in edges."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in set(a.tolist()) | set(b.tolist())}


def neardup_components(
    sf_dir: str,
    threshold: float = 0.5,
    pairs_broadcast_budget: int = 2_000_000,
    max_rounds: int = 64,
    _return_parts: bool = False,
) -> ray.data.Dataset | pa.Table | tuple:
    """(doc_id, component) for EVERY document, where component is the
    min doc_id reachable through exact n-gram-Jaccard >= ``threshold``
    edges (``ngram_jaccard_pairs``); docs with no near-dup are their
    own component."""
    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold).select_columns(
        ["doc_a", "doc_b"]
    )
    docs = read_documents(sf_dir, ("doc_id",))
    return components_from_pairs(
        pairs, docs, pairs_broadcast_budget, max_rounds, _return_parts
    )


def fuzzy_components(
    sf_dir: str,
    pairs_broadcast_budget: int = 2_000_000,
    max_rounds: int = 64,
) -> ray.data.Dataset | pa.Table:
    """Entity-resolution composition: connected components over the
    EDIT-DISTANCE pair set (``fuzzy.edit_distance_pairs`` — char-level
    near-identical join keys), so each cluster is a fuzzy-duplicate
    entity. Same label machinery (union-find broadcast / min-label
    propagation) as ``neardup_components``; the oracle composes by CTE
    substitution over the fuzzy oracle's pair set."""
    from .fuzzy import edit_distance_pairs

    kp = edit_distance_pairs(sf_dir)
    pairs = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_a": kp.column("a_id"), "doc_b": kp.column("b_id")}
        )
    )
    docs = read_documents(sf_dir, ("doc_id",))
    return components_from_pairs(
        pairs, docs, pairs_broadcast_budget, max_rounds
    )


def components_from_pairs(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    pairs_broadcast_budget: int = 2_000_000,
    max_rounds: int = 64,
    _return_parts: bool = False,
) -> ray.data.Dataset | pa.Table | tuple:
    """Shared component-labeling core over any (doc_a, doc_b) edge
    set: driver union-find + broadcast label map under the pairs
    budget; distributed MIN-LABEL PROPAGATION (cogroup label attach
    per round + key-only groupby min, label-sum fixpoint certificate)
    past it."""
    pair_tbl = _collect_within_budget(pairs, pairs_broadcast_budget)
    if pair_tbl is not None:
        if pair_tbl.num_rows:
            labels = _union_find_labels(
                pair_tbl.column("doc_a").to_numpy(zero_copy_only=False),
                pair_tbl.column("doc_b").to_numpy(zero_copy_only=False),
            )
        else:
            labels = {}
        labels_ref = ray.put(labels)

        def attach(batch: pa.Table) -> pa.Table:
            import pandas as pd

            lookup = ray.get(labels_ref)
            ids = (
                batch.column("doc_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            # int-safe mapping: a Series.map would round-trip through
            # float64 (NaN for singletons) and corrupt ids >= 2^53;
            # instead only the rows actually IN the label map (bounded
            # by component membership, not batch size) take the slow
            # path, everyone else keeps their own id
            comp = ids.copy()
            hit = pd.Series(ids).isin(lookup.keys()).to_numpy()
            if hit.any():
                comp[hit] = np.fromiter(
                    (lookup[int(i)] for i in ids[hit]),
                    np.int64,
                    int(hit.sum()),
                )
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "component": pa.array(comp, pa.int64()),
                }
            )

        out = docs.map_batches(attach, batch_format="pyarrow")
        return (out, labels) if _return_parts else out

    # distributed tier: min-label propagation to fixpoint
    def symm(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(symm, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.Table.from_pydict({"node": ids, "label": ids})

    labels_ds = docs.map_batches(init_labels, batch_format="pyarrow")
    prev_sum: int | None = None
    converged = False
    for _ in range(max_rounds):
        labels_ds = labels_ds.materialize()
        cur_sum = labels_ds.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        cand = cogroup_attach(
            edges,
            labels_ds.map_batches(
                lambda b: b.rename_columns(["src", "src_label"]),
                batch_format="pyarrow",
            ),
            key="src",
            left_fields=[
                pa.field("src", pa.int64()),
                pa.field("dst", pa.int64()),
            ],
            payload_fields=[pa.field("src_label", pa.int64())],
        ).map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b.column("dst"), "label": b.column("src_label")}
            ),
            batch_format="pyarrow",
        )
        labels_ds = (
            labels_ds.union(cand)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda b: b.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
        )

    if not converged:
        # labels would be silently wrong (far chain ends unresolved);
        # refuse rather than diverge from the union-find tier
        raise RuntimeError(
            f"min-label propagation did not reach a fixpoint in "
            f"{max_rounds} rounds (pair-graph diameter exceeds it); "
            f"raise max_rounds"
        )
    out = labels_ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow",
    )
    return (out, None) if _return_parts else out


def dedup_keep_best(
    sf_dir: str,
    threshold: float = 0.5,
    pairs_broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Quality-aware near-dup survivor selection: label every doc with
    its duplicate component (``neardup_components``), then per
    component keep the LONGEST member (``n_chars`` DESC, doc_id ASC
    tiebreak) — "keep the most complete copy", the usual upgrade over
    keep-min-id dedup. Returns (doc_id, component, keep) for every doc.

    Tiered like the components step itself:

    * pairs in budget (label map on the driver): the docs needing a
      winner decision are exactly the label map's keys — the SAME
      budget class as the pairs — so their (doc_id, n_chars) rows are
      collected with one filtered metadata read (``pc.is_in``, never
      text), winners resolve driver-side with one lexsort, and the
      verdict is a pure map over all docs. ZERO exchanges after the
      pair join.
    * past the budget: metadata cogroup-attaches to the label rows by
      doc_id and winners are decided vectorized inside a bucket-keyed
      ``map_groups`` (one lexsort per ~4*CPU bucket). Both exchanges
      are key-only (3 int columns); text never moves. Component skew
      is benign: a giant dup cluster is a wide group of 24-byte rows.
    """
    labels, label_map = neardup_components(
        sf_dir, threshold=threshold,
        pairs_broadcast_budget=pairs_broadcast_budget,
        _return_parts=True,
    )
    labels_ds = (
        ray.data.from_arrow(labels) if isinstance(labels, pa.Table) else labels
    )
    meta = read_documents(sf_dir, ("doc_id", "n_chars"))

    if label_map is not None:
        import pyarrow.compute as pc

        member_ids = np.fromiter(label_map.keys(), np.int64, len(label_map))
        wanted = pa.array(np.sort(member_ids), pa.int64())

        def member_meta(batch: pa.Table) -> pa.Table:
            keep = pc.is_in(batch.column("doc_id"), value_set=wanted)
            t = batch.filter(keep)
            return pa.Table.from_pydict(
                {
                    "doc_id": t.column("doc_id"),
                    "n_chars": pc.fill_null(t.column("n_chars"), 0),
                }
            )

        rows = pa.concat_tables(
            [
                t
                for t in ray.get(
                    meta.map_batches(member_meta, batch_format="pyarrow")
                    .materialize()
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
            or [
                pa.Table.from_pydict(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_chars": pa.array([], pa.int64()),
                    }
                )
            ]
        )
        ids = rows.column("doc_id").to_numpy(zero_copy_only=False)
        n_chars = rows.column("n_chars").to_numpy(zero_copy_only=False)
        comp = np.fromiter(
            (label_map[int(i)] for i in ids), np.int64, len(ids)
        )
        order = np.lexsort((ids, -n_chars, comp))
        comp_sorted = comp[order]
        first = np.ones(len(order), bool)
        first[1:] = comp_sorted[1:] != comp_sorted[:-1]
        winners = set(ids[order[first]].tolist())
        state_ref = ray.put((label_map, winners))

        def verdict(batch: pa.Table) -> pa.Table:
            lookup, wins = ray.get(state_ref)
            d = (
                batch.column("doc_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            comp = d.copy()
            keep = np.ones(len(d), bool)
            import pandas as pd

            hit = pd.Series(d).isin(lookup.keys()).to_numpy()
            if hit.any():
                comp[hit] = np.fromiter(
                    (lookup[int(i)] for i in d[hit]), np.int64, int(hit.sum())
                )
                keep[hit] = [int(i) in wins for i in d[hit]]
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(d, pa.int64()),
                    "component": pa.array(comp, pa.int64()),
                    "keep": pa.array(keep, pa.bool_()),
                }
            )

        docs = read_documents(sf_dir, ("doc_id",))
        return docs.map_batches(verdict, batch_format="pyarrow")
    attached = cogroup_attach(
        labels_ds,
        meta,
        "doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("component", pa.int64()),
        ],
        payload_fields=[pa.field("n_chars", pa.int64())],
    )

    # bucket components so the groupby keys on ~4*CPU buckets and each
    # group resolves ALL its components vectorized (one lexsort), not
    # one Python call per component
    from .joins import default_num_buckets, int_key_buckets

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        comp = batch.column("component").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(comp, num_parts))
        )

    def pick(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        comp = group.column("component").to_numpy(zero_copy_only=False)
        # meta covers every doc, but fill_null anyway: ONE null would
        # silently promote the whole column to float64 (NOTES_r3)
        n_chars = pc.fill_null(group.column("n_chars"), 0).to_numpy(
            zero_copy_only=False
        )
        # winner per component: sort by (component, -n_chars, doc_id);
        # the first row of each component run wins
        order = np.lexsort((ids, -n_chars, comp))
        comp_sorted = comp[order]
        first = np.ones(len(order), bool)
        first[1:] = comp_sorted[1:] != comp_sorted[:-1]
        keep = np.zeros(len(order), bool)
        keep[order[first]] = True
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "component": pa.array(comp, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return (
        attached.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


# -- medoid selection per embedding near-dup component ------------------------

_MED_EMPTY = pa.Table.from_pydict(
    {
        "component": pa.array([], pa.int64()),
        "medoid_id": pa.array([], pa.int64()),
        "n_members": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    }
)


def neardup_medoids(
    sf_dir: str,
    pairs_broadcast_budget: int = 2_000_000,
    hot_member_cap: int = 4096,
) -> ray.data.Dataset:
    """SemDeDup-style representative selection: for every EMBEDDING
    near-dup component (connected components over the exact
    cosine >= 0.4 pair graph), the MEDOID — the member with the
    largest summed cosine to its co-members (ties to the smallest
    vec_id) — plus the member count and that score. The keep-list a
    semantic-dedup pass actually materializes (``dedup_keep_best``
    picks by an EXTERNAL quality; the medoid is the
    similarity-central member).

    Composition of verified parts: ``embedding_neardup_pairs`` edges →
    the shared ``components_from_pairs`` label core (union-find under
    the pairs budget, min-label propagation past it — the forced
    ``_distributed`` entry pins that tier) → ONE key-only cogroup to
    attach labels to vectors → ``groupby(component)`` with a per-group
    matmul (pairwise terms round to 6dp BEFORE summing, mirroring the
    oracle's SUM(round(cos, 6))). Component sizes are the workload
    bound: the per-group O(g²·d) matmul refuses past
    ``hot_member_cap`` with remediation (a component that large means
    the threshold is wrong for the corpus). Singletons drop (no
    co-member, like the oracle's n >= 2)."""
    import pyarrow.parquet as pq

    from .similarity import (
        _batch_matrix,
        _normalize,
        embedding_neardup_pairs,
        read_embeddings,
    )

    kp = embedding_neardup_pairs(sf_dir)
    if isinstance(kp, pa.Table):
        kp = ray.data.from_arrow(kp)
    pairs = kp.map_batches(
        lambda b: pa.Table.from_pydict(
            {"doc_a": b.column("vec_id_a"), "doc_b": b.column("vec_id_b")}
        ),
        batch_format="pyarrow",
    )
    ids = read_embeddings(sf_dir).map_batches(
        lambda b: pa.Table.from_pydict({"doc_id": b.column("vec_id")}),
        batch_format="pyarrow",
    )
    labels = components_from_pairs(
        pairs, ids, pairs_broadcast_budget
    )
    if isinstance(labels, pa.Table):
        labels = ray.data.from_arrow(labels)
    lab = labels.map_batches(
        lambda b: b.rename_columns(["vec_id", "component"]),
        batch_format="pyarrow",
    )
    emb_type = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet"
    ).schema_arrow.field("embedding").type
    joined = cogroup_attach(
        read_embeddings(sf_dir).map_batches(
            lambda b: b.select(["vec_id", "embedding"]),
            batch_format="pyarrow",
        ),
        lab,
        key="vec_id",
        left_fields=[
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", emb_type),
        ],
        payload_fields=[pa.field("component", pa.int64())],
    )

    def medoid_of(group: pa.Table) -> pa.Table:
        g = group.num_rows
        if g < 2:
            return _MED_EMPTY
        if g > hot_member_cap:
            raise ValueError(
                f"neardup_medoids: component of {g} members exceeds "
                f"hot_member_cap ({hot_member_cap}); the threshold is "
                "too loose for this corpus — raise it or the cap"
            )
        ids_arr, mat = _batch_matrix(group)
        nm = _normalize(mat)
        sims = np.round(nm @ nm.T, 6)
        np.fill_diagonal(sims, 0.0)
        scores = sims.sum(axis=1)
        best = np.lexsort((ids_arr, -scores))[0]
        comp = group.column("component")[0].as_py()
        return pa.Table.from_pydict(
            {
                "component": pa.array([int(comp)], pa.int64()),
                "medoid_id": pa.array(
                    [int(ids_arr[best])], pa.int64()
                ),
                "n_members": pa.array([g], pa.int64()),
                "score": pa.array(
                    [round(float(scores[best]), 6)], pa.float64()
                ),
            }
        )

    return joined.groupby("component").map_groups(
        medoid_of, batch_format="pyarrow"
    )
