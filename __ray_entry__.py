"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init``/``ray.shutdown`` here or in the library code.

``queries()`` covers the operator inventory of SURVEY.md §2 plus the
training-data ops (dedup family, similarity search, text analysis);
``oracle_sql()`` gives DuckDB equivalents for every SQL-expressible
query with matching column names. Non-SQL-expressible ops (HTML/layout
extraction, LSH/approximate algorithms) are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents-derived pages ->
    dedup -> boilerplate strip / layout parse -> assembled text."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import pages_from_documents

    ds = pages_from_documents(SF_SMOKE)
    return extract_pipeline(ds, dedup=True, explode_giant=False)


# ---------------------------------------------------------------------------


def _q_extract_pages(sf_dir: str):
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import pages_from_documents

    ds = pages_from_documents(sf_dir)
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.select_columns(
        ["url", "doc_kind", "extracted_text", "n_elements", "n_tables"]
    )


def _q_extract_synth(sf_dir: str):
    """Synthetic mixed HTML+PDF corpus (size scaled off sf dir name)."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import synth_pages_dataset

    n = {"0.001": 100, "0.01": 400, "0.1": 2000}.get(
        sf_dir.rstrip("/").rsplit("sf", 1)[-1], 200
    )
    ds = synth_pages_dataset(n, seed=42)
    out = extract_pipeline(ds, dedup=True, explode_giant=True)
    return out.select_columns(
        ["url", "doc_kind", "extracted_text", "n_pages", "n_elements", "n_tables"]
    )


def _q_exact_dedup(sf_dir: str):
    import pyarrow as pa

    from high_performance_docling_ray.pipelines.dedup import exact_dedup

    rows = exact_dedup(sf_dir).take_all()
    tbl = pa.Table.from_pylist(rows)
    return tbl.rename_columns(["text_hash", "min_doc_id"]).sort_by(
        [("text_hash", "ascending")]
    )


def _q_minhash_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(sf_dir, threshold=0.7)


def _q_simhash_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import simhash_pairs

    return simhash_pairs(sf_dir, max_hamming=3)


def _q_ngram_jaccard(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(sf_dir, threshold=0.5)


def _q_embedding_neardup(sf_dir: str):
    """EXACT cosine>=0.4 pairs via broadcast blocked matmul (the
    testdata embeddings are near-random, so 0.4 is the band where real
    pairs exist — threshold 0.95 would be vacuously empty)."""
    from high_performance_docling_ray.pipelines.similarity import (
        embedding_neardup_pairs,
    )

    return embedding_neardup_pairs(sf_dir, threshold=0.4)


def _q_embedding_neardup_ivf(sf_dir: str):
    """IVF-sharded EXACT tier of the same contract: persisted list
    partitions + lossless spherical-cap list-pair pruning, no corpus
    broadcast anywhere — hash-verified against the same cross-join
    oracle as the broadcast path."""
    from high_performance_docling_ray.pipelines.similarity import (
        embedding_neardup_ivf,
    )

    return embedding_neardup_ivf(sf_dir, threshold=0.4)


def _q_embedding_neardup_lsh(sf_dir: str):
    """Sign-LSH near-dup gate (VERDICT r4 #7): instead of the raw
    approximate pairs (recall < 1 by design — rows-only forever),
    return a driver-visible row hash-compared against the oracle:
    ``n_exact_pairs`` is genuinely computed on BOTH sides (engine
    exact pipeline vs the SQL quadratic cosine join),
    ``precision_one`` pins that every LSH pair is exact-verified
    (subset by construction — the scale-relevant claim), and
    ``recall_ge_quarter`` pins the sign-LSH recall floor (measured
    0.37-0.45 across sf0.001/0.01/0.1 at threshold 0.4)."""
    import pyarrow as _pa

    from high_performance_docling_ray.pipelines.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    import ray

    def pairs_of(x) -> set:
        if not isinstance(x, _pa.Table):
            parts = [t for t in ray.get(x.to_arrow_refs()) if t.num_rows]
            if not parts:
                return set()
            x = _pa.concat_tables(parts)
        return set(zip(x.column("vec_id_a").to_pylist(),
                       x.column("vec_id_b").to_pylist()))

    exact = pairs_of(embedding_neardup_pairs(sf_dir, threshold=0.4))
    lsh = pairs_of(embedding_neardup_lsh(sf_dir, threshold=0.4))
    recall = len(lsh & exact) / max(len(exact), 1)
    return _pa.Table.from_pydict(
        {
            "n_exact_pairs": _pa.array([len(exact)], _pa.int64()),
            "precision_one": _pa.array([lsh <= exact], _pa.bool_()),
            "recall_ge_quarter": _pa.array([recall >= 0.25], _pa.bool_()),
        }
    )


def _query_vector(sf_dir: str):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    for batch in tbl.to_batches():
        ids = batch.column("vec_id").to_pylist()
        if 0 in ids:
            return batch.column("embedding").to_pylist()[ids.index(0)]
    return tbl.column("embedding").to_pylist()[0]


def _q_knn_brute(sf_dir: str):
    from high_performance_docling_ray.pipelines.similarity import knn_brute

    return knn_brute(sf_dir, _query_vector(sf_dir), k=10)


def _q_knn_ivf(sf_dir: str):
    """IVF ANN recall gate (VERDICT r4 #7): instead of the raw
    approximate top-k (rows-only forever), return a driver-visible
    numeric row — recall@10 of the nprobe<n_lists IVF scan against
    the exact brute-force top-10, gated at >= 0.5. Both sides are
    deterministic, so the boolean (and k / n_overlap context) is
    hash-comparable against a constant-truth oracle: the driver row
    goes RED the moment an IVF regression drops recall below the
    pinned bound. The fullprobe entry still hash-verifies the exact
    path end to end."""
    import numpy as _np
    import pyarrow as _pa

    from high_performance_docling_ray.pipelines.similarity import (
        knn_brute,
        knn_ivf,
    )

    q = _query_vector(sf_dir)
    approx = knn_ivf(sf_dir, q, k=10)
    exact = knn_brute(sf_dir, _np.asarray(q, _np.float64), k=10)
    a_ids = set(approx.column("vec_id").to_pylist())
    e_ids = set(exact.column("vec_id").to_pylist())
    overlap = len(a_ids & e_ids)
    recall = overlap / max(len(e_ids), 1)
    return _pa.Table.from_pydict(
        {
            "k": _pa.array([10], _pa.int64()),
            "recall_ge_half": _pa.array([recall >= 0.5], _pa.bool_()),
        }
    )


def _q_knn_ivf_fullprobe(sf_dir: str):
    """IVF ANN with nprobe == n_lists: the partition-pruned scan reads
    every list, so the result is EXACTLY the brute-force top-k — this
    hash-verifies the whole IVF query path (persisted index, centroid
    probe, per-partition top-k, driver merge) against the brute oracle;
    the nprobe<n_lists entry stays rows-only as approximate-by-design."""
    from high_performance_docling_ray.pipelines.similarity import knn_ivf

    return knn_ivf(sf_dir, _query_vector(sf_dir), k=10, n_lists=16, nprobe=16)


def _q_extract_docs_text(sf_dir: str):
    """Flagship extraction over the documents-derived pages, projected
    to (url, extracted_text) — SQL-verifiable because the deterministic
    HTML wrap makes the extracted text a closed form of the source
    text (sentence split + whitespace normalize + heading)."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import pages_from_documents

    ds = pages_from_documents(sf_dir)
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.select_columns(["url", "extracted_text"])


def _q_extract_pdf_docs(sf_dir: str):
    """Extraction through the PDF/LAYOUT path (detector clusters ->
    assignment -> postprocess -> reading order) over a closed-form
    %SYNTHPDF wrap of the documents table — hash-verified against a
    DuckDB oracle, unlike the RNG-based synth corpus."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(sf_dir)
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.select_columns(
        ["url", "doc_kind", "extracted_text", "n_pages", "n_tables"]
    )


def _q_extract_pdf_ocr(sf_dir: str):
    """OCR APPLY path hash-verified: single-page closed-form PDF wrap
    with a planted empty-text region; the md5-stub recognizer's output
    is reproducible in SQL, so the oracle covers identify -> recognize
    -> apply -> reading order end to end."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(
        sf_dir, blocks_per_page=1_000_000, ocr_region=True
    )
    out = extract_pipeline(
        ds, dedup=True, explode_giant=False,
        options=ExtractOptions(do_ocr=True),
    )
    return out.select_columns(["url", "extracted_text"])


def _q_extract_list_markers(sf_dir: str):
    """ListItemMarkerProcessor parity (M24, readingorder_model.py:100,
    309): a closed-form SYNTHPDF wrap plants one bullet, one numbered
    and one paren-letter list item per doc; the doc-tree build strips
    the marker out of the text (extracted_text) and the markdown export
    renders the normalized marker — both hash-verified."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(
        sf_dir, blocks_per_page=1_000_000, list_blocks=True
    )
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.select_columns(["url", "extracted_text", "markdown"])


def _q_extract_confidence(sf_dir: str):
    """Doc-level ConfidenceReport (reference base_models.py:397-459):
    per-page layout/ocr scores -> nanmean + 5 % nanquantile -> doc
    mean/low scores + grade buckets, over the SYNTHPDF wrap with
    closed-form from_ocr cell metadata (ocr_cells=True) so every score
    is SQL-reproducible."""
    from high_performance_docling_ray.pipelines.confidence import (
        extract_confidence,
    )

    return extract_confidence(sf_dir)


def _q_extract_pdf_tables(sf_dir: str):
    """TABLE-STRUCTURE path hash-verified: the closed-form PDF wrap
    plants a 2x2 table (OTSL + word-index tokens) per doc, driving
    OTSL parse -> 9-step matching post-process -> response -> grid
    render with a DuckDB oracle."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(
        sf_dir, blocks_per_page=1_000_000, table_block=True
    )
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.select_columns(["url", "extracted_text", "n_tables"])


def _q_extract_pdf_enriched(sf_dir: str):
    """CODE/FORMULA enrichment path hash-verified: planted code +
    formula blocks; the md5-stub predictor's visible effects (language
    tag split off for code, \\mathrm head for formula) are closed-form
    from the block texts."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(
        sf_dir, blocks_per_page=1_000_000, enrich_blocks=True
    )
    out = extract_pipeline(
        ds, dedup=True, explode_giant=False,
        options=ExtractOptions(do_code_enrichment=True),
    )
    return out.select_columns(["url", "extracted_text"])


def _q_extract_enriched(sf_dir: str):
    """Extraction with OCR + code/formula enrichment enabled (reference
    phase 2 OCR + phase 4 enrichment; stubbed models, real plumbing)."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import synth_pages_dataset

    opts = ExtractOptions(do_ocr=True, do_code_enrichment=True)
    ds = synth_pages_dataset(200, seed=42)
    out = extract_pipeline(ds, dedup=True, explode_giant=False, options=opts)
    return out.select_columns(["url", "doc_kind", "extracted_text", "n_elements"])


def _q_extract_ocr_distributed(sf_dir: str):
    """Same contract as extract_ocr_enriched, but OCR runs as a
    SEPARATE distributed stage joined back on (url, page_no,
    cluster_id) — byte-identity with the inline path is asserted in
    tests/test_ocr_pipeline.py (VERDICT r1 item 7)."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.ocr import (
        extract_with_distributed_ocr,
    )
    from high_performance_docling_ray.sources.pages import synth_pages_dataset

    opts = ExtractOptions(do_ocr=True, do_code_enrichment=True)
    out = extract_with_distributed_ocr(
        lambda: synth_pages_dataset(200, seed=42),
        opts,
        dedup=True,
        explode_giant=False,
    )
    return out.select_columns(["url", "doc_kind", "extracted_text", "n_elements"])


def _q_extract_pdf_ocr_distributed(sf_dir: str):
    """The distributed OCR join-back (broadcast tier), hash-verified:
    same closed-form OCR-planted input as extract_pdf_ocr, so the
    byte-identity contract with the inline path gets DRIVER-GATE
    evidence on top of the pytest pin (VERDICT r2 item 2)."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.ocr import (
        extract_with_distributed_ocr,
    )
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    out = extract_with_distributed_ocr(
        lambda: pdf_pages_from_documents(
            sf_dir, blocks_per_page=1_000_000, ocr_region=True
        ),
        ExtractOptions(do_ocr=True),
        dedup=True,
        explode_giant=False,
    )
    return out.select_columns(["url", "extracted_text"])


def _q_extract_pdf_ocr_cogroup(sf_dir: str):
    """The OVER-BUDGET tier of the distributed OCR join-back
    (ocr_broadcast_budget=0 forces the union-cogroup ocr_json attach),
    hash-verified against the same oracle as the inline path."""
    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.ocr import (
        extract_with_distributed_ocr,
    )
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    out = extract_with_distributed_ocr(
        lambda: pdf_pages_from_documents(
            sf_dir, blocks_per_page=1_000_000, ocr_region=True
        ),
        ExtractOptions(do_ocr=True),
        ocr_broadcast_budget=0,
        dedup=True,
        explode_giant=False,
    )
    return out.select_columns(["url", "extracted_text"])


def _q_ocr_recognize_pdf(sf_dir: str):
    """The standalone OCR stage (identify -> actor-pool recognize)
    hash-verified: over the closed-form OCR-planted wrap each doc
    yields exactly one task row, and the md5-stub recognizer's text is
    reproducible in SQL."""
    from high_performance_docling_ray.pipelines.ocr import ocr_pipeline
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    return ocr_pipeline(
        pdf_pages_from_documents(
            sf_dir, blocks_per_page=1_000_000, ocr_region=True
        ),
        concurrency=(1, 4),
    )


def _q_ocr_tasks(sf_dir: str):
    """Distributed OCR: identify -> actor-pool recognize (stubbed model,
    batch 32, reference gpu_processor.py:204-288 shape)."""
    import ray.data as rd

    from high_performance_docling_ray.pipelines.ocr import ocr_pipeline
    from high_performance_docling_ray.sources.pages import synth_pages_table

    tbl = synth_pages_table(150, seed=42).select(
        ["url", "warc_ts", "html", "lang"]
    )
    return ocr_pipeline(rd.from_arrow(tbl), concurrency=(1, 4))


def _q_debug_overlays(sf_dir: str):
    """S7 debug sink: SVG cluster/cell overlays, one file per PDF page
    (reference layout_model.py:113-155 as side-by-side SVG panes);
    returns the written index."""
    import hashlib
    import ray.data as rd

    from high_performance_docling_ray.pipelines.debug import (
        write_debug_overlays,
    )
    from high_performance_docling_ray.sources.pages import synth_pages_table

    tbl = synth_pages_table(150, seed=42).select(
        ["url", "warc_ts", "html", "lang"]
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = write_debug_overlays(
        rd.from_arrow(tbl), f"/tmp/graft_debug_overlays/{tag}"
    )
    return out.select_columns(["url", "page_no", "n_clusters", "svg_bytes"])


def _q_image_features(sf_dir: str):
    from high_performance_docling_ray.stages.multimodal import image_features

    return image_features(n=256)


def _q_audio_features(sf_dir: str):
    """Audio as an opaque binary column: actor-pool decode (stubbed) ->
    duration/RMS/zero-crossing features (rows-only: stub model)."""
    from high_performance_docling_ray.stages.multimodal import audio_features

    return audio_features(n=256)


def _q_video_frames(sf_dir: str):
    """Video frame-sampling: every k-th frame decoded via random access
    (never the whole clip), one feature row per sampled frame
    (rows-only: stub model)."""
    from high_performance_docling_ray.stages.multimodal import (
        video_frame_features,
    )

    return video_frame_features(n=64, stride=10)


def _q_figure_features(sf_dir: str):
    """Figure-image extraction (reference M25): figures from the
    extraction output -> crop payloads -> actor-pool decode/features."""
    import ray.data as rd

    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.pipelines.figures import figure_features
    from high_performance_docling_ray.sources.pages import synth_pages_table

    tbl = synth_pages_table(150, seed=42).select(
        ["url", "warc_ts", "html", "lang"]
    )
    result = extract_pipeline(rd.from_arrow(tbl), dedup=False)
    return figure_features(result, concurrency=(1, 4))


def _q_top_tokens(sf_dir: str):
    """Exact global heavy hitters: per-batch count partials -> token
    groupby -> per-block top-k -> driver merge of k x blocks rows."""
    from high_performance_docling_ray.pipelines.corpus_clean import top_tokens

    return top_tokens(sf_dir, k=20)


def _q_frequent_ngrams(sf_dir: str):
    """Exact phi-heavy-hitter 3-grams via mergeable Misra-Gries block
    summaries (<= cap+1 rows per block, any gram-domain size) + an
    exact candidate-only verify pass — driver sees <= 2/phi + 1 rows."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        frequent_ngrams,
    )

    return frequent_ngrams(sf_dir, phi=0.0002, n=3)


def _q_cms_estimates(sf_dir: str):
    """Count-min-sketch point estimates (md5-salted buckets, bit-exact
    reproducible in SQL) for a fixed probe set incl. an absent token."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        cms_token_estimates,
    )

    return cms_token_estimates(
        sf_dir, ["spark", "window", "merge", "the", "zzzabsent"]
    )


def _q_quantize_embeddings(sf_dir: str):
    """Per-vector int8 scalar-quantization stats (scale, MSE, max abs
    error) — pure vectorized map over the embedding matrix."""
    from high_performance_docling_ray.pipelines.similarity import (
        quantize_embeddings,
    )

    return quantize_embeddings(sf_dir)


def _q_postings_lookup(sf_dir: str):
    """Inverted-index round trip: build the bucket-partitioned posting
    store once (content-keyed cache), then read ONLY the query tokens'
    bucket partitions — partition pruning as candidate filter."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        postings_lookup,
    )

    return postings_lookup(sf_dir, ["spark", "window", "merge"])


def _q_neardup_components(sf_dir: str):
    """Duplicate-cluster labeling: connected components over the exact
    n-gram-Jaccard pair set (driver union-find under budget; the
    distributed min-label-propagation tier is test-pinned equal)."""
    from high_performance_docling_ray.pipelines.components import (
        neardup_components,
    )

    return neardup_components(sf_dir)


def _q_sample_per_group(sf_dir: str):
    """Deterministic k-per-stratum sample: per language, the k=3 docs
    with the smallest md5-derived hash64(doc_id) — per-batch combiner
    + driver merge, no shuffle."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        sample_per_group,
    )

    return sample_per_group(sf_dir, k=3)


def _q_exact_quantiles(sf_dir: str):
    """Exact discrete quantiles as a value-count aggregate (no global
    sort); index rule matches DuckDB quantile_disc."""
    from high_performance_docling_ray.pipelines.relational import (
        exact_quantiles,
    )

    return exact_quantiles(sf_dir)


def _q_anti_join(sf_dir: str):
    """Distributed anti-join (broadcast tier): customers with no order
    above 300k; the forced-cogroup tier is test-pinned equal."""
    from high_performance_docling_ray.pipelines.relational import (
        anti_join_customers,
    )

    return anti_join_customers(sf_dir)


def _q_figure_crops(sf_dir: str):
    """Figure-crop rows (M25 geometry + J7 caption attach),
    hash-verified: the figure_block fixture plants a fixed-bbox picture
    cluster with a caption block beneath it on page 0 of every doc, so
    the crop row (url, page_no, bbox, attached caption) is a closed
    form of doc_id — giving the figure-extraction path (flat_map of
    elements_json -> per-figure rows, caption mapping included)
    DRIVER-GATE evidence beyond the rows-only figure_features stub."""
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.pipelines.figures import figure_rows
    from high_performance_docling_ray.sources.pages import (
        pdf_pages_from_documents,
    )

    ds = pdf_pages_from_documents(sf_dir, figure_block=True)
    out = extract_pipeline(ds, dedup=True, explode_giant=False)
    return out.map_batches(figure_rows, batch_format="pyarrow").select_columns(
        ["url", "page_no", "l", "t", "r", "b", "caption"]
    )


def _q_repetition_signals(sf_dir: str):
    """Gopher-style repetition quality signals (dup-token / top-bigram
    / dup-trigram fractions) — pure vectorized map, exact oracle."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        repetition_signals,
    )

    return repetition_signals(sf_dir)


def _q_redact_pii(sf_dir: str):
    """PII redaction (RE2 email/phone patterns, vectorized
    replace_substring_regex) over text with a deterministic planted
    suffix — the same planting is mirrored in the SQL oracle."""
    from high_performance_docling_ray.pipelines.corpus_clean import redact_pii

    return redact_pii(sf_dir)


def _q_segment_dedup(sf_dir: str):
    """C4-style global segment-level exact dedup: keep the corpus-wide
    first occurrence of every 13-token segment, reassemble docs from
    survivors. Two key-grouped exchanges, no broadcast."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        segment_dedup,
    )

    return segment_dedup(sf_dir)


def _q_tfidf_topk(sf_dir: str):
    """Per-doc top-5 TF-IDF terms: distributed df pass (per-batch
    combiner -> token groupby), broadcast idf under budget with a
    cogroup-by-token fallback (test-pinned equal)."""
    from high_performance_docling_ray.pipelines.corpus_clean import tfidf_topk

    return tfidf_topk(sf_dir)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any
    lowercased word 8-gram with the held-out slice (doc_id % 50 == 0).
    Eval shingle-hash set broadcast under budget (sorted-array
    searchsorted probe per batch); key-only cogroup tier past it."""
    from high_performance_docling_ray.pipelines.lm_filters import decontaminate

    return decontaminate(sf_dir)


def _q_quality_classifier(sf_dir: str):
    """fastText-style model-based quality filter: hashed unigram +
    word-bigram features index an actor-held weight table; per-doc
    score = feature-weight mean, keep decided in integer arithmetic.
    Pure map — no exchange at any scale."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        quality_classifier,
    )

    return quality_classifier(sf_dir)


def _q_unigram_logprob(sf_dir: str):
    """CCNet-style per-doc mean unigram log-probability: token-count
    model pass (combiner + small groupby), then a pure-map scoring
    pass (broadcast counts) with a cogroup-by-token fallback."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        unigram_logprob,
    )

    return unigram_logprob(sf_dir)


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (concat tokens in doc_id order, cut
    512-token chunks): distributed two-level prefix sum — per-bucket
    token subtotals -> driver cumsum over bucket totals (tiny) ->
    per-bucket local offsets -> chunk-keyed stats groupby."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        pack_sequences,
    )

    return pack_sequences(sf_dir)


def _q_bloom_tokens(sf_dir: str):
    """Bloom-filter vocabulary membership (register-merge sketch like
    HLL/CMS; md5 + multiplicative high-bit mixing, bit-exact in SQL)
    for a fixed probe set incl. absent tokens."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        bloom_token_membership,
    )

    return bloom_token_membership(
        sf_dir, ["spark", "window", "merge", "the", "zzzabsent", "qqmissing"]
    )


def _q_top_tokens_per_lang(sf_dir: str):
    """Exact per-language heavy hitters (grouped sibling of
    top_tokens): per-batch (lang, token) combiner -> composite-key
    groupby -> per-lang top-10 by (count desc, token asc)."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        top_tokens_per_lang,
    )

    return top_tokens_per_lang(sf_dir)


def _q_props_extract(sf_dir: str):
    """Semi-structured extraction: numeric field out of the JSON props
    string with one vectorized RE2 regex, then per-type partial agg."""
    from high_performance_docling_ray.pipelines.relational import (
        props_extract,
    )

    return props_extract(sf_dir)


def _q_label_centroids(sf_dir: str):
    """Per-class embedding diagnostics (counts, norm means, centroid
    norm, mean cosine to centroid): register-style (labels x D)
    partials both passes; vectors never ride an exchange."""
    from high_performance_docling_ray.pipelines.similarity import (
        label_centroids,
    )

    return label_centroids(sf_dir)


def _q_source_composition(sf_dir: str):
    """Per-source corpus composition (doc counts, char mass, language
    entropy) — reads only metadata columns, text never leaves storage;
    one composite-keyed groupby bounded by source x lang."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        source_composition,
    )

    return source_composition(sf_dir)


def _q_pack_bins(sf_dir: str):
    # no oracle_sql entry: greedy FFD packing is sequential and
    # outside SQL; pinned against a serial FFD + conservation /
    # capacity invariants in tests/test_lm_filters.py
    from high_performance_docling_ray.pipelines.lm_filters import pack_bins

    return pack_bins(sf_dir)


def _q_corpus_diff(sf_dir: str):
    """Snapshot-versioning diff: per-doc added/removed/modified/
    unchanged decided by content-hash comparison; key-only (doc_id,
    h, side) rows, one doc-bucketed exchange, vectorized resolve."""
    from high_performance_docling_ray.pipelines.incremental import (
        corpus_diff,
    )

    return corpus_diff(sf_dir)


def _q_phrase_lookup(sf_dir: str):
    """Exact phrase search ('hash join') over the PERSISTED positional
    inverted index: reads only the phrase tokens' bucket partitions,
    then one doc-bucketed regroup intersects per-ordinal sorted
    position arrays (the classic positional-postings merge)."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        phrase_lookup,
    )

    return phrase_lookup(sf_dir)


def _q_winnowing(sf_dir: str):
    """Winnowing fingerprints (MOSS): md5 word 4-gram hashes, 8-hash
    windows, per-window minimum with the rightmost-tie rule, distinct
    selected (pos, hash) pairs. Pure vectorized map — one
    sliding_window_view pass per batch, no exchange."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        winnowing_fingerprints,
    )

    return winnowing_fingerprints(sf_dir)


def _q_winnowing_pairs(sf_dir: str):
    """MOSS overlap detection: doc pairs sharing >= 2 distinct
    winnowed fingerprints, ubiquitous fingerprints (df > 64) dropped
    per the paper. Key-only hash-bucketed exchange, vectorized pair
    emission, local pair-count combine, one pair-keyed groupby."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        winnowing_overlap_pairs,
    )

    return winnowing_overlap_pairs(sf_dir)


def _q_source_divergence(sf_dir: str):
    """Per-source Jensen-Shannon divergence vs the corpus unigram
    distribution: one corpus pass -> materialized (token, source, cnt)
    domain -> one token-bucketed exchange; absent-token KL mass folds
    to a closed form, so the token x source matrix never densifies."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        source_divergence,
    )

    return source_divergence(sf_dir)


def _q_hll_hourly(sf_dir: str):
    """Per-hour HLL distinct users: register blobs keyed by hour,
    merged by groupby().map_groups where the group lives (no driver
    dict) — the unbounded-group-domain sketch shape."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        distinct_users_hll_hourly,
    )

    return distinct_users_hll_hourly(sf_dir)


def _q_shuffle_ranks(sf_dir: str):
    """Deterministic epoch shuffle: global rank in md5-keyed order
    WITHOUT a global sort — top hash bits are the range partition, so
    it's a two-level prefix sum (per-bucket counts -> driver cumsum ->
    local argsort + offset)."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        shuffle_ranks,
    )

    return shuffle_ranks(sf_dir)


def _q_pack_assignments(sf_dir: str):
    """Per-doc chunk assignments from the sequence packer (which
    chunk(s) each doc's tokens land in + the overlap size) — the
    artifact a training loader actually consumes."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        pack_sequences,
    )

    return pack_sequences(sf_dir, return_assignments=True)


def _q_curate_and_pack(sf_dir: str):
    """End-to-end: composite cleaner -> keep survivors -> pack their
    tokens into 512-token sequences. Verdicts attach to (doc_id,
    n_tok) count rows by cogroup (text never rides an exchange)."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        curate_and_pack,
    )

    return curate_and_pack(sf_dir)


def _q_clean_corpus(sf_dir: str):
    """Composite C4/Gopher-style cleaner: per-doc keep/drop verdict
    with the first failing rule as reason (holdout, too_short,
    exact_dup, repetitious, low_quality, contaminated). One streaming
    signal pass + a hash-keyed winner groupby + one cogroup attach."""
    from high_performance_docling_ray.pipelines.lm_filters import clean_corpus

    return clean_corpus(sf_dir)


def _q_token_counts(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import token_counts

    return token_counts(sf_dir)


def _q_fingerprint_md5(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import fingerprints

    return fingerprints(sf_dir).select_columns(["doc_id", "md5"])


def _q_fingerprint_rolling(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import fingerprints

    return fingerprints(sf_dir).select_columns(["doc_id", "rolling"])


def _q_language_id(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import language_id

    return language_id(sf_dir)


def _q_quality(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import quality_scores

    return quality_scores(sf_dir)


def _q_doc_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import quality_scores

    return quality_scores(sf_dir).select_columns(["doc_id", "n_chars", "n_tokens"])


def _q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct users per event_type (mergeable sketch;
    ~1.6% std error — rows-only check, accuracy asserted in tests)."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        distinct_users_hll,
    )

    return distinct_users_hll(sf_dir)


def _q_hash_sample(sf_dir: str):
    """Deterministic 10% hash sample (md5(doc_id) % 1000 < 100) —
    reproducible across runs and cluster sizes, no RNG state."""
    from high_performance_docling_ray.pipelines.text_analysis import hash_sample

    return hash_sample(sf_dir, rate_permille=100)


def _q_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: downsample the dominant
    language, keep the rest whole (corpus rebalancing)."""
    from high_performance_docling_ray.pipelines.text_analysis import (
        stratified_hash_sample,
    )

    return stratified_hash_sample(
        sf_dir,
        {"en": 200, "de": 1000, "fr": 1000, "es": 1000, "it": 1000},
        default_permille=500,
    )


def _q_lang_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import lang_stats

    return lang_stats(sf_dir)


def _q_q1(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import q1_pricing_summary

    return q1_pricing_summary(sf_dir)


def _q_q3(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import q3_shipping

    return q3_shipping(sf_dir, segment="BUILDING", k=10)


def _q_q5(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import q5_region_revenue

    return q5_region_revenue(sf_dir)


def _q_topk_orders(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import topk_orders

    return topk_orders(sf_dir, k=20)


def _q_topk_events_per_type(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        topk_events_per_type,
    )

    return topk_events_per_type(sf_dir, k=5)


def _q_distinct_segments(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import distinct_segments

    return distinct_segments(sf_dir)


def _q_filter_lineitem(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        filter_project_lineitem,
    )

    return filter_project_lineitem(sf_dir, min_qty=45.0)


def _q_events_hourly(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import events_hourly

    return events_hourly(sf_dir)


def _q_sliding_window(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        events_sliding_window,
    )

    return events_sliding_window(sf_dir)


def _q_pareto_orders(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        pareto_orders,
    )

    return pareto_orders(sf_dir)


def _q_sorted_neighborhood_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    return sorted_neighborhood_pairs(sf_dir)


def _q_bloom_semi_join(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        bloom_semi_join,
    )

    return bloom_semi_join(sf_dir)


def _q_bloom_semi_join_cogroup(sf_dir: str):
    """Forced any-cardinality tier: bloom prefilter + exact cogroup
    verify (the broadcast fast path disabled)."""
    from high_performance_docling_ray.pipelines.relational import (
        bloom_semi_join,
    )

    return bloom_semi_join(sf_dir, verify_budget=0)


def _q_bloom_semi_join_exactonly(sf_dir: str):
    """Cogroup tier minus the bloom prefilter — the no-filter baseline
    the driver hash-gates against the shared oracle."""
    from high_performance_docling_ray.pipelines.relational import (
        bloom_semi_join,
    )

    return bloom_semi_join(sf_dir, verify_budget=0, use_bloom=False)


def _q_events_moving_avg_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) partition exchange."""
    from high_performance_docling_ray.pipelines.relational import (
        events_moving_avg,
    )

    return events_moving_avg(sf_dir, driver_budget=0)


def _q_sorted_neighborhood_pairs_grouped(sf_dir: str):
    """Forced any-cardinality tier: two-level string-key ranks +
    halo-replicated pair blocks."""
    from high_performance_docling_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    return sorted_neighborhood_pairs(sf_dir, driver_budget=0)


def _q_events_moving_avg(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        events_moving_avg,
    )

    return events_moving_avg(sf_dir)


def _q_ntile_orders(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import ntile_orders

    return ntile_orders(sf_dir)


def _q_ntile_orders_grouped(sf_dir: str):
    """Forced any-cardinality tier: order-preserving float-bit buckets
    + two-level prefix-sum ranks (boundary buckets only re-ranked),
    with the bucket combine ALSO forced through the Ray groupby."""
    from high_performance_docling_ray.pipelines.seqstats import ntile_orders

    return ntile_orders(sf_dir, driver_budget=0, combine_limit=0)


def _q_mode_event_type(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        mode_event_type,
    )

    return mode_event_type(sf_dir)


def _q_mode_event_type_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) partition over the
    mergeable (user, event_type, n) count partials."""
    from high_performance_docling_ray.pipelines.seqstats import (
        mode_event_type,
    )

    return mode_event_type(sf_dir, combine_limit=0)


def _q_event_entropy(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import event_entropy

    return event_entropy(sf_dir)


def _q_event_entropy_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import event_entropy

    return event_entropy(sf_dir, combine_limit=0)


def _q_interval_merge(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import interval_merge

    return interval_merge(sf_dir)


def _q_interval_merge_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) partition exchange."""
    from high_performance_docling_ray.pipelines.seqstats import interval_merge

    return interval_merge(sf_dir, driver_budget=0)


def _q_activity_streaks(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        activity_streaks,
    )

    return activity_streaks(sf_dir)


def _q_activity_streaks_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) % P co-partition."""
    from high_performance_docling_ray.pipelines.seqstats import (
        activity_streaks,
    )

    return activity_streaks(sf_dir, driver_budget=0)


def _q_user_drawdown(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import user_drawdown

    return user_drawdown(sf_dir)


def _q_user_drawdown_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) % P co-partition."""
    from high_performance_docling_ray.pipelines.seqstats import user_drawdown

    return user_drawdown(sf_dir, driver_budget=0)


def _q_lag1_autocorr(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import lag1_autocorr

    return lag1_autocorr(sf_dir)


def _q_lag1_autocorr_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import lag1_autocorr

    return lag1_autocorr(sf_dir, driver_budget=0)


def _q_kcore_nodes(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import kcore_nodes

    return kcore_nodes(sf_dir)


def _q_kcore_nodes_cogroup(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import kcore_nodes

    return kcore_nodes(sf_dir, node_broadcast_budget=0)


def _q_frequent_item_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import (
        frequent_item_pairs,
    )

    return frequent_item_pairs(sf_dir)


def _q_frequent_item_pairs_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import (
        frequent_item_pairs,
    )

    return frequent_item_pairs(sf_dir, combine_limit=0)


def _q_butterfly_count(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import butterfly_count

    return butterfly_count(sf_dir)


def _q_butterfly_count_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import butterfly_count

    return butterfly_count(sf_dir, combine_limit=0)


def _q_rrf_fusion(sf_dir: str):
    from high_performance_docling_ray.pipelines.similarity import rrf_fusion

    return rrf_fusion(sf_dir)


def _q_weighted_sssp(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import weighted_sssp

    return weighted_sssp(sf_dir)


def _q_weighted_sssp_cogroup(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import weighted_sssp

    return weighted_sssp(sf_dir, node_budget=0)


def _q_user_value_trend(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import user_value_trend

    return user_value_trend(sf_dir)


def _q_user_value_trend_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import user_value_trend

    return user_value_trend(sf_dir, driver_budget=0)


def _q_theil_sen_trend(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import theil_sen_trend

    return theil_sen_trend(sf_dir)


def _q_theil_sen_trend_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) co-partition exchange."""
    from high_performance_docling_ray.pipelines.seqstats import theil_sen_trend

    return theil_sen_trend(sf_dir, driver_budget=0)


def _q_user_type_pivot(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        user_type_pivot,
    )

    return user_type_pivot(sf_dir)


def _q_user_type_pivot_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby-sum wide exchange."""
    from high_performance_docling_ray.pipelines.relational import (
        user_type_pivot,
    )

    return user_type_pivot(sf_dir, combine_limit=0)


def _q_ngram_diversity(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import ngram_diversity

    return ngram_diversity(sf_dir)


def _q_ngram_diversity_grouped(sf_dir: str):
    """Forced any-cardinality tier: both Ray groupby exchanges."""
    from high_performance_docling_ray.pipelines.dedup import ngram_diversity

    return ngram_diversity(sf_dir, combine_limit=0)


def _q_event_throttle(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        event_throttle,
    )

    return event_throttle(sf_dir)


def _q_event_throttle_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) co-partition exchange."""
    from high_performance_docling_ray.pipelines.seqstats import (
        event_throttle,
    )

    return event_throttle(sf_dir, driver_budget=0)


def _q_split_contamination(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import (
        split_contamination,
    )

    return split_contamination(sf_dir)


def _q_split_contamination_grouped(sf_dir: str):
    """Forced any-cardinality tier: shingle flags OR-reduce in the Ray
    groupby(h).max exchange; conjunction counts fold per block."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        split_contamination,
    )

    return split_contamination(sf_dir, combine_limit=0)


def _q_dataset_split_by_source(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split_by_source,
    )

    return dataset_split_by_source(sf_dir)


def _q_dataset_split_by_source_grouped(sf_dir: str):
    """Forced any-cardinality tier: (split, source) dedup in the Ray
    groupby + additive per-block row-count folds."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split_by_source,
    )

    return dataset_split_by_source(sf_dir, combine_limit=0)


def _q_dataset_split(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split,
    )

    return dataset_split(sf_dir)


def _q_dataset_split_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby count exchange."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split,
    )

    return dataset_split(sf_dir, combine_limit=0)


def _q_neardup_medoids(sf_dir: str):
    from high_performance_docling_ray.pipelines.components import (
        neardup_medoids,
    )

    return neardup_medoids(sf_dir)


def _q_neardup_medoids_distributed(sf_dir: str):
    """Forced tier: min-label propagation + the same cogroup attach."""
    from high_performance_docling_ray.pipelines.components import (
        neardup_medoids,
    )

    return neardup_medoids(sf_dir, pairs_broadcast_budget=0)


def _q_vocab_growth(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        vocab_growth,
    )

    return vocab_growth(sf_dir)


def _q_vocab_growth_grouped(sf_dir: str):
    """Forced any-cardinality tier: groupby(token).min + the second
    groupby(decile) exchange."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        vocab_growth,
    )

    return vocab_growth(sf_dir, combine_limit=0)


def _q_dup_clique_histogram(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import (
        dup_clique_histogram,
    )

    return dup_clique_histogram(sf_dir)


def _q_dup_clique_histogram_grouped(sf_dir: str):
    """Forced any-cardinality tier: both Ray groupby exchanges."""
    from high_performance_docling_ray.pipelines.dedup import (
        dup_clique_histogram,
    )

    return dup_clique_histogram(sf_dir, combine_limit=0)


def _q_value_concentration(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        value_concentration,
    )

    return value_concentration(sf_dir)


def _q_value_concentration_grouped(sf_dir: str):
    """Forced tier: the percentile stage's distributed _ntile_cents."""
    from high_performance_docling_ray.pipelines.seqstats import (
        value_concentration,
    )

    return value_concentration(sf_dir, combine_limit=0)


def _q_feature_correlations(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        feature_correlations,
    )

    return feature_correlations(sf_dir)


def _q_feature_correlations_grouped(sf_dir: str):
    """Forced tier: the pivot stage's Ray groupby exchange feeds the
    block moment partials."""
    from high_performance_docling_ray.pipelines.relational import (
        feature_correlations,
    )

    return feature_correlations(sf_dir, combine_limit=0)


def _q_benford_digits(sf_dir: str):
    from high_performance_docling_ray.pipelines.profiling import (
        benford_digits,
    )

    return benford_digits(sf_dir)


def _q_benford_digits_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby digit-count exchange."""
    from high_performance_docling_ray.pipelines.profiling import (
        benford_digits,
    )

    return benford_digits(sf_dir, combine_limit=0)


def _q_zipf_slope(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        zipf_slope,
    )

    return zipf_slope(sf_dir)


def _q_user_burstiness(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        user_burstiness,
    )

    return user_burstiness(sf_dir)


def _q_user_burstiness_grouped(sf_dir: str):
    """Forced any-cardinality tier: hash(user) co-partition exchange."""
    from high_performance_docling_ray.pipelines.seqstats import (
        user_burstiness,
    )

    return user_burstiness(sf_dir, driver_budget=0)


def _q_psi_source_drift(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        psi_source_drift,
    )

    return psi_source_drift(sf_dir)


def _q_psi_source_drift_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby cell-count exchange."""
    from high_performance_docling_ray.pipelines.hypotests import (
        psi_source_drift,
    )

    return psi_source_drift(sf_dir, combine_limit=0)


def _q_rolling_distinct_users(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        rolling_distinct_users,
    )

    return rolling_distinct_users(sf_dir)


def _q_rolling_distinct_users_grouped(sf_dir: str):
    """Forced any-cardinality tier: the hash(user) island exchange with
    the delta fold through the Ray groupby instead of the driver
    combine."""
    from high_performance_docling_ray.pipelines.seqstats import (
        rolling_distinct_users,
    )

    return rolling_distinct_users(sf_dir, driver_budget=0, combine_limit=0)


def _q_ngram_containment(sf_dir: str):
    from high_performance_docling_ray.pipelines.dedup import (
        ngram_containment_pairs,
    )

    return ngram_containment_pairs(sf_dir, threshold=0.4)


def _q_ngram_containment_distributed(sf_dir: str):
    """Forced any-cardinality tier: coarse shingle-partition shuffle +
    Ray keyed intersection count."""
    from high_performance_docling_ray.pipelines.dedup import (
        ngram_containment_pairs,
    )

    return ngram_containment_pairs(sf_dir, threshold=0.4, driver_budget=0)


def _q_user_value_deciles(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_deciles,
    )

    return user_value_deciles(sf_dir)


def _q_user_value_deciles_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby per-user totals + the
    distributed bucket-rank fold."""
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_deciles,
    )

    return user_value_deciles(sf_dir, combine_limit=0)


def _q_spearman_user_metrics(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        spearman_user_metrics,
    )

    return spearman_user_metrics(sf_dir)


def _q_spearman_user_metrics_grouped(sf_dir: str):
    """Forced any-cardinality tier: every combine (per-user partials,
    x-count map, bucket counts) through the Ray groupby."""
    from high_performance_docling_ray.pipelines.seqstats import (
        spearman_user_metrics,
    )

    return spearman_user_metrics(sf_dir, combine_limit=0)


def _q_kendall_user_metrics(sf_dir: str):
    from high_performance_docling_ray.pipelines.seqstats import (
        kendall_user_metrics,
    )

    return kendall_user_metrics(sf_dir)


def _q_kendall_user_metrics_grouped(sf_dir: str):
    """Forced any-cardinality tier: the 2-D grid decomposition — cross
    pairs from the cell matrix, same-bucket pairs from the two
    inversion-counter exchanges."""
    from high_performance_docling_ray.pipelines.seqstats import (
        kendall_user_metrics,
    )

    return kendall_user_metrics(sf_dir, combine_limit=0)


def _q_sparse_cosine_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.sparse_sim import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(sf_dir)


def _q_sparse_cosine_pairs_distributed(sf_dir: str):
    """Forced any-cardinality SPARSE tier: distributed df attach
    (cogroup by token + per-doc normalize) AND the token-partition
    pair-sum shuffle — no broadcast anywhere (dense reroute disabled
    so the sparse exchanges are what the gate hashes)."""
    from high_performance_docling_ray.pipelines.sparse_sim import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(
        sf_dir, driver_budget=0, df_budget=0, dense_vocab_budget=0
    )


def _q_sparse_cosine_pairs_dense_sharded(sf_dir: str):
    """Forced dense block-pair-store tier: the tiny cell budget pushes
    the dense matmul off the driver onto the persisted hash-blocked
    store with one task per block pair."""
    from high_performance_docling_ray.pipelines.sparse_sim import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(
        sf_dir, strategy="dense", dense_cell_budget=10_000
    )


def _q_sparse_cosine_pairs_prefix(sf_dir: str):
    """All-Pairs prefix-filter strategy (recall exactly 1) + exact
    candidate-only verify — the hot-token reroute target."""
    from high_performance_docling_ray.pipelines.sparse_sim import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(sf_dir, strategy="prefix")


def _q_mannwhitney_value(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        mannwhitney_value,
    )

    return mannwhitney_value(sf_dir)


def _q_mannwhitney_value_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby(v) count merge + the
    range-scaled value-bucket rank pass."""
    from high_performance_docling_ray.pipelines.hypotests import (
        mannwhitney_value,
    )

    return mannwhitney_value(sf_dir, combine_limit=0)


def _q_ks_two_sample(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        ks_two_sample,
    )

    return ks_two_sample(sf_dir)


def _q_ks_two_sample_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby(v) count merge + the
    range-scaled value-bucket CDF pass."""
    from high_performance_docling_ray.pipelines.hypotests import (
        ks_two_sample,
    )

    return ks_two_sample(sf_dir, combine_limit=0)


def _q_welch_ttest_value(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        welch_ttest_value,
    )

    return welch_ttest_value(sf_dir)


def _q_welch_ttest_value_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        welch_ttest_value,
    )

    return welch_ttest_value(sf_dir, combine_limit=0)


def _q_contingency_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        contingency_stats,
    )

    return contingency_stats(sf_dir)


def _q_contingency_stats_grouped(sf_dir: str):
    from high_performance_docling_ray.pipelines.hypotests import (
        contingency_stats,
    )

    return contingency_stats(sf_dir, combine_limit=0)


def _q_range_join(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        range_join_events,
    )

    return range_join_events(sf_dir)


def _q_asof_join(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import asof_join_events

    return asof_join_events(sf_dir)


def _q_sessionize(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import sessionize

    return sessionize(sf_dir)


def _q_bigram_logprob(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import (
        bigram_logprob,
    )

    return bigram_logprob(sf_dir)


def _q_perplexity_buckets(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import (
        perplexity_buckets,
    )

    return perplexity_buckets(sf_dir)


def _q_substring_dedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.substring import (
        substring_dedup,
    )

    return substring_dedup(sf_dir)


def _q_url_curation(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        url_curation,
    )

    return url_curation(sf_dir)


def _q_domain_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        domain_stats,
    )

    return domain_stats(sf_dir)


def _q_chunk_documents(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        chunk_documents,
    )

    return chunk_documents(sf_dir)


def _q_ingest_jsonl(sf_dir: str):
    from high_performance_docling_ray.pipelines.io import ingest_jsonl

    return ingest_jsonl(sf_dir)


def _q_domain_split(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        domain_split,
    )

    return domain_split(sf_dir)


def _q_ingest_csv(sf_dir: str):
    from high_performance_docling_ray.pipelines.io import ingest_csv

    return ingest_csv(sf_dir)


def _q_incremental_minhash(sf_dir: str):
    from high_performance_docling_ray.pipelines.incremental import (
        incremental_minhash,
    )

    return incremental_minhash(sf_dir)


def _q_bpe_train(sf_dir: str):
    """BPE trainer gate (VERDICT r4 #7 extension): the merge table
    itself is an iterative argmax outside SQL (pinned against a
    from-scratch serial reference in tests/test_bpe.py), but its
    INVARIANTS are driver-checkable: ``n_distinct_words`` is genuinely
    computed on both sides (the trainer's weighted vocabulary row
    count vs SQL COUNT(DISTINCT word)), and every merged token must
    be a substring of at least one corpus word (gate-scale check over
    the distinct-word list)."""
    import pyarrow as _pa

    from high_performance_docling_ray.pipelines.bpe import (
        _vocab_dataset,
        bpe_train,
    )

    merges = bpe_train(sf_dir)
    merged = [
        a + b
        for a, b in zip(merges.column("left").to_pylist(),
                        merges.column("right").to_pylist())
    ]
    words = [
        r["word"] for r in _vocab_dataset(sf_dir).take_all()
    ]
    ok = all(any(m in w for w in words) for m in merged)
    return _pa.Table.from_pydict(
        {
            "n_distinct_words": _pa.array([len(words)], _pa.int64()),
            "n_merges": _pa.array([merges.num_rows], _pa.int64()),
            "merges_substring_ok": _pa.array([ok], _pa.bool_()),
        }
    )


def _q_bpe_encode(sf_dir: str):
    """BPE encoder gate: the iterative merge application is outside
    SQL (token-level agreement pinned against the serial reference in
    tests/test_bpe.py), but per-doc ``n_words`` is genuinely computed
    on both sides (the encoder's tokenizer vs the SQL whitespace
    split) and ``roundtrip_ok`` pins lossless decode — BPE pieces
    partition a word's characters, so join(encode(w)) must equal w
    for every distinct word of every doc."""
    from high_performance_docling_ray.pipelines.bpe import bpe_encode

    return bpe_encode(sf_dir, verify_roundtrip=True).map_batches(
        lambda b: b.select(["doc_id", "n_words", "roundtrip_ok"]),
        batch_format="pyarrow",
    )


def _q_line_dedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        line_dedup,
    )

    return line_dedup(sf_dir)


def _q_mixture_sample(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        mixture_sample,
    )

    return mixture_sample(sf_dir)


def _q_importance_resample(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import (
        importance_resample,
    )

    return importance_resample(sf_dir)


def _q_incremental_dedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.incremental import (
        incremental_dedup,
    )

    return incremental_dedup(sf_dir)


def _q_crossdoc_ngram_dup(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import (
        crossdoc_ngram_dup,
    )

    return crossdoc_ngram_dup(sf_dir)


def _q_semdedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.clustering import semdedup

    return semdedup(sf_dir)


def _q_dedup_keep_best(sf_dir: str):
    from high_performance_docling_ray.pipelines.components import (
        dedup_keep_best,
    )

    return dedup_keep_best(sf_dir)


def _q_kmeans(sf_dir: str):
    from high_performance_docling_ray.pipelines.clustering import kmeans_assign

    return kmeans_assign(sf_dir)


def _q_bm25_topk(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import bm25_topk

    return bm25_topk(sf_dir)


def _q_dsir_weights(sf_dir: str):
    from high_performance_docling_ray.pipelines.lm_filters import dsir_weights

    return dsir_weights(sf_dir)


def _q_pagerank(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import pagerank

    return pagerank(sf_dir)


def _q_pagerank_cogroup(sf_dir: str):
    """Over-budget tier: ranks attach via cogroup, never broadcast."""
    from high_performance_docling_ray.pipelines.graph import pagerank

    return pagerank(sf_dir, rank_broadcast_budget=0)


def _q_degree_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import degree_stats

    return degree_stats(sf_dir)


def _budget0(module: str, fn: str) -> Callable[[str], Any]:
    """Forced distributed-tier runner: ``build_budget=0`` makes every
    corpus-scaling broadcast read fail its parquet-footer row probe, so
    the query takes its ``cogroup_attach`` tier end-to-end. Each
    ``*_cogroup`` entry shares the base query's oracle SQL — the driver
    hash-gates the distributed tier against the same answer."""

    def run(sf_dir: str):
        import importlib

        m = importlib.import_module(
            f"high_performance_docling_ray.pipelines.{module}"
        )
        return getattr(m, fn)(sf_dir, build_budget=0)

    return run


# (entry name, base oracle name) for every budget-gated TPC-H query —
# drives both the queries() registration and the oracle_sql aliasing
_COGROUP_TIERS: dict[str, tuple[str, str, str]] = {
    "q3_top_orders_cogroup": ("relational", "q3_shipping", "q3_top_orders"),
    "q18_big_orders_cogroup": ("relational", "q18_big_orders", "q18_big_orders"),
    "q4_order_priority_cogroup": ("analytics", "q4_order_priority", "q4_order_priority"),
    "q7_nation_volume_cogroup": ("analytics", "q7_nation_volume", "q7_nation_volume"),
    "q10_returned_items_cogroup": ("analytics", "q10_returned_items", "q10_returned_items"),
    "q12_priority_lines_cogroup": ("analytics", "q12_priority_lines", "q12_priority_lines"),
    "q14_promo_revenue_cogroup": ("analytics", "q14_promo_revenue", "q14_promo_revenue"),
    "q2_min_cost_supplier_cogroup": ("tpch_ext", "q2_min_cost_supplier", "q2_min_cost_supplier"),
    "q8_market_share_cogroup": ("tpch_ext", "q8_market_share", "q8_market_share"),
    "q9_nation_profit_cogroup": ("tpch_ext", "q9_nation_profit", "q9_nation_profit"),
    "q11_important_stock_cogroup": ("tpch_ext", "q11_important_stock", "q11_important_stock"),
    "q13_order_distribution_cogroup": ("tpch_ext", "q13_customer_distribution", "q13_order_distribution"),
    "q15_top_supplier_cogroup": ("tpch_ext", "q15_top_supplier", "q15_top_supplier"),
    "q16_supplier_part_counts_cogroup": ("tpch_ext", "q16_supplier_part_counts", "q16_supplier_part_counts"),
    "q17_small_qty_revenue_cogroup": ("tpch_ext", "q17_small_quantity_revenue", "q17_small_qty_revenue"),
    "q19_disjunctive_revenue_cogroup": ("tpch_ext", "q19_disjunctive_revenue", "q19_disjunctive_revenue"),
    "q20_promotion_suppliers_cogroup": ("tpch_ext", "q20_promotion_suppliers", "q20_promotion_suppliers"),
    "q21_waiting_suppliers_cogroup": ("tpch_ext", "q21_waiting_suppliers", "q21_waiting_suppliers"),
    "q22_dormant_customers_cogroup": ("tpch_ext", "q22_dormant_customers", "q22_dormant_customers"),
}

# The driver's correctness gate covers the FIRST 50 queries() entries.
# 25 PERMANENT flagships (one per operator family + the forced
# distributed-tier entries) lead every round; the other 25 slots
# ROTATE deterministically each round over the oracle-backed queries
# the PREVIOUS round's gate did not cover, so across rounds every
# family eventually produces a driver-side CORRECTNESS row
# (VERDICT r4 next-round #3).
_FLAGSHIP_25 = [
    "extract_pdf_docs", "extract_pdf_ocr_cogroup",
    "extract_pdf_tables", "extract_confidence",
    "exact_dedup", "minhash_lsh_pairs", "segment_dedup",
    "substring_dedup", "edit_distance_pairs", "incremental_dedup",
    "embedding_neardup_pairs", "sparse_cosine_pairs", "knn_graph",
    "kmeans_clusters", "tfidf_topk", "decontaminate", "clean_corpus",
    "pack_sequences", "quality_classifier", "pagerank",
    "kcore_nodes_cogroup", "theil_sen_trend", "psi_source_drift",
    "q1_pricing_summary", "q21_waiting_suppliers_cogroup",
]


def _gate_round() -> int:
    """Current build round, derived from the recorded gate files —
    deterministic within a round, advances when the driver writes the
    next CORRECTNESS_r{N}.json."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(ns) + 1) if ns else 1


def _prev_gate_names() -> set:
    """Names the newest recorded gate already covered (skipped by the
    rotation so each round's 25 rotated slots are NEW evidence)."""
    import glob
    import json
    import os

    import re

    here = os.path.dirname(os.path.abspath(__file__))
    files = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    numbered = [
        (int(m.group(1)), f)
        for f in files
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    if not numbered:
        return set()
    # numeric max, not lexicographic sort: unpadded round numbers
    # (r10 vs r9) would otherwise pick the wrong "newest" gate
    try:
        with open(max(numbered)[1]) as f:
            return set(json.load(f))
    except (OSError, ValueError):
        return set()


def _rotated_head(q: dict) -> list[str]:
    flag = [k for k in _FLAGSHIP_25 if k in q]
    oracles = oracle_sql()
    # rotation pool: oracle-backed entries only (hash evidence, not
    # rows-only), minus the permanent flagships
    pool = sorted(k for k in q if k in oracles and k not in _FLAGSHIP_25)
    if not pool:
        return flag
    prev = _prev_gate_names()
    rnd = _gate_round()
    off = ((rnd - 1) * 25) % len(pool)
    rotated: list[str] = []
    # first pass prefers names the previous gate did NOT cover
    for i in range(len(pool)):
        name = pool[(off + i) % len(pool)]
        if name not in prev:
            rotated.append(name)
            if len(rotated) == 25:
                break
    # backfill (only when fewer than 25 uncovered names exist)
    for i in range(len(pool)):
        if len(rotated) >= 25:
            break
        name = pool[(off + i) % len(pool)]
        if name not in rotated:
            rotated.append(name)
    return flag + rotated


def queries() -> dict[str, Callable[[str], Any]]:
    q = _all_queries()
    for name, (module, fn, _oracle) in _COGROUP_TIERS.items():
        q[name] = _budget0(module, fn)
    head = {k: q[k] for k in _rotated_head(q) if k in q}
    return {**head, **{k: v for k, v in q.items() if k not in head}}


def _all_queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship extraction (SURVEY.md §3; non-SQL, rows-only check)
        "extract_pages": _q_extract_pages,
        "extract_docs_text": _q_extract_docs_text,
        "extract_synth_corpus": _q_extract_synth,
        "extract_pdf_docs": _q_extract_pdf_docs,
        "extract_pdf_ocr": _q_extract_pdf_ocr,
        "extract_pdf_ocr_distributed": _q_extract_pdf_ocr_distributed,
        "extract_pdf_ocr_cogroup": _q_extract_pdf_ocr_cogroup,
        "extract_pdf_tables": _q_extract_pdf_tables,
        "extract_pdf_enriched": _q_extract_pdf_enriched,
        "extract_confidence": _q_extract_confidence,
        "extract_list_markers": _q_extract_list_markers,
        "extract_ocr_enriched": _q_extract_enriched,
        "extract_ocr_distributed": _q_extract_ocr_distributed,
        "ocr_recognize": _q_ocr_tasks,
        "ocr_recognize_pdf": _q_ocr_recognize_pdf,
        "figure_crops": _q_figure_crops,
        "neardup_components": _q_neardup_components,
        "postings_lookup": _q_postings_lookup,
        "phrase_lookup": _q_phrase_lookup,
        "top_tokens": _q_top_tokens,
        "frequent_ngrams": _q_frequent_ngrams,
        "cms_token_estimates": _q_cms_estimates,
        "quantize_embeddings": _q_quantize_embeddings,
        "sample_per_group": _q_sample_per_group,
        "exact_quantiles": _q_exact_quantiles,
        "anti_join_customers": _q_anti_join,
        "repetition_signals": _q_repetition_signals,
        "redact_pii": _q_redact_pii,
        "segment_dedup": _q_segment_dedup,
        "tfidf_topk": _q_tfidf_topk,
        "decontaminate": _q_decontaminate,
        "quality_classifier": _q_quality_classifier,
        "unigram_logprob": _q_unigram_logprob,
        "pack_sequences": _q_pack_sequences,
        "pack_bins": _q_pack_bins,
        "pack_assignments": _q_pack_assignments,
        "clean_corpus": _q_clean_corpus,
        "curate_and_pack": _q_curate_and_pack,
        "shuffle_ranks": _q_shuffle_ranks,
        "bloom_tokens": _q_bloom_tokens,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "debug_overlays": _q_debug_overlays,
        # multimodal: binary media column -> actor-pool decode/feature
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "video_frame_features": _q_video_frames,
        "figure_features": _q_figure_features,
        # corpus dedup family
        "exact_dedup": _q_exact_dedup,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "embedding_neardup_pairs": _q_embedding_neardup,
        "embedding_neardup_ivf": _q_embedding_neardup_ivf,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        # similarity search
        "knn_brute_cosine": _q_knn_brute,
        "knn_ivf_cosine": _q_knn_ivf,
        "knn_ivf_fullprobe": _q_knn_ivf_fullprobe,
        # text analysis
        "token_counts": _q_token_counts,
        "fingerprint_md5": _q_fingerprint_md5,
        "fingerprint_rolling": _q_fingerprint_rolling,
        "language_id": _q_language_id,
        "quality_scores": _q_quality,
        "doc_stats": _q_doc_stats,
        "lang_stats": _q_lang_stats,
        "hash_sample": _q_hash_sample,
        "stratified_sample": _q_stratified_sample,
        "hll_distinct_users": _q_hll_distinct,
        "hll_distinct_hourly": _q_hll_hourly,
        "source_composition": _q_source_composition,
        "source_divergence": _q_source_divergence,
        "winnowing_fingerprints": _q_winnowing,
        "winnowing_overlap_pairs": _q_winnowing_pairs,
        "label_centroids": _q_label_centroids,
        "props_extract": _q_props_extract,
        # relational operator demos
        "q1_pricing_summary": _q_q1,
        "q3_top_orders": _q_q3,
        "q5_region_revenue": _q_q5,
        "topk_orders": _q_topk_orders,
        "topk_events_per_type": _q_topk_events_per_type,
        "distinct_segments": _q_distinct_segments,
        "filter_lineitem": _q_filter_lineitem,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
        "asof_join_events": _q_asof_join,
        "range_join_events": _q_range_join,
        "events_sliding_window": _q_sliding_window,
        "events_moving_avg": _q_events_moving_avg,
        "bloom_semi_join": _q_bloom_semi_join,
        "bloom_semi_join_cogroup": _q_bloom_semi_join_cogroup,
        "bloom_semi_join_exactonly": _q_bloom_semi_join_exactonly,
        "sorted_neighborhood_pairs": _q_sorted_neighborhood_pairs,
        "sorted_neighborhood_pairs_grouped": _q_sorted_neighborhood_pairs_grouped,
        "events_moving_avg_grouped": _q_events_moving_avg_grouped,
        "pareto_orders": _q_pareto_orders,
        # per-key sequence & distribution statistics (seqstats.py)
        "ntile_orders": _q_ntile_orders,
        "ntile_orders_grouped": _q_ntile_orders_grouped,
        "mode_event_type": _q_mode_event_type,
        "mode_event_type_grouped": _q_mode_event_type_grouped,
        "event_entropy": _q_event_entropy,
        "event_entropy_grouped": _q_event_entropy_grouped,
        "interval_merge": _q_interval_merge,
        "interval_merge_grouped": _q_interval_merge_grouped,
        "lag1_autocorr": _q_lag1_autocorr,
        "lag1_autocorr_grouped": _q_lag1_autocorr_grouped,
        "user_value_trend": _q_user_value_trend,
        "user_value_trend_grouped": _q_user_value_trend_grouped,
        "theil_sen_trend": _q_theil_sen_trend,
        "theil_sen_trend_grouped": _q_theil_sen_trend_grouped,
        "user_burstiness": _q_user_burstiness,
        "user_burstiness_grouped": _q_user_burstiness_grouped,
        "benford_digits": _q_benford_digits,
        "benford_digits_grouped": _q_benford_digits_grouped,
        "zipf_slope": _q_zipf_slope,
        "user_type_pivot": _q_user_type_pivot,
        "user_type_pivot_grouped": _q_user_type_pivot_grouped,
        "feature_correlations": _q_feature_correlations,
        "feature_correlations_grouped": _q_feature_correlations_grouped,
        "vocab_growth": _q_vocab_growth,
        "vocab_growth_grouped": _q_vocab_growth_grouped,
        "neardup_medoids": _q_neardup_medoids,
        "neardup_medoids_distributed": _q_neardup_medoids_distributed,
        "dataset_split": _q_dataset_split,
        "dataset_split_grouped": _q_dataset_split_grouped,
        "dataset_split_by_source": _q_dataset_split_by_source,
        "split_contamination": _q_split_contamination,
        "split_contamination_grouped": _q_split_contamination_grouped,
        "dataset_split_by_source_grouped": _q_dataset_split_by_source_grouped,
        "ngram_diversity": _q_ngram_diversity,
        "ngram_diversity_grouped": _q_ngram_diversity_grouped,
        "event_throttle": _q_event_throttle,
        "event_throttle_grouped": _q_event_throttle_grouped,
        "dup_clique_histogram": _q_dup_clique_histogram,
        "dup_clique_histogram_grouped": _q_dup_clique_histogram_grouped,
        "value_concentration": _q_value_concentration,
        "value_concentration_grouped": _q_value_concentration_grouped,
        "psi_source_drift": _q_psi_source_drift,
        "psi_source_drift_grouped": _q_psi_source_drift_grouped,
        "kcore_nodes": _q_kcore_nodes,
        "kcore_nodes_cogroup": _q_kcore_nodes_cogroup,
        "weighted_sssp": _q_weighted_sssp,
        "weighted_sssp_cogroup": _q_weighted_sssp_cogroup,
        "rrf_fusion": _q_rrf_fusion,
        "butterfly_count": _q_butterfly_count,
        "butterfly_count_grouped": _q_butterfly_count_grouped,
        "frequent_item_pairs": _q_frequent_item_pairs,
        "frequent_item_pairs_grouped": _q_frequent_item_pairs_grouped,
        "user_drawdown": _q_user_drawdown,
        "user_drawdown_grouped": _q_user_drawdown_grouped,
        "activity_streaks": _q_activity_streaks,
        "activity_streaks_grouped": _q_activity_streaks_grouped,
        "rolling_distinct_users": _q_rolling_distinct_users,
        "rolling_distinct_users_grouped": _q_rolling_distinct_users_grouped,
        "ngram_containment_pairs": _q_ngram_containment,
        "ngram_containment_pairs_distributed": _q_ngram_containment_distributed,
        "user_value_deciles": _q_user_value_deciles,
        "user_value_deciles_grouped": _q_user_value_deciles_grouped,
        "spearman_user_metrics": _q_spearman_user_metrics,
        "spearman_user_metrics_grouped": _q_spearman_user_metrics_grouped,
        "kendall_user_metrics": _q_kendall_user_metrics,
        "kendall_user_metrics_grouped": _q_kendall_user_metrics_grouped,
        # sparse all-pairs similarity (APSS)
        "sparse_cosine_pairs": _q_sparse_cosine_pairs,
        "sparse_cosine_pairs_distributed": _q_sparse_cosine_pairs_distributed,
        "sparse_cosine_pairs_prefix": _q_sparse_cosine_pairs_prefix,
        "sparse_cosine_pairs_dense_sharded": (
            _q_sparse_cosine_pairs_dense_sharded
        ),
        # two-sample / two-axis hypothesis tests
        "mannwhitney_value": _q_mannwhitney_value,
        "mannwhitney_value_grouped": _q_mannwhitney_value_grouped,
        "ks_two_sample": _q_ks_two_sample,
        "ks_two_sample_grouped": _q_ks_two_sample_grouped,
        "welch_ttest_value": _q_welch_ttest_value,
        "welch_ttest_value_grouped": _q_welch_ttest_value_grouped,
        "contingency_stats": _q_contingency_stats,
        "contingency_stats_grouped": _q_contingency_stats_grouped,
        # graph analytics (link-graph shape over the lineitem bipartite)
        "pagerank": _q_pagerank,
        "pagerank_cogroup": _q_pagerank_cogroup,
        "degree_stats": _q_degree_stats,
        # retrieval + data-selection
        "bm25_topk": _q_bm25_topk,
        "dsir_weights": _q_dsir_weights,
        "kmeans_clusters": _q_kmeans,
        "semdedup": _q_semdedup,
        "dedup_keep_best": _q_dedup_keep_best,
        "crossdoc_ngram_dup": _q_crossdoc_ngram_dup,
        "incremental_dedup": _q_incremental_dedup,
        "importance_resample": _q_importance_resample,
        "bigram_logprob": _q_bigram_logprob,
        "perplexity_buckets": _q_perplexity_buckets,
        "substring_dedup": _q_substring_dedup,
        "url_curation": _q_url_curation,
        "domain_stats": _q_domain_stats,
        "mixture_sample": _q_mixture_sample,
        "chunk_documents": _q_chunk_documents,
        "line_dedup": _q_line_dedup,
        "bpe_train": _q_bpe_train,
        "bpe_encode": _q_bpe_encode,
        "incremental_minhash": _q_incremental_minhash,
        "corpus_diff": _q_corpus_diff,
        "ingest_jsonl": _q_ingest_jsonl,
        "ingest_csv": _q_ingest_csv,
        "domain_split": _q_domain_split,
        "normalize_text": _q_normalize_text,
        "corpus_report": _q_corpus_report,
        # embedding decomposition + quantization
        "embedding_covariance": _q_embedding_covariance,
        "pca_project": _q_pca_project,
        "pq_codes": _q_pq_codes,
        "knn_pq_adc": _q_knn_pq_adc,
        "random_projection": _q_random_projection,
        "weighted_sample": _q_weighted_sample,
        # outlink extraction + domain link graph
        "extract_links": _q_extract_links,
        "link_domain_graph": _q_link_domain_graph,
        "cocitation_pairs": _q_cocitation_pairs,
        "cocitation_pairs_grouped": _q_cocitation_pairs_grouped,
        "domain_pagerank": _q_domain_pagerank,
        "domain_hits": _q_domain_hits,
        "anchor_text_stats": _q_anchor_text_stats,
        "crawl_frontier": _q_crawl_frontier,
        "frontier_prioritized": _q_frontier_prioritized,
        "cdx_index": _q_cdx_index,
        "robots_filter": _q_robots_filter,
        "quality_threshold_filter": _q_quality_threshold_filter,
        "parse_warc": _q_parse_warc,
        # head-section metadata extraction family
        "page_metadata": _q_page_metadata,
        "html_outline": _q_html_outline,
        "sitemap_urls": _q_sitemap_urls,
        "fix_mojibake": _q_fix_mojibake,
        "html_tables": _q_html_tables,
        "capture_change_rate": _q_capture_change_rate,
        "canonical_collapse": _q_canonical_collapse,
        "host_line_dedup": _q_host_line_dedup,
        "incremental_decontaminate": _q_incremental_decontaminate,
        "paragraph_dedup": _q_paragraph_dedup,
        "parse_wet": _q_parse_wet,
        "sitemap_frontier": _q_sitemap_frontier,
        "incremental_extract": _q_incremental_extract,
        "cdc_chunks": _q_cdc_chunks,
        "html_structure_groups": _q_html_structure_groups,
        "cdc_dedup_stats": _q_cdc_dedup_stats,
        "index_export": _q_index_export,
        # table profiling (ANALYZE-style planning stats)
        "column_profile": _q_column_profile,
        # unicode script composition (orthography axis of lang-ID)
        "script_mix": _q_script_mix,
        # Dolma-style attribute sidecars: tag once, mix many times
        "tag_attributes": _q_tag_attributes,
        "mix_attributes": _q_mix_attributes,
        # margin-based bitext mining (LASER/CCMatrix recipe); the
        # _sharded entry forces the out-of-core tier through the same
        # oracle
        "bitext_mine": _q_bitext_mine,
        "bitext_mine_sharded": _q_bitext_mine_sharded,
        # small-file compaction, hash-gated through the extraction
        # oracle (write -> compact -> read-back)
        "compact_store": _q_compact_store,
        # mergeable histogram quantile sketch (approx_percentile shape)
        "histogram_quantiles": _q_histogram_quantiles,
        # per-paragraph language segmentation (CCNet code-switch rule)
        "paragraph_langs": _q_paragraph_langs,
        # Merkle dataset fingerprint (versioning / shard diff)
        "dataset_fingerprint": _q_dataset_fingerprint,
        # exact triangle counting (degree-ordered compact-forward);
        # _cogroup forces the no-broadcast wedge-and-close tier
        "triangle_count": _q_triangle_count,
        "degree_assortativity": _q_degree_assortativity,
        "clustering_coefficient": _q_clustering_coefficient,
        "clustering_coefficient_cogroup": (
            _q_clustering_coefficient_cogroup
        ),
        "triangle_count_cogroup": _q_triangle_count_cogroup,
        # TPC-H q18 shape: HAVING-filtered winner set before any join
        "q18_big_orders": _q_q18_big_orders,
        # event-time watermark / late-data accounting
        "late_event_stats": _q_late_event_stats,
        # would-be shuffle balance per candidate partition key
        "partition_skew_report": _q_partition_skew_report,
        "zorder_layout": _q_zorder_layout,
        "zorder_layout_grouped": _q_zorder_layout_grouped,
        # perceptual-hash image dedup (stub decode; real dHash + the
        # key-only dedup shape) — rows-only like the other multimodal
        # stub-model pipelines; planted-dup recall is test-pinned
        "image_phash_dedup": _q_image_phash_dedup,
        # per-dimension z-score embedding sanity screen
        "embedding_outliers": _q_embedding_outliers,
        # GROUPED histogram sketch (register merge through the
        # groupby, the hll_distinct_hourly shape)
        "lang_histogram_quantiles": _q_lang_histogram_quantiles,
        # vocabulary-bounded PMI collocations (k x k register M.T@M)
        "pmi_pairs": _q_pmi_pairs,
        # time-series resample: zero-filled per-user hourly counts
        "events_gap_fill": _q_events_gap_fill,
        # bulk kNN-graph construction (graph-ANN / SemDeDup primitive);
        # _sharded forces the out-of-core shard-streaming tier
        "knn_graph": _q_knn_graph,
        "knn_graph_sharded": _q_knn_graph_sharded,
        "hard_negatives": _q_hard_negatives,
        "hard_negatives_sharded": _q_hard_negatives_sharded,
        # TPC-H relational widening (pipelines/analytics.py): the
        # remaining classic query shapes the schema can express
        "q4_order_priority": _q_q4_order_priority,   # EXISTS semi-join
        "q6_forecast_revenue": _q_q6_forecast,       # filtered scan agg
        "q7_nation_volume": _q_q7_nation_volume,     # 2-nation volume/yr
        "q10_returned_items": _q_q10_returned,       # join + topk cust
        "q12_priority_lines": _q_q12_priority,       # CASE-count pivot
        "q14_promo_revenue": _q_q14_promo,           # ratio aggregate
        # GROUP BY ROLLUP derived from one finest-grain exact pass
        "revenue_rollup": _q_revenue_rollup,
        # ordered event funnel (strict min-time chaining per user)
        "funnel_analysis": _q_funnel_analysis,
        # cohort-day x day-offset distinct-user retention matrix
        "retention_cohorts": _q_retention_cohorts,
        "retention_cohorts_distributed": _q_retention_distributed,
        # TPC-H tail (pipelines/tpch_ext.py): the last classic shapes
        # the schema can express (adaptations in each docstring)
        "q8_market_share": _q_q8_market_share,       # ratio per year
        "q13_order_distribution": _q_q13_distribution,  # outer-join hist
        "q15_top_supplier": _q_q15_top_supplier,     # global-max winners
        "q17_small_qty_revenue": _q_q17_small_qty,   # correlated avg
        "q19_disjunctive_revenue": _q_q19_disjunct,  # OR-of-AND scan
        "q21_waiting_suppliers": _q_q21_waiting,     # self-join argmax
        "q22_dormant_customers": _q_q22_dormant,     # scalar-sub + anti
        # hot-key-SALTED cogroup enrichment join (every key hot by
        # construction; skew tier of joins.cogroup_attach)
        "event_type_warmup": _q_event_type_warmup,
        # LAG window: per-type day-over-day growth (driver shift over
        # the bounded (type, day) aggregate)
        "events_dod_growth": _q_events_dod_growth,
        # GROUP BY CUBE grouping sets from one finest-grain pass
        "events_cube": _q_events_cube,
        # exact edit-distance<=2 fuzzy self-join (SymSpell deletion
        # neighborhoods with an O(1) algebraic delete-hash)
        "edit_distance_pairs": _q_edit_distance_pairs,
        "jaro_winkler_pairs": _q_jaro_winkler_pairs,
        "jaro_winkler_pairs_grouped": _q_jaro_winkler_pairs_grouped,
        # interpolated exact quantiles (quantile_cont sibling of the
        # value-count exact_quantiles — no global sort)
        "exact_quantiles_cont": _q_exact_quantiles_cont,
        # HLL sketch ALGEBRA: pairwise distinct-user overlap via
        # inclusion-exclusion over merged registers
        "hll_user_overlap": _q_hll_user_overlap,
        # exact bounded-depth BFS distances from a seed set (frontier
        # sweeps / Bellman-Ford cogroup tiers)
        "bfs_distances": _q_bfs_distances,
        # row-level cume_dist / percent_rank distribution windows
        # (value-count broadcast, tie-stable)
        "events_value_ranks": _q_events_value_ranks,
        # LEAD window: per-user event-type transition (Markov) counts
        "event_transitions": _q_event_transitions,
        # exact robust aggregates (trimmed + winsorized mean) from
        # int64-cents value counts, no global sort
        "trimmed_stats": _q_trimmed_stats,
        # entity resolution: connected components over the fuzzy
        # edit-distance pair set (composition of two verified ops)
        "fuzzy_components": _q_fuzzy_components,
        # ordered STRING_AGG: per-user event-type path counts
        "user_event_paths": _q_user_event_paths,
        # mergeable-moment statistics: exact Pearson corr/cov and
        # per-group OLS trend from integer moment partials
        "price_qty_correlation": _q_price_qty_correlation,
        "events_trend": _q_events_trend,
        # two-pass exact median + MAD (half-cent integer arithmetic)
        "mad_stats": _q_mad_stats,
        # CMS inner-product join-size (F2) estimation vs the exact
        # value — the query-planning primitive
        "selfjoin_size_estimate": _q_selfjoin_size_estimate,
        # exact Gini inequality coefficient from value counts
        "gini_coefficient": _q_gini_coefficient,
        # GROUPED two-pass exact median + MAD (per-lang robust stats)
        "lang_median_mad": _q_lang_median_mad,
        # DENSE_RANK top-k with ties kept (per-priority top values)
        "top_order_values_with_ties": _q_top_order_values_with_ties,
        # exact weighted median (revenue-weighted quantity)
        "weighted_median_qty": _q_weighted_median_qty,
        # the final TPC-H shapes over the DERIVED partsupp (distinct
        # (part,supp) pairs from lineitem; cost = pure fn of the keys,
        # identical CTE on both sides) — completes all 22 queries
        "q2_min_cost_supplier": _q_q2_min_cost,       # per-part argmin
        "q9_nation_profit": _q_q9_profit,             # zero-join profit
        "q11_important_stock": _q_q11_stock,          # scalar threshold
        "q16_supplier_part_counts": _q_q16_counts,    # count-distinct
        "q20_promotion_suppliers": _q_q20_promo,      # correlated half
    }


def _q_q4_order_priority(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q4_order_priority

    return q4_order_priority(sf_dir)


def _q_q6_forecast(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q6_forecast_revenue

    return q6_forecast_revenue(sf_dir)


def _q_q7_nation_volume(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q7_nation_volume

    return q7_nation_volume(sf_dir)


def _q_q10_returned(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q10_returned_items

    return q10_returned_items(sf_dir)


def _q_q12_priority(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q12_priority_lines

    return q12_priority_lines(sf_dir)


def _q_q14_promo(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import q14_promo_revenue

    return q14_promo_revenue(sf_dir)


def _q_revenue_rollup(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import revenue_rollup

    return revenue_rollup(sf_dir)


def _q_funnel_analysis(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import funnel_analysis

    return funnel_analysis(sf_dir)


def _q_retention_distributed(sf_dir: str):
    """Forced any-cardinality retention tier (combine_limit=0): the
    per-user cohort map attaches to events by cogroup and the distinct
    triples dedup in the Ray groupby — no per-user state on the driver
    or in a broadcast. Shares the base oracle."""
    from high_performance_docling_ray.pipelines.analytics import (
        retention_cohorts,
    )

    return retention_cohorts(sf_dir, combine_limit=0)


def _q_retention_cohorts(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import retention_cohorts

    return retention_cohorts(sf_dir)


def _q_q8_market_share(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import q8_market_share

    return q8_market_share(sf_dir)


def _q_q13_distribution(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q13_customer_distribution,
    )

    return q13_customer_distribution(sf_dir)


def _q_q15_top_supplier(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import q15_top_supplier

    return q15_top_supplier(sf_dir)


def _q_q17_small_qty(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q17_small_quantity_revenue,
    )

    return q17_small_quantity_revenue(sf_dir)


def _q_q19_disjunct(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q19_disjunctive_revenue,
    )

    return q19_disjunctive_revenue(sf_dir)


def _q_q21_waiting(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import q21_waiting_suppliers

    return q21_waiting_suppliers(sf_dir)


def _q_q22_dormant(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import q22_dormant_customers

    return q22_dormant_customers(sf_dir)


def _q_event_type_warmup(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import event_type_warmup

    return event_type_warmup(sf_dir)


def _q_events_dod_growth(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import events_dod_growth

    return events_dod_growth(sf_dir)


def _q_events_cube(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import events_cube

    return events_cube(sf_dir)


def _q_edit_distance_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.fuzzy import edit_distance_pairs

    return edit_distance_pairs(sf_dir)


def _q_jaro_winkler_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.fuzzy import jaro_winkler_pairs

    return jaro_winkler_pairs(sf_dir)


def _q_jaro_winkler_pairs_grouped(sf_dir: str):
    """Forced any-cardinality tier: per-prefix-block groupby exchange."""
    from high_performance_docling_ray.pipelines.fuzzy import jaro_winkler_pairs

    return jaro_winkler_pairs(sf_dir, driver_budget=0)


def _q_exact_quantiles_cont(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        exact_quantiles_cont,
    )

    return exact_quantiles_cont(sf_dir)


def _q_hll_user_overlap(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        hll_user_overlap,
    )

    return hll_user_overlap(sf_dir)


def _q_bfs_distances(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import bfs_distances

    return bfs_distances(sf_dir)


def _q_events_value_ranks(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import events_value_ranks

    return events_value_ranks(sf_dir)


def _q_event_transitions(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import event_transitions

    return event_transitions(sf_dir)


def _q_trimmed_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import trimmed_stats

    return trimmed_stats(sf_dir)


def _q_fuzzy_components(sf_dir: str):
    from high_performance_docling_ray.pipelines.components import fuzzy_components

    return fuzzy_components(sf_dir)


def _q_user_event_paths(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import user_event_paths

    return user_event_paths(sf_dir)


def _q_price_qty_correlation(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import (
        price_qty_correlation,
    )

    return price_qty_correlation(sf_dir)


def _q_events_trend(sf_dir: str):
    from high_performance_docling_ray.pipelines.analytics import events_trend

    return events_trend(sf_dir)


def _q_mad_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import mad_stats

    return mad_stats(sf_dir)


def _q_selfjoin_size_estimate(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        selfjoin_size_estimate,
    )

    return selfjoin_size_estimate(sf_dir)


def _q_gini_coefficient(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        gini_coefficient,
    )

    return gini_coefficient(sf_dir)


def _q_lang_median_mad(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        lang_median_mad,
    )

    return lang_median_mad(sf_dir)


def _q_top_order_values_with_ties(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        top_order_values_with_ties,
    )

    return top_order_values_with_ties(sf_dir)


def _q_weighted_median_qty(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        weighted_median_qty,
    )

    return weighted_median_qty(sf_dir)


def _q_q2_min_cost(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q2_min_cost_supplier,
    )

    return q2_min_cost_supplier(sf_dir)


def _q_q9_profit(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import q9_nation_profit

    return q9_nation_profit(sf_dir)


def _q_q11_stock(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q11_important_stock,
    )

    return q11_important_stock(sf_dir)


def _q_q16_counts(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q16_supplier_part_counts,
    )

    return q16_supplier_part_counts(sf_dir)


def _q_q20_promo(sf_dir: str):
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q20_promotion_suppliers,
    )

    return q20_promotion_suppliers(sf_dir)


def _q_knn_graph(sf_dir: str):
    from high_performance_docling_ray.pipelines.similarity import knn_graph

    return knn_graph(sf_dir)


def _q_knn_graph_sharded(sf_dir: str):
    from high_performance_docling_ray.pipelines.similarity import knn_graph

    return knn_graph(sf_dir, broadcast_budget=0)


def _q_hard_negatives(sf_dir: str):
    from high_performance_docling_ray.pipelines.similarity import (
        hard_negatives,
    )

    return hard_negatives(sf_dir)


def _q_hard_negatives_sharded(sf_dir: str):
    """Forced out-of-core tier: labeled shard-store streaming merge."""
    from high_performance_docling_ray.pipelines.similarity import (
        hard_negatives,
    )

    return hard_negatives(sf_dir, broadcast_budget=0)


def _q_events_gap_fill(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        events_gap_fill,
    )

    return events_gap_fill(sf_dir)


def _q_pmi_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        pmi_pairs,
    )

    return pmi_pairs(sf_dir)


def _q_embedding_outliers(sf_dir: str):
    from high_performance_docling_ray.pipelines.decomposition import (
        embedding_outliers,
    )

    return embedding_outliers(sf_dir)


def _q_lang_histogram_quantiles(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        lang_histogram_quantiles,
    )

    return lang_histogram_quantiles(sf_dir)


def _q_image_phash_dedup(sf_dir: str):
    from high_performance_docling_ray.stages.multimodal import (
        image_phash_dedup,
    )

    n = {"0.001": 100, "0.01": 256, "0.1": 1024}.get(
        sf_dir.rstrip("/").rsplit("sf", 1)[-1], 256
    )
    return image_phash_dedup(n)


def _q_partition_skew_report(sf_dir: str):
    from high_performance_docling_ray.pipelines.profiling import (
        partition_skew_report,
    )

    return partition_skew_report(sf_dir)


def _q_late_event_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        late_event_stats,
    )

    return late_event_stats(sf_dir)


def _q_q18_big_orders(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import (
        q18_big_orders,
    )

    return q18_big_orders(sf_dir)


def _q_triangle_count(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import triangle_count

    return triangle_count(sf_dir)


def _q_triangle_count_cogroup(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import triangle_count

    return triangle_count(sf_dir, adj_broadcast_budget=0)


def _q_degree_assortativity(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import (
        degree_assortativity,
    )

    return degree_assortativity(sf_dir)


def _q_clustering_coefficient(sf_dir: str):
    from high_performance_docling_ray.pipelines.graph import (
        clustering_coefficient,
    )

    return clustering_coefficient(sf_dir)


def _q_clustering_coefficient_cogroup(sf_dir: str):
    """Forced any-cardinality tier: apex-carrying wedge closure +
    groupby(node).sum — no adjacency broadcast."""
    from high_performance_docling_ray.pipelines.graph import (
        clustering_coefficient,
    )

    return clustering_coefficient(sf_dir, adj_broadcast_budget=0)


def _q_zorder_layout(sf_dir: str):
    from high_performance_docling_ray.pipelines.profiling import (
        zorder_layout,
    )

    return zorder_layout(sf_dir)


def _q_zorder_layout_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby(zpart).aggregate."""
    from high_performance_docling_ray.pipelines.profiling import (
        zorder_layout,
    )

    return zorder_layout(sf_dir, combine_limit=0)


def _q_dataset_fingerprint(sf_dir: str):
    from high_performance_docling_ray.pipelines.profiling import (
        dataset_fingerprint,
    )

    return dataset_fingerprint(sf_dir)


def _q_paragraph_langs(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        paragraph_langs,
    )

    return paragraph_langs(sf_dir)


def _q_histogram_quantiles(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        histogram_quantiles,
    )

    return histogram_quantiles(sf_dir)


def _q_compact_store(sf_dir: str):
    from high_performance_docling_ray.pipelines.compaction import (
        compacted_extract,
    )

    return compacted_extract(sf_dir)


def _q_bitext_mine(sf_dir: str):
    from high_performance_docling_ray.pipelines.bitext import bitext_mine

    return bitext_mine(sf_dir)


def _q_bitext_mine_sharded(sf_dir: str):
    """Over-budget tier: both sides persisted as normalized shard
    stores; blocked out-of-core matmuls, stats attach via cogroup —
    nothing pinned on the driver."""
    from high_performance_docling_ray.pipelines.bitext import bitext_mine

    return bitext_mine(sf_dir, broadcast_budget=0)


def _q_tag_attributes(sf_dir: str):
    """The tagger pass read back from the persisted sidecar store."""
    from high_performance_docling_ray.pipelines.attributes import (
        tag_attributes,
    )

    return tag_attributes(sf_dir)


def _q_mix_attributes(sf_dir: str):
    """The mixer: documents joined to the sidecar by one key-only
    cogroup; policy verdict with too_short > low_quality >
    lang_mismatch precedence."""
    from high_performance_docling_ray.pipelines.attributes import (
        mix_attributes,
    )

    return mix_attributes(sf_dir)


def _q_script_mix(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        script_mix,
    )

    return script_mix(sf_dir)


def _q_column_profile(sf_dir: str):
    """Exact per-column profile of the documents table: null counts,
    distinct counts via bucketed key-only hash rows, native-typed
    min/max stringified, mean rendered length."""
    from high_performance_docling_ray.pipelines.profiling import (
        column_profile,
    )

    return column_profile(sf_dir)


def _q_embedding_covariance(sf_dir: str):
    from high_performance_docling_ray.pipelines.decomposition import (
        embedding_covariance,
    )

    return embedding_covariance(sf_dir)


def _q_pca_project(sf_dir: str):
    """PCA projection gate (VERDICT r4 #7): eigendecomposition is not
    SQL-expressible, so instead of the raw projections (rows-only
    forever) return a driver-visible row: ``n_vecs`` is genuinely
    computed on both sides (every embedding must be projected —
    engine row count vs SQL count(*)), ``orthonormal_ok`` pins
    W^T W == I (1e-9), ``variance_desc_ok`` pins non-increasing
    per-component eigenvalues. The full numeric pinning (serial numpy
    equality, variance == eigenvalues, determinism) lives in
    test_decomposition.py; the covariance INPUT is the hash-verified
    embedding_covariance query."""
    import numpy as _np
    import pyarrow as _pa

    from high_performance_docling_ray.pipelines.decomposition import (
        pca_basis,
        pca_project,
    )

    import ray

    k = 8
    proj = pca_project(sf_dir, k=k)
    parts = [t for t in ray.get(proj.to_arrow_refs()) if t.num_rows]
    n_vecs = sum(t.num_rows for t in parts)
    _mean, basis, eigvals = pca_basis(sf_dir, k=k)
    gram = basis.T @ basis
    ortho = bool(
        _np.allclose(gram, _np.eye(k), atol=1e-9, rtol=0.0)
    )
    var_desc = bool((_np.diff(_np.asarray(eigvals, _np.float64)) <= 1e-12).all())
    return _pa.Table.from_pydict(
        {
            "n_vecs": _pa.array([n_vecs], _pa.int64()),
            "k": _pa.array([k], _pa.int64()),
            "orthonormal_ok": _pa.array([ortho], _pa.bool_()),
            "variance_desc_ok": _pa.array([var_desc], _pa.bool_()),
        }
    )


def _q_pq_codes(sf_dir: str):
    from high_performance_docling_ray.pipelines.clustering import pq_codes

    return pq_codes(sf_dir)


def _q_knn_pq_adc(sf_dir: str):
    from high_performance_docling_ray.pipelines.clustering import knn_pq_adc

    return knn_pq_adc(sf_dir)


def _q_random_projection(sf_dir: str):
    from high_performance_docling_ray.pipelines.decomposition import (
        random_projection,
    )

    return random_projection(sf_dir)


def _q_weighted_sample(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        weighted_sample,
    )

    return weighted_sample(sf_dir)


def _q_extract_links(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import extract_links

    return extract_links(sf_dir)


def _q_link_domain_graph(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import link_domain_graph

    return link_domain_graph(sf_dir)


def _q_cocitation_pairs(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import cocitation_pairs

    return cocitation_pairs(sf_dir)


def _q_cocitation_pairs_grouped(sf_dir: str):
    """Forced any-cardinality tier: Ray groupby(pair).sum exchange."""
    from high_performance_docling_ray.pipelines.links import cocitation_pairs

    return cocitation_pairs(sf_dir, combine_limit=0)


def _q_domain_pagerank(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import domain_pagerank

    return domain_pagerank(sf_dir)


def _q_domain_hits(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import domain_hits

    return domain_hits(sf_dir)


def _q_anchor_text_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import anchor_text_stats

    return anchor_text_stats(sf_dir)


def _q_crawl_frontier(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import crawl_frontier

    return crawl_frontier(sf_dir)


def _q_frontier_prioritized(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import (
        frontier_prioritized,
    )

    return frontier_prioritized(sf_dir)


def _q_cdx_index(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import cdx_index

    return cdx_index(sf_dir)


def _q_robots_filter(sf_dir: str):
    from high_performance_docling_ray.pipelines.links import robots_filter

    return robots_filter(sf_dir)


def _q_quality_threshold_filter(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        quality_threshold_filter,
    )

    return quality_threshold_filter(sf_dir)


def _q_parse_warc(sf_dir: str):
    from high_performance_docling_ray.pipelines.warc import parse_warc

    return parse_warc(sf_dir)


def _q_page_metadata(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import page_metadata

    return page_metadata(sf_dir)


def _q_html_outline(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import html_outline

    return html_outline(sf_dir)


def _q_sitemap_urls(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import sitemap_urls

    return sitemap_urls(sf_dir)


def _q_html_tables(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import html_tables

    return html_tables(sf_dir)


def _q_incremental_decontaminate(sf_dir: str):
    from high_performance_docling_ray.pipelines.incremental import (
        incremental_decontaminate,
    )

    return incremental_decontaminate(sf_dir)


def _q_html_structure_groups(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import (
        html_structure_groups,
    )

    return html_structure_groups(sf_dir)


def _q_index_export(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import index_export

    return index_export(sf_dir)


def _q_cdc_dedup_stats(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        cdc_dedup_stats,
    )

    return cdc_dedup_stats(sf_dir)


def _q_cdc_chunks(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        cdc_chunks,
    )

    return cdc_chunks(sf_dir)


def _q_incremental_extract(sf_dir: str):
    from high_performance_docling_ray.pipelines.incremental import (
        incremental_extract,
    )

    return incremental_extract(sf_dir)


def _q_sitemap_frontier(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import (
        sitemap_frontier,
    )

    return sitemap_frontier(sf_dir)


def _q_parse_wet(sf_dir: str):
    from high_performance_docling_ray.pipelines.warc import parse_wet

    return parse_wet(sf_dir)


def _q_paragraph_dedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        paragraph_dedup,
    )

    return paragraph_dedup(sf_dir)


def _q_host_line_dedup(sf_dir: str):
    from high_performance_docling_ray.pipelines.web_curation import (
        line_dedup,
    )

    return line_dedup(sf_dir, scope="host")


def _q_canonical_collapse(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import (
        canonical_collapse,
    )

    return canonical_collapse(sf_dir)


def _q_capture_change_rate(sf_dir: str):
    from high_performance_docling_ray.pipelines.page_meta import (
        capture_change_rate,
    )

    return capture_change_rate(sf_dir)


def _q_fix_mojibake(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        fix_mojibake,
    )

    return fix_mojibake(sf_dir)


def _q_normalize_text(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        normalize_text,
    )

    return normalize_text(sf_dir)


def _q_corpus_report(sf_dir: str):
    from high_performance_docling_ray.pipelines.text_analysis import (
        corpus_report,
    )

    return corpus_report(sf_dir)


def _minhash_perm_values() -> str:
    """The MinHasher(seed=7) permutation constants as SQL literals."""
    import numpy as np

    rng = np.random.RandomState(7)
    half = rng.randint(0, 1 << 62, size=64).astype(np.uint64)
    a = [int(x) for x in half * np.uint64(2) + np.uint64(1)]
    b = [int(x) for x in rng.randint(0, 1 << 62, size=64).astype(np.uint64)]
    return ", ".join(
        f"({p}, {a[p]}::HUGEINT, {b[p]}::HUGEINT)" for p in range(64)
    )


# Shared CTE: word-3-gram shingle sets + 64-bit shingle hashes.
# md5_number_upper == first 8 md5 bytes little-endian == kernels'
# _hash64, so SQL rebuilds the exact MinHash/SimHash signatures.
_SHINGLE_CTE = r"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    END AS sh
  FROM toks
),
hv AS (
  SELECT doc_id, md5_number_upper(s) AS h
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
)
"""

_STOP_EN = "'the','a','of','and','to','in','is','it','you','that','he','was','for','on','are'"

# the composite cleaner's plantings (lm_filters._plant_clean), shared
# by the clean_corpus and curate_and_pack oracles
_CLEAN_PLANTED_SQL = """
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 50 = 0 THEN
                     text || ' leak sequence ' ||
                     CAST((doc_id // 50) % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   WHEN doc_id % 41 IN (7, 8) THEN
                     'dup block content ' || CAST(doc_id // 41 AS VARCHAR) ||
                     ' lorem ipsum dolor sit amet consectetur adipiscing' ||
                     ' elit sed do eiusmod tempor'
                   WHEN doc_id % 37 = 11 THEN
                     trim(repeat('click here buy now ' ||
                                 CAST(doc_id AS VARCHAR) || ' ', 10))
                   WHEN doc_id % 7 = 3 THEN
                     text || ' leak sequence ' ||
                     CAST(doc_id % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   ELSE text END AS text
          FROM documents
"""


def oracle_sql() -> dict[str, str]:
    oracles = {
        # byte-level oracle for the flagship HTML extraction: the
        # deterministic page wrap makes extracted_text a closed form
        # of the document text (see sources/pages.py:pages_from_documents)
        "extract_docs_text": r"""
            SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
                   'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                   COALESCE(
                       list_aggregate(
                           list_filter(
                               list_transform(
                                   str_split(text, '. '),
                                   s -> trim(regexp_replace(s, '\s+', ' ', 'g'))
                               ),
                               s -> s <> ''
                           ),
                           'string_agg', chr(10)
                       ), ''
                   ) AS extracted_text
            FROM documents
        """,
        # PDF/layout path oracle: the closed-form %SYNTHPDF wrap
        # (sources/pages.py:pdf_pages_from_documents) chunks the text
        # into 12-word lines, one text block per line, 2 blocks per
        # page; the reading-order cross-page continuation merge
        # (kernels/reading_order.py:map_merges) joins each page's last
        # line with the next page's first when the break is
        # mid-sentence, reproduced here pair by pair
        # list-marker normalization (M24): single-page wrap; the three
        # planted list items lose their markers in extracted_text and
        # render normalized in markdown ("- " bullet, detected marker
        # for enumerated items)
        "extract_list_markers": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)),
                         i -> array_to_string(toks[i*12+1 : (i+1)*12], ' ')) AS lines,
                     CAST(ceil(len(toks) / 12.0) AS INT) AS nl
              FROM t
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR)
                       AS url,
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE chr(10) || array_to_string(lines, chr(10)) END
                   || chr(10) || 'alpha point ' || CAST(doc_id AS VARCHAR)
                   || chr(10) || 'beta point ' || CAST(doc_id AS VARCHAR)
                   || chr(10) || 'gamma point ' || CAST(doc_id AS VARCHAR)
                       AS extracted_text,
                   '## Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE repeat(chr(10), 2)
                             || array_to_string(lines, repeat(chr(10), 2)) END
                   || repeat(chr(10), 2) || '- alpha point '
                   || CAST(doc_id AS VARCHAR)
                   || repeat(chr(10), 2) || CAST(doc_id % 9 + 1 AS VARCHAR)
                   || '. beta point ' || CAST(doc_id AS VARCHAR)
                   || repeat(chr(10), 2) || '('
                   || chr(CAST(97 + doc_id % 26 AS INTEGER))
                   || ') gamma point ' || CAST(doc_id AS VARCHAR)
                       AS markdown
            FROM l
        """,
        # ConfidenceReport: per page, cells are header + title(p0) +
        # up to 2 content lines + footer (indices restart per page);
        # from_ocr marks (doc_id+i)%3==0 with conf 0.55+((doc_id+i)%45)/100.
        # layout = 0.9 (every final cluster), ocr = avg marked conf;
        # page mean = nanmean([ocr, layout]), page low = 5% linear
        # quantile = lo + 0.05*(hi-lo); doc scores = mean over pages
        # (base_models.py:441-459), grades bucketed on the 6dp-rounded
        # score exactly like the Ray side.
        "extract_confidence": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(ceil(len(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '')) / 12.0) AS INT) AS nl
              FROM documents
            ),
            p AS (
              SELECT doc_id, nl,
                     greatest(1, CAST(ceil(nl / 2.0) AS INT)) AS n_pages
              FROM t
            ),
            s AS (
              SELECT doc_id, n_pages,
                list_transform(range(0, CAST(n_pages AS BIGINT)), pg ->
                  list_aggregate(
                    list_transform(
                      list_filter(
                        range(0, 2 + CASE WHEN pg = 0 THEN 1 ELSE 0 END
                                 + CASE WHEN nl = 0 THEN 0
                                        ELSE least(2, nl - 2 * pg) END),
                        i -> (doc_id + i) % 3 = 0),
                      i -> 0.55 + ((doc_id + i) % 45) / 100.0),
                    'avg')
                ) AS ocr_l
              FROM p
            ),
            g AS (
              SELECT doc_id, n_pages,
                round(list_aggregate(
                    list_transform(ocr_l, o -> (o + 0.9) / 2.0), 'avg'), 6)
                    AS mean_score,
                round(list_aggregate(
                    list_transform(ocr_l, o ->
                      least(o, 0.9)
                      + (greatest(o, 0.9) - least(o, 0.9)) * 0.05),
                    'avg'), 6) AS low_score
              FROM s
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR)
                       AS url,
                   n_pages,
                   mean_score,
                   low_score,
                   CASE WHEN mean_score IS NULL THEN 'unspecified'
                        WHEN mean_score < 0.5 THEN 'poor'
                        WHEN mean_score < 0.8 THEN 'fair'
                        WHEN mean_score < 0.9 THEN 'good'
                        ELSE 'excellent' END AS mean_grade,
                   CASE WHEN low_score IS NULL THEN 'unspecified'
                        WHEN low_score < 0.5 THEN 'poor'
                        WHEN low_score < 0.8 THEN 'fair'
                        WHEN low_score < 0.9 THEN 'good'
                        ELSE 'excellent' END AS low_grade
            FROM g
        """,
        "extract_pdf_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)),
                         i -> array_to_string(toks[i*12+1 : (i+1)*12], ' ')) AS lines,
                     CAST(ceil(len(toks) / 12.0) AS INT) AS nl
              FROM t
            ),
            m AS (
              SELECT doc_id, lines, nl,
                CASE WHEN nl <= 1 THEN lines
                ELSE [lines[1]]
                     || flatten(list_transform(range(1, 1 + (nl - 1) // 2), k ->
                          CASE WHEN NOT (substr(lines[2*k], length(lines[2*k]), 1)
                                         IN ('.', '!', '?', ':', ';', '”', '"', ''''))
                                    AND (substr(lines[2*k+1], 1, 1) BETWEEN 'a' AND 'z'
                                         OR substr(lines[2*k], length(lines[2*k]), 1) = ',')
                               THEN [lines[2*k] || ' ' || lines[2*k+1]]
                               ELSE [lines[2*k], lines[2*k+1]] END))
                     || CASE WHEN nl >= 2 AND nl % 2 = 0 THEN [lines[nl]]
                             ELSE CAST([] AS VARCHAR[]) END
                END AS parts
              FROM l
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
                   'pdf' AS doc_kind,
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE chr(10) || array_to_string(parts, chr(10))
                   END AS extracted_text,
                   CAST(greatest(1, CAST(ceil(nl / 2.0) AS INT)) AS INT)
                       AS n_pages,
                   0 AS n_tables
            FROM m
        """,
        # OCR apply path: single-page wrap (blocks_per_page huge -> no
        # cross-page merges) + planted empty region at a fixed bbox;
        # the stub recognizer is md5 of "page:cluster_id:bbox" with
        # cluster_id = nl + 2 (header 0, title 1, lines 2..nl+1)
        "extract_pdf_ocr": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)),
                         i -> array_to_string(toks[i*12+1 : (i+1)*12], ' ')) AS lines,
                     CAST(ceil(len(toks) / 12.0) AS INT) AS nl
              FROM t
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE chr(10) || array_to_string(lines, chr(10)) END
                   || chr(10) || '[ocr ' ||
                   substr(md5(printf('0:%d:420.0,60.0,560.0,90.0', nl + 2)), 1, 8)
                   || ']' AS extracted_text
            FROM l
        """,
        # table-structure path: the planted 2x2 table's cells match its
        # four word tokens one-to-one, so the grid renders as
        # w1 TAB w2 NL w3 TAB w4 appended after the body lines
        "extract_pdf_tables": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            l AS (
              SELECT doc_id, toks,
                     list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)),
                         i -> array_to_string(toks[i*12+1 : (i+1)*12], ' ')) AS lines,
                     CAST(ceil(len(toks) / 12.0) AS INT) AS nl
              FROM t
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE chr(10) || array_to_string(lines, chr(10)) END ||
                   CASE WHEN len(toks) >= 4
                        THEN chr(10) || toks[1] || chr(9) || toks[2]
                             || chr(10) || toks[3] || chr(9) || toks[4]
                        ELSE '' END AS extracted_text,
                   CASE WHEN len(toks) >= 4 THEN 1 ELSE 0 END AS n_tables
            FROM l
        """,
        # enrichment path: code text passes through with its language
        # tag split off; formula text gains the stub's \mathrm head
        "extract_pdf_enriched": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     list_transform(range(0, CAST(ceil(len(toks) / 12.0) AS INT)),
                         i -> array_to_string(toks[i*12+1 : (i+1)*12], ' ')) AS lines,
                     CAST(ceil(len(toks) / 12.0) AS INT) AS nl
              FROM t
            )
            SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   CASE WHEN nl = 0 THEN ''
                        ELSE chr(10) || array_to_string(lines, chr(10)) END ||
                   chr(10) || 'def f' || doc_id || '(): return ' || doc_id ||
                   chr(10) || '\mathrm{' ||
                   substr(md5('x' || doc_id || ' = y + ' || doc_id), 1, 8)
                   || '} x' || doc_id || ' = y + ' || doc_id
                   AS extracted_text
            FROM l
        """,
        # extract_pages = extract_docs_text plus closed-form structure
        # columns: the deterministic wrap yields one h1 element + one
        # text element per non-empty normalized sentence, no tables
        "extract_pages": r"""
            SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
                   'html' AS doc_kind,
                   'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                   COALESCE(
                       list_aggregate(
                           list_filter(
                               list_transform(
                                   str_split(text, '. '),
                                   s -> trim(regexp_replace(s, '\s+', ' ', 'g'))
                               ),
                               s -> s <> ''
                           ),
                           'string_agg', chr(10)
                       ), ''
                   ) AS extracted_text,
                   1 + len(list_filter(
                           list_transform(
                               str_split(text, '. '),
                               s -> trim(regexp_replace(s, '\s+', ' ', 'g'))
                           ),
                           s -> s <> ''
                       )) AS n_elements,
                   0 AS n_tables
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id) AS min_doc_id
            FROM documents GROUP BY md5(text) ORDER BY text_hash
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                       AS n_bpe_tokens
            FROM documents
        """,
        "fingerprint_md5": """
            SELECT doc_id, md5(text) AS md5 FROM documents
        """,
        # rolling polynomial fingerprint (kernels/text_stats.py:104):
        # base-257 hash mod 2^61, min over 16-byte windows. The corpus
        # is pure ASCII (checked in tests), so ord(char) == utf-8 byte.
        "fingerprint_rolling": f"""
            WITH RECURSIVE r AS (
              SELECT doc_id, text, length(text) AS n, 0 AS i,
                     CAST(0 AS HUGEINT) AS h, CAST(NULL AS HUGEINT) AS best
              FROM documents
              UNION ALL
              SELECT doc_id, text, n, i + 1,
                CASE WHEN i < 16
                     THEN (h * 257 + ord(substr(text, i + 1, 1))) % {1 << 61}
                     ELSE ((((h - ord(substr(text, i - 15, 1))
                              * {pow(257, 15, 1 << 61)}::HUGEINT) % {1 << 61})
                            + {1 << 61}) % {1 << 61}
                           * 257 + ord(substr(text, i + 1, 1))) % {1 << 61}
                END AS h2,
                CASE WHEN i + 1 = 16 THEN
                       CASE WHEN i < 16
                            THEN (h * 257 + ord(substr(text, i + 1, 1))) % {1 << 61}
                            ELSE NULL END
                     WHEN i + 1 > 16 THEN least(best,
                       ((((h - ord(substr(text, i - 15, 1))
                           * {pow(257, 15, 1 << 61)}::HUGEINT) % {1 << 61})
                         + {1 << 61}) % {1 << 61}
                        * 257 + ord(substr(text, i + 1, 1))) % {1 << 61})
                     ELSE NULL END AS best2
              FROM r WHERE i < n
            )
            SELECT doc_id,
                   CAST(CASE WHEN n < 16 THEN h ELSE best END AS UBIGINT)
                       AS rolling
            FROM r WHERE i = n
        """,
        # stopword-overlap language ID (kernels/text_stats.py:84):
        # distinct lowercased words, argmax stopword hits with
        # first-in-sorted-lang-order tiebreak, 'und' on zero hits
        "language_id": f"""
            WITH w AS (
              SELECT doc_id, lang,
                     list_distinct(list_filter(
                         regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> ''
                     )) AS words
              FROM documents
            ),
            h AS (
              SELECT doc_id, lang, len(words) AS nw,
                len(list_filter(words, x -> x IN ('der','die','das','und','ist','ich','nicht','sie','mit','ein','zu','den','von'))) AS hde,
                len(list_filter(words, x -> x IN ({_STOP_EN}))) AS hen,
                len(list_filter(words, x -> x IN ('el','la','los','las','de','y','un','una','es','en','no','que','por','para'))) AS hes,
                len(list_filter(words, x -> x IN ('le','la','les','de','et','un','une','est','je','pas','pour','que','dans'))) AS hfr,
                len(list_filter(words, x -> x IN ('il','lo','la','gli','le','di','e','un','una','è','che','non','per','con'))) AS hit
              FROM w
            )
            SELECT doc_id, lang,
              CASE WHEN nw = 0 OR greatest(hde,hen,hes,hfr,hit) = 0 THEN 'und'
                   WHEN hde >= hen AND hde >= hes AND hde >= hfr AND hde >= hit THEN 'de'
                   WHEN hen >= hes AND hen >= hfr AND hen >= hit THEN 'en'
                   WHEN hes >= hfr AND hes >= hit THEN 'es'
                   WHEN hfr >= hit THEN 'fr'
                   ELSE 'it' END AS detected_lang,
              (detected_lang = lang) AS agrees
            FROM h
        """,
        # quality features mirror kernels/text_stats.py:48-81 term by
        # term (same regexes, same float op order)
        "quality_scores": f"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS toks,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> x <> '') AS ltoks,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
              FROM documents
            ),
            f AS (
              SELECT doc_id, n_chars, len(toks) AS n_tokens,
                CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                               AS DOUBLE) / len(toks)
                END AS mwl,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE CAST(n_punct AS DOUBLE) / n_chars END AS pr,
                CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE CAST(len(list_filter(ltoks, x -> x IN ({_STOP_EN})))
                               AS DOUBLE) / len(toks)
                END AS sr
              FROM t
            )
            SELECT doc_id, n_chars, n_tokens,
              round(mwl, 6) AS mean_word_len,
              round(pr, 6) AS punct_ratio,
              round(sr, 6) AS stopword_ratio,
              round(0.4 * least(1.0, n_tokens / 50.0)
                    + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0
                                  THEN 1.0 ELSE 0.5 END)
                    + 0.2 * least(1.0, sr * 5.0)
                    + 0.2 * (1.0 - least(1.0, greatest(0.0, pr - 0.2) * 2.0)),
                    6) AS quality
            FROM f
        """,
        # exact word-3-gram Jaccard pairs over non-empty shingle sets;
        # the length prefilter (min >= t*max) is implied by J >= t so
        # it only speeds up the cross join
        "ngram_jaccard_pairs": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                END AS sh
              FROM toks
            ),
            ne AS (SELECT doc_id, sh, len(sh) AS L FROM sh WHERE len(sh) > 0)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (a.L + b.L - len(list_intersect(a.sh, b.sh)))
                       AS jaccard
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE CAST(least(a.L, b.L) AS DOUBLE) >= 0.5 * greatest(a.L, b.L)
              AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / (a.L + b.L - len(list_intersect(a.sh, b.sh))) >= 0.5
        """,
        # MinHash LSH pairs: SQL rebuilds the exact 64-perm signatures
        # (kernels/dedup.py MinHasher, seed 7) and the 16-band
        # candidate rule (band equality == the 4 signature slots equal)
        "minhash_lsh_pairs": f"""
            WITH perms(p, a, b) AS (VALUES {_minhash_perm_values()}),
            {_SHINGLE_CTE},
            sig AS (
              SELECT hv.doc_id, perms.p,
                     CAST(min((perms.a * hv.h::HUGEINT + perms.b)
                          % 18446744073709551616::HUGEINT) AS UBIGINT) AS v
              FROM hv CROSS JOIN perms GROUP BY hv.doc_id, perms.p
            ),
            sigg AS (SELECT doc_id, list(v ORDER BY p) AS sig FROM sig GROUP BY doc_id),
            sigl AS (
              SELECT s.doc_id,
                     coalesce(g.sig, list_transform(range(1, 65),
                         x -> 18446744073709551615::UBIGINT)) AS sig
              FROM sh s LEFT JOIN sigg g ON s.doc_id = g.doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i]))
                   AS DOUBLE) / 64 AS est_jaccard
            FROM sigl a JOIN sigl b ON a.doc_id < b.doc_id
            WHERE len(list_filter(range(0, 16),
                  bnd -> a.sig[4*bnd+1] = b.sig[4*bnd+1]
                     AND a.sig[4*bnd+2] = b.sig[4*bnd+2]
                     AND a.sig[4*bnd+3] = b.sig[4*bnd+3]
                     AND a.sig[4*bnd+4] = b.sig[4*bnd+4])) > 0
              AND len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i]))
                  >= 0.7 * 64
        """,
        # SimHash pairs: 64-bit majority-vote hash per doc, candidates
        # share one of four 16-bit segments, Hamming <= 3
        "simhash_pairs": f"""
            WITH {_SHINGLE_CTE},
            bits AS (
              SELECT doc_id, t.b,
                     sum(CASE WHEN (h >> CAST(t.b AS UBIGINT)) & 1 = 1
                              THEN 1 ELSE 0 END) AS cnt,
                     count(*) AS ns
              FROM hv CROSS JOIN range(64) t(b) GROUP BY doc_id, t.b
            ),
            h64g AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN 2 * cnt > ns
                                   THEN (1::HUGEINT << CAST(b AS INTEGER))
                                   ELSE 0::HUGEINT END) AS UBIGINT) AS h
              FROM bits GROUP BY doc_id
            ),
            h64 AS (
              SELECT s.doc_id, coalesce(g.h, 0::UBIGINT) AS h
              FROM sh s LEFT JOIN h64g g ON s.doc_id = g.doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
            FROM h64 a JOIN h64 b ON a.doc_id < b.doc_id
            WHERE ((xor(a.h, b.h) & 65535) = 0
                OR ((xor(a.h, b.h) >> 16) & 65535) = 0
                OR ((xor(a.h, b.h) >> 32) & 65535) = 0
                OR ((xor(a.h, b.h) >> 48) & 65535) = 0)
              AND bit_count(xor(a.h, b.h)) <= 3
        """,
        # HyperLogLog p=12 replicated exactly: same md5-derived 64-bit
        # hash, register index = top 12 bits, rank via hex bit-length,
        # exact HUGEINT numerator for the 2^-reg sum (kernels/sketch.py)
        "hll_distinct_users": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
              FROM events
            ),
            rk AS (
              SELECT event_type, CAST(hv >> 52 AS INTEGER) AS idx,
                     to_hex(CAST((hv % 4503599627370496::HUGEINT) * 4096 + 4095
                                 AS UBIGINT)) AS hx
              FROM h
            ),
            rk2 AS (
              SELECT event_type, idx,
                     65 - (4 * (length(hx) - 1) +
                           CASE substr(hx, 1, 1)
                                WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
                                WHEN '4' THEN 3 WHEN '5' THEN 3 WHEN '6' THEN 3
                                WHEN '7' THEN 3 ELSE 4 END) AS rank
              FROM rk
            ),
            regs AS (SELECT event_type, idx, max(rank) AS reg FROM rk2 GROUP BY 1, 2),
            agg AS (
              SELECT event_type, count(*) AS npresent,
                     sum(1::HUGEINT << (53 - reg)) AS present_num
              FROM regs GROUP BY 1
            ),
            est AS (
              SELECT event_type,
                     4096 - npresent AS zeros,
                     (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                         (CAST(present_num + (4096 - npresent) * (1::HUGEINT << 53)
                               AS DOUBLE) / 9007199254740992.0) AS raw
              FROM agg
            )
            SELECT event_type,
                   CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                                   THEN 4096 * ln(4096.0 / zeros)
                                   ELSE raw END) AS BIGINT)
                       AS approx_distinct_users
            FROM est ORDER BY event_type
        """,
        "doc_stats": r"""
            SELECT doc_id, length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "hash_sample": """
            SELECT doc_id, lang FROM documents
            WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000 < 100
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000 <
                  CASE lang WHEN 'en' THEN 200
                            WHEN 'de' THEN 1000 WHEN 'fr' THEN 1000
                            WHEN 'es' THEN 1000 WHEN 'it' THEN 1000
                            ELSE 500 END
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # exact near-dup pairs: plain cross join with the same float64
        # cosine; the pipeline's blocked matmul must reproduce it
        "embedding_neardup_pairs": """
            WITH n AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            )
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   list_cosine_similarity(a.e, b.e) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.4
        """,
        # the IVF-sharded tier is EXACT (lossless list-pair pruning),
        # so it answers to the identical cross-join oracle
        "embedding_neardup_ivf": """
            WITH n AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            )
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   list_cosine_similarity(a.e, b.e) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.4
        """,
        "knn_brute_cosine": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings e
            ORDER BY cosine DESC, e.vec_id ASC
            LIMIT 10
        """,
        # money sums use DECIMAL casts (the data is exact 2-decimal) so
        # the result is EXACT and order-independent — matches the Ray
        # side's int64-cents arithmetic bit-for-bit after CAST to DOUBLE.
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_disc_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) AS avg_qty,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l.l_orderkey,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l.l_orderkey
            ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(18,2))) DESC,
                     l.l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT r.r_name,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "topk_events_per_type": """
            SELECT event_type, event_id, value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (
                         PARTITION BY event_type
                         ORDER BY value DESC, event_id) AS rn
              FROM events) t
            WHERE rn <= 5
            ORDER BY event_type, value DESC, event_id
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "filter_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity >= 45.0
            ORDER BY l_orderkey, l_linenumber
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_value,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_sliding_window": """
            SELECT time_bucket(INTERVAL '15 minutes', e.ts)
                       - k.range * INTERVAL '15 minutes' AS window_start,
                   e.event_type,
                   CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_value,
                   count(*) AS n_events
            FROM events e CROSS JOIN range(4) k
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # 2-D skyline: strict dominance in both dims (equal-date or
        # equal-price rows never dominate each other)
        "pareto_orders": """
            SELECT a.o_orderkey, a.o_orderdate, a.o_totalprice
            FROM orders a
            WHERE NOT EXISTS (
              SELECT 1 FROM orders b
              WHERE b.o_totalprice > a.o_totalprice
                AND b.o_orderdate > a.o_orderdate)
            ORDER BY a.o_orderdate, a.o_orderkey
        """,
        # sorted-neighborhood blocking: dense global ranks over the
        # (16-char prefix, doc_id) lexicographic order, pairs within a
        # 3-row window of that order
        "sorted_neighborhood_pairs": """
            WITH r AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (
                       ORDER BY substr(coalesce(text, ''), 1, 16), doc_id
                     ) AS rn
              FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(b.rn - a.rn AS BIGINT) AS dist
            FROM r a JOIN r b
              ON b.rn > a.rn AND b.rn <= a.rn + 3
            ORDER BY 1, 3
        """,
        # Bloom-pushdown semi-join: the filter is internal (exact
        # verify removes false positives), so the oracle is the plain
        # semi-join aggregate; the exactonly entry shares it
        "bloom_semi_join": """
            SELECT l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY 1 ORDER BY 1
        """,
        # ROWS-frame window: op order mirrors the Ray kernel's
        # left-assoc (value + lag1) + lag2 add and the 1+flag+flag
        # count, so the hash matches bit-for-bit, not just at 6dp
        "events_moving_avg": """
            SELECT event_id,
                   (value
                    + COALESCE(LAG(value, 1) OVER w, 0)
                    + COALESCE(LAG(value, 2) OVER w, 0))
                   / (1 + CAST(LAG(value, 1) OVER w IS NOT NULL AS INT)
                        + CAST(LAG(value, 2) OVER w IS NOT NULL AS INT))
                       AS mov_avg,
                   CAST(1 + CAST(LAG(value, 1) OVER w IS NOT NULL AS INT)
                          + CAST(LAG(value, 2) OVER w IS NOT NULL AS INT)
                        AS BIGINT) AS n_window
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id
        """,
        # global NTILE folded to per-tile aggregates; the exact-cents
        # DECIMAL sum mirrors the Ray side's int64 fixed-point partials
        "ntile_orders": """
            WITH t AS (SELECT o_totalprice,
                              NTILE(10) OVER (ORDER BY o_totalprice,
                                              o_orderkey) AS tile
                       FROM orders)
            SELECT tile, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_price,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price
            FROM t GROUP BY tile ORDER BY tile
        """,
        "mode_event_type": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, event_type, n,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY n DESC, event_type)
                             AS rn
                  FROM c)
            SELECT user_id, event_type AS mode_event, n AS n_mode
            FROM r WHERE rn = 1 ORDER BY user_id
        """,
        "event_entropy": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT user_id, SUM(n) AS total FROM c GROUP BY 1)
            SELECT c.user_id, CAST(t.total AS BIGINT) AS n_events,
                   -SUM((c.n / t.total) * LN(c.n / t.total)) AS entropy
            FROM c JOIN t ON c.user_id = t.user_id
            GROUP BY c.user_id, t.total ORDER BY c.user_id
        """,
        # gaps-and-islands interval union; durations are pure-integer
        # (event_id % 3600 + 1 seconds) so covered_us is exact
        "interval_merge": """
            WITH iv AS (SELECT user_id, ts AS s,
                               ts + ((event_id % 3600 + 1)
                                     * INTERVAL 1 SECOND) AS e
                        FROM events),
            m AS (SELECT user_id, s, e,
                         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS max_prev
                  FROM iv),
            g AS (SELECT user_id, s, e,
                         SUM(CASE WHEN max_prev IS NULL OR s > max_prev
                                  THEN 1 ELSE 0 END)
                             OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
                  FROM m),
            isl AS (SELECT user_id, island, MIN(s) AS is_, MAX(e) AS ie
                    FROM g GROUP BY 1, 2)
            SELECT user_id, COUNT(*) AS n_intervals,
                   CAST(SUM(epoch_us(ie) - epoch_us(is_)) AS BIGINT)
                       AS covered_us
            FROM isl GROUP BY user_id ORDER BY user_id
        """,
        # exact sliding-window distinct via per-user coverage islands +
        # delta prefix scan; the oracle is the naive window join
        "rolling_distinct_users": """
            WITH eh AS (SELECT DISTINCT user_id,
                               date_trunc('hour', ts) AS h
                        FROM events),
            hours AS (SELECT DISTINCT h FROM eh)
            SELECT hours.h AS hour,
                   CAST(COUNT(DISTINCT eh.user_id) AS BIGINT) AS n_users
            FROM hours JOIN eh
              ON eh.h BETWEEN hours.h - INTERVAL 23 HOUR AND hours.h
            GROUP BY hours.h ORDER BY hour
        """,
        # asymmetric containment |A∩B| / min(|A|,|B|) — the
        # partial-duplicate detector; same shingle CTE as the Jaccard
        # oracle, NO length-ratio prefilter (subset pairs are the point)
        "ngram_containment_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_distinct(list_transform(
                            range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' '
                                 || toks[i+2]))
                END AS sh
              FROM toks
            ),
            ne AS (SELECT doc_id, sh, len(sh) AS L FROM sh
                   WHERE len(sh) > 0)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / least(a.L, b.L) AS containment
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / least(a.L, b.L) >= 0.4
        """,
        # NTILE over a derived per-user aggregate (contribution
        # deciles); DECIMAL totals order == the Ray side's int64 cents
        "user_value_deciles": """
            WITH u AS (SELECT user_id,
                              SUM(CAST(value AS DECIMAL(18,2))) AS total
                       FROM events GROUP BY 1),
            t AS (SELECT user_id, total,
                         NTILE(10) OVER (ORDER BY total, user_id) AS tile
                  FROM u)
            SELECT tile, COUNT(*) AS n_users,
                   CAST(SUM(total) AS DOUBLE) AS sum_total,
                   CAST(MIN(total) AS DOUBLE) AS min_total,
                   CAST(MAX(total) AS DOUBLE) AS max_total
            FROM t GROUP BY tile ORDER BY tile
        """,
        # exact Spearman with average-rank ties; RANK() + (tiecount-1)/2
        # IS the average rank, and the zero-variance CASE mirrors the
        # Ray side's NaN guard
        "spearman_user_metrics": """
            WITH u AS (SELECT user_id, COUNT(*) AS x,
                              SUM(CAST(value AS DECIMAL(18,2))) AS y
                       FROM events GROUP BY 1),
            r AS (SELECT
                    RANK() OVER (ORDER BY x)
                      + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS ra,
                    RANK() OVER (ORDER BY y)
                      + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS rb
                  FROM u)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CASE WHEN (COUNT(*) * SUM(ra * ra)
                              - SUM(ra) * SUM(ra)) > 0
                             AND (COUNT(*) * SUM(rb * rb)
                                  - SUM(rb) * SUM(rb)) > 0
                        THEN (COUNT(*) * SUM(ra * rb)
                              - SUM(ra) * SUM(rb))
                             / sqrt((COUNT(*) * SUM(ra * ra)
                                     - SUM(ra) * SUM(ra))
                                    * (COUNT(*) * SUM(rb * rb)
                                       - SUM(rb) * SUM(rb)))
                        ELSE NULL END AS spearman_rho
            FROM r
        """,
        # exact Kendall tau-b; the oracle enumerates pairs (fine at
        # gate scale), the Ray side never does — P derives from
        # n0 - n1 - n2 + n3 - Q, so (P-Q)/sqrt((n0-n1)(n0-n2)) is the
        # same tau-b both sides
        "kendall_user_metrics": """
            WITH u AS (SELECT user_id, COUNT(*) AS x,
                              SUM(CAST(value AS DECIMAL(18,2))) AS y
                       FROM events GROUP BY 1),
            pr AS (SELECT a.x xa, a.y ya, b.x xb, b.y yb
                   FROM u a JOIN u b ON a.user_id < b.user_id),
            s AS (SELECT
                    CAST(SUM(CASE WHEN (xa < xb AND ya < yb)
                                    OR (xa > xb AND ya > yb)
                                  THEN 1 ELSE 0 END) AS DOUBLE) AS P,
                    CAST(SUM(CASE WHEN (xa < xb AND ya > yb)
                                    OR (xa > xb AND ya < yb)
                                  THEN 1 ELSE 0 END) AS DOUBLE) AS Q
                  FROM pr),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM u),
            tx AS (SELECT COALESCE(SUM(f * (f - 1) / 2.0), 0) AS n1
                   FROM (SELECT CAST(COUNT(*) AS DOUBLE) f
                         FROM u GROUP BY x)),
            ty AS (SELECT COALESCE(SUM(f * (f - 1) / 2.0), 0) AS n2
                   FROM (SELECT CAST(COUNT(*) AS DOUBLE) f
                         FROM u GROUP BY y))
            SELECT CAST(n.m AS BIGINT) AS n_users,
                   CASE WHEN (n.m * (n.m - 1) / 2.0 - tx.n1) > 0
                             AND (n.m * (n.m - 1) / 2.0 - ty.n2) > 0
                        THEN (s.P - s.Q)
                             / sqrt((n.m * (n.m - 1) / 2.0 - tx.n1)
                                    * (n.m * (n.m - 1) / 2.0 - ty.n2))
                        ELSE NULL END AS kendall_tau
            FROM s, n, tx, ty
        """,
        # exact tf-idf all-pairs cosine; the postings self-join IS the
        # dot product of unit vectors (w = tf·ln(N/df), L2-normalized,
        # zero-norm docs dropped by nrm > 0 like the Ray side)
        "sparse_cosine_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(trim(text), '\s+'),
                       x -> x <> '') AS toks
              FROM documents
            ),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            tf AS (SELECT doc_id, token,
                          CAST(COUNT(*) AS DOUBLE) AS tf
                   FROM tok GROUP BY 1, 2),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS n FROM documents),
            w AS (SELECT doc_id, token,
                         tf * ln(CAST(n.n AS DOUBLE) / df) AS w
                  FROM tf JOIN df USING (token) CROSS JOIN n),
            nm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm
                   FROM w GROUP BY 1),
            u AS (SELECT w.doc_id, token, w / nrm AS w
                  FROM w JOIN nm USING (doc_id) WHERE nrm > 0),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         SUM(a.w * b.w) AS cosine
                  FROM u a JOIN u b USING (token)
                  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT doc_a, doc_b, round(cosine, 6) AS cosine
            FROM p WHERE cosine >= 0.9
        """,
        # exact tie-corrected Mann-Whitney U / rank-sum z; RANK() +
        # (tiecount-1)/2 IS the average rank; tie term Στ³−τ in DOUBLE
        # and every closing expression mirrors the Ray side's float
        # order so both round identically
        "mannwhitney_value": """
            WITH e AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS v,
                     CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END AS ga
              FROM events WHERE event_type IN ('purchase', 'click')
            ),
            r AS (SELECT ga,
                         RANK() OVER (ORDER BY v)
                           + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0
                             AS rnk
                  FROM e),
            agg AS (SELECT CAST(SUM(ga) AS BIGINT) AS n1,
                           CAST(SUM(1 - ga) AS BIGINT) AS n2,
                           SUM(CASE WHEN ga = 1 THEN rnk
                                    ELSE 0 END) AS r1
                    FROM r),
            tie AS (SELECT COALESCE(
                             SUM(CAST(c AS DOUBLE) * c * c - c), 0
                           ) AS ties
                    FROM (SELECT COUNT(*) AS c FROM e GROUP BY v)),
            f AS (SELECT n1, n2, r1, ties,
                         r1 - n1 * (n1 + 1) / 2.0 AS u1,
                         n1 + n2 AS n
                  FROM agg CROSS JOIN tie)
            SELECT n1 AS n_a, n2 AS n_b,
                   CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                        ELSE round(u1, 6) END AS u_stat,
                   CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 THEN NULL
                        WHEN (n1 * n2 / 12.0)
                             * ((n + 1) - ties
                                / (CAST(n AS DOUBLE) * (n - 1))) <= 0
                             THEN NULL
                        ELSE round((u1 - n1 * n2 / 2.0)
                             / sqrt((n1 * n2 / 12.0)
                                    * ((n + 1) - ties
                                       / (CAST(n AS DOUBLE)
                                          * (n - 1)))), 6)
                   END AS z_score
            FROM f
        """,
        # two-sample KS: the max ECDF gap is decided in INTEGER
        # arithmetic (d_num = max|ca*n2 - cb*n1| over inclusive
        # cumulative distinct-value counts) so ties can't flip the
        # argmax; d/ks close in DOUBLE with the Ray side's op order
        "ks_two_sample": """
            WITH e AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS v,
                     CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END AS ga
              FROM events WHERE event_type IN ('purchase', 'click')
            ),
            vc AS (SELECT v, CAST(SUM(ga) AS BIGINT) AS fa,
                          CAST(SUM(1 - ga) AS BIGINT) AS fb
                   FROM e GROUP BY v),
            n AS (SELECT CAST(COALESCE(SUM(fa), 0) AS BIGINT) AS n1,
                         CAST(COALESCE(SUM(fb), 0) AS BIGINT) AS n2
                  FROM vc),
            c AS (SELECT CAST(SUM(fa) OVER (ORDER BY v) AS BIGINT) AS ca,
                         CAST(SUM(fb) OVER (ORDER BY v) AS BIGINT) AS cb
                  FROM vc),
            m AS (SELECT CAST(COALESCE(
                           MAX(ABS(ca * n2 - cb * n1)), 0
                         ) AS BIGINT) AS d_num
                  FROM c CROSS JOIN n)
            SELECT n1 AS n_a, n2 AS n_b, d_num,
                   CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                        ELSE round(CAST(d_num AS DOUBLE)
                                   / (CAST(n1 AS DOUBLE) * n2), 6)
                   END AS d_stat,
                   CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                        ELSE round(
                          sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))
                          * (CAST(d_num AS DOUBLE)
                             / (CAST(n1 AS DOUBLE) * n2)), 6)
                   END AS ks_stat
            FROM m CROSS JOIN n
        """,
        # Welch's t from the exact-integer cents moments; variance via
        # (Σc² − (Σc)²/n)/(n−1) mirrors the Ray side bit-for-bit
        "welch_ttest_value": """
            WITH e AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c,
                     CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END AS ga
              FROM events WHERE event_type IN ('purchase', 'click')
            ),
            m AS (SELECT ga, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(c) AS BIGINT) AS s,
                         CAST(SUM(c * c) AS BIGINT) AS q
                  FROM e GROUP BY ga),
            w AS (SELECT
                    COALESCE(MAX(CASE WHEN ga = 1 THEN n END), 0) AS n1,
                    COALESCE(MAX(CASE WHEN ga = 1 THEN s END), 0) AS s1,
                    COALESCE(MAX(CASE WHEN ga = 1 THEN q END), 0) AS q1,
                    COALESCE(MAX(CASE WHEN ga = 0 THEN n END), 0) AS n2,
                    COALESCE(MAX(CASE WHEN ga = 0 THEN s END), 0) AS s2,
                    COALESCE(MAX(CASE WHEN ga = 0 THEN q END), 0) AS q2
                  FROM m),
            v AS (SELECT n1, n2,
                         CASE WHEN n1 > 0
                              THEN s1 / (100.0 * n1) END AS m1,
                         CASE WHEN n2 > 0
                              THEN s2 / (100.0 * n2) END AS m2,
                         CASE WHEN n1 > 1
                              THEN (q1 - s1 * s1 / n1) / (n1 - 1)
                                   / 10000.0 END AS v1,
                         CASE WHEN n2 > 1
                              THEN (q2 - s2 * s2 / n2) / (n2 - 1)
                                   / 10000.0 END AS v2
                  FROM w)
            SELECT n1 AS n_a, n2 AS n_b,
                   round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
                   CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL
                             AND v1 / n1 + v2 / n2 > 0
                        THEN round((m1 - m2)
                             / sqrt(v1 / n1 + v2 / n2), 6)
                   END AS t_stat,
                   CASE WHEN v1 IS NOT NULL AND v2 IS NOT NULL
                             AND v1 / n1 + v2 / n2 > 0
                        THEN round((v1 / n1 + v2 / n2)
                                   * (v1 / n1 + v2 / n2)
                             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6)
                   END AS welch_df
            FROM v
        """,
        # chi² over the FULL grid from observed cells only:
        # Σ_obs((f−e)²/e − e) + n is exact because an empty cell
        # contributes (0−e)²/e = e; MI takes 0 from empty cells
        "contingency_stats": """
            WITH c AS (SELECT event_type AS a,
                              EXTRACT(hour FROM ts) AS b,
                              CAST(COUNT(*) AS DOUBLE) AS f
                       FROM events GROUP BY 1, 2),
            ra AS (SELECT a, SUM(f) AS fa FROM c GROUP BY 1),
            cb AS (SELECT b, SUM(f) AS fb FROM c GROUP BY 1),
            n AS (SELECT SUM(f) AS nn FROM c),
            dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                             FROM ra) AS r,
                            (SELECT CAST(COUNT(*) AS BIGINT)
                             FROM cb) AS cc),
            cell AS (SELECT c.f, ra.fa * cb.fb / n.nn AS e,
                            ra.fa, cb.fb, n.nn
                     FROM c JOIN ra USING (a) JOIN cb USING (b)
                     CROSS JOIN n),
            s AS (SELECT MAX(nn) AS nn,
                         SUM((f - e) * (f - e) / e - e)
                           + MAX(nn) AS chi2,
                         SUM(f / nn * ln(f * nn / (fa * fb))) AS mi
                  FROM cell)
            SELECT CAST(nn AS BIGINT) AS n, r AS r_levels,
                   cc AS c_levels,
                   CAST((r - 1) * (cc - 1) AS BIGINT) AS dof,
                   round(chi2, 6) AS chi2,
                   CASE WHEN least(r, cc) > 1 AND chi2 > 0
                        THEN round(sqrt(chi2
                                        / (nn * (least(r, cc) - 1))), 6)
                        WHEN least(r, cc) > 1 THEN 0.0
                   END AS cramers_v,
                   round(mi, 6) AS mutual_info
            FROM s CROSS JOIN dims
        """,
        # lag-1 Pearson autocorr from explicit pair sums; the CASE
        # guard mirrors the Ray kernel's (m>0, vx>0, vy>0) validity
        # per-user activity streaks: the gaps-and-islands grp trick
        # (epoch-day − row_number is constant within a consecutive
        # run); all-integer output so the hash needs no float care
        "activity_streaks": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     datediff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS day
              FROM events
            ),
            g AS (
              SELECT user_id, day,
                     day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS grp
              FROM d
            ),
            s AS (SELECT user_id, grp, COUNT(*) AS len
                  FROM g GROUP BY 1, 2)
            SELECT user_id,
                   CAST(SUM(len) AS BIGINT) AS n_active_days,
                   CAST(MAX(len) AS BIGINT) AS longest_streak
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        # per-user running-balance scan statistics — every output is
        # exact int64 cents (segmented cumsum/cummax on the Ray side,
        # windowed SUM/MAX here), so the hash needs no float mirroring
        "user_drawdown": """
            WITH e AS (
              SELECT user_id, event_id, ts,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events
            ),
            r AS (
              SELECT user_id, event_id, ts, c,
                     CAST(SUM(c) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
              FROM e
            ),
            p AS (
              SELECT user_id, c, run,
                     CAST(MAX(run) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
              FROM r
            )
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(c) AS BIGINT) AS final_cents,
                   CAST(MAX(run) AS BIGINT) AS peak_cents,
                   CAST(MAX(peak - run) AS BIGINT)
                     AS max_drawdown_cents
            FROM p GROUP BY user_id ORDER BY user_id
        """,
        "lag1_autocorr": """
            WITH s AS (SELECT user_id, value,
                              LAG(value) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                                  AS prev
                       FROM events),
            a AS (SELECT user_id,
                         COUNT(prev) AS m,
                         SUM(prev) FILTER (WHERE prev IS NOT NULL) AS sx,
                         SUM(value) FILTER (WHERE prev IS NOT NULL) AS sy,
                         SUM(prev * prev) AS sxx,
                         SUM(value * value) FILTER (WHERE prev IS NOT NULL)
                             AS syy,
                         SUM(prev * value) AS sxy
                  FROM s GROUP BY user_id)
            SELECT user_id, CAST(m AS BIGINT) AS n_pairs,
                   CASE WHEN m > 0 AND (m * sxx - sx * sx) > 0
                             AND (m * syy - sy * sy) > 0
                        THEN (m * sxy - sx * sy)
                             / sqrt((m * sxx - sx * sx)
                                    * (m * syy - sy * sy))
                        ELSE NULL END AS lag1_corr
            FROM a ORDER BY user_id
        """,
        "kcore_nodes": """
            WITH RECURSIVE e0 AS (
              SELECT DISTINCT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst
              FROM lineitem
            ),
            es AS (SELECT src, dst FROM e0
                   UNION ALL SELECT dst AS src, src AS dst FROM e0),
            peel(i, v) AS (
              SELECT 0, src FROM es GROUP BY src
              UNION
              SELECT * FROM (
                WITH cur AS (SELECT v FROM peel WHERE v >= 0),
                deg AS (
                  SELECT s.src AS v, COUNT(*) AS d
                  FROM es s JOIN cur c1 ON s.src = c1.v
                            JOIN cur c2 ON s.dst = c2.v
                  GROUP BY s.src
                ),
                nxt AS (SELECT v FROM deg WHERE d >= 10),
                step AS (
                  SELECT v FROM nxt
                  UNION ALL
                  SELECT -1 WHERE NOT EXISTS (SELECT 1 FROM nxt)
                )
                SELECT (SELECT MAX(i) FROM peel) + 1 AS i, v
                FROM step
                WHERE (SELECT COUNT(*) FROM nxt) < (SELECT COUNT(*) FROM cur)
              )
            ),
            core AS (SELECT v FROM peel
                     WHERE i = (SELECT MAX(i) FROM peel) AND v >= 0)
            SELECT s.src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
            FROM es s JOIN core c1 ON s.src = c1.v
                      JOIN core c2 ON s.dst = c2.v
            GROUP BY s.src ORDER BY node
        """,
        "frequent_item_pairs": """
            WITH e0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
            keep AS (SELECT o FROM e0 GROUP BY o
                     HAVING COUNT(*) BETWEEN 2 AND 4096),
            e1 AS (SELECT o, p FROM e0 JOIN keep USING (o)),
            cd AS (SELECT a.p AS pa, b.p AS pb
                   FROM e1 a JOIN e1 b ON a.o = b.o AND a.p < b.p),
            pc2 AS (SELECT pa, pb, COUNT(*) AS support FROM cd GROUP BY 1, 2)
            SELECT pa AS part_a, pb AS part_b,
                   CAST(support AS BIGINT) AS support
            FROM pc2 WHERE support >= 2 ORDER BY part_a, part_b
        """,
        "butterfly_count": """
            WITH e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                        FROM lineitem),
            keep AS (SELECT p FROM e0 GROUP BY p
                     HAVING COUNT(*) BETWEEN 2 AND 4096),
            e1 AS (SELECT s, p FROM e0 JOIN keep USING (p)),
            cd AS (SELECT a.s AS u, b.s AS v
                   FROM e1 a JOIN e1 b ON a.p = b.p AND a.s < b.s),
            pc2 AS (SELECT u, v, COUNT(*) AS c FROM cd GROUP BY 1, 2)
            SELECT CAST((SELECT COUNT(*) FROM keep) AS BIGINT) AS n_parts,
                   CAST((SELECT COUNT(*) FROM pc2) AS BIGINT) AS n_copairs,
                   CAST(COALESCE((SELECT SUM(c * (c - 1) // 2) FROM pc2),
                                 0) AS BIGINT) AS n_butterflies
        """,
        "rrf_fusion": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            dl AS (SELECT doc_id, len(toks) AS dl FROM t),
            st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            qt AS (SELECT * FROM (VALUES ('table'), ('hash'), ('sort'),
                                  ('window')) q(token)),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM tok JOIN qt USING (token) GROUP BY 1, 2),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
            s AS (
              SELECT tf.doc_id,
                     SUM(ln(1 + ((SELECT n FROM st) - df.df + 0.5)
                                / (df.df + 0.5))
                         * tf.tf * (1.2 + 1)
                         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / (SELECT avgdl FROM st)))
                     ) AS score
              FROM tf JOIN df USING (token)
              JOIN dl ON dl.doc_id = tf.doc_id
              GROUP BY 1
            ),
            lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY round(score, 6) DESC,
                                        doc_id) AS ra
              FROM s
              QUALIFY ra <= 20
            ),
            den AS (
              SELECT vec_id AS doc_id,
                     row_number() OVER (
                       ORDER BY round(list_cosine_similarity(
                         CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[])
                          FROM embeddings WHERE vec_id = 0)), 6) DESC,
                       vec_id) AS rb
              FROM embeddings
              QUALIFY rb <= 20
            ),
            f AS (
              SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
                     lex.ra, den.rb
              FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
            )
            SELECT doc_id,
                   round(COALESCE(1.0 / (60 + ra), 0)
                         + COALESCE(1.0 / (60 + rb), 0), 6) AS rrf_score,
                   ra AS bm25_rank, rb AS cosine_rank
            FROM f
            QUALIFY row_number() OVER (
              ORDER BY round(COALESCE(1.0 / (60 + ra), 0)
                             + COALESCE(1.0 / (60 + rb), 0), 6) DESC,
                       doc_id) <= 10
            ORDER BY rrf_score DESC, doc_id
        """,
        "weighted_sssp": """
            WITH RECURSIVE ew AS (
              SELECT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst,
                     CAST(MIN(l_quantity) AS BIGINT) AS w
              FROM lineitem GROUP BY 1, 2
            ),
            es AS (SELECT src, dst, w FROM ew
                   UNION ALL SELECT dst AS src, src AS dst, w FROM ew),
            seeds AS (SELECT 2 * s_suppkey AS v FROM supplier
                      WHERE s_nationkey = 3),
            sweep(i, v, d) AS (
              SELECT 0, v, CAST(0 AS BIGINT) FROM seeds
              UNION
              SELECT * FROM (
                WITH cur AS (SELECT v, d FROM sweep)
                SELECT (SELECT MAX(i) FROM sweep) + 1 AS i, v, MIN(d) AS d
                FROM (
                  SELECT v, d FROM cur
                  UNION ALL
                  SELECT e.dst AS v, c.d + e.w AS d
                  FROM es e JOIN cur c ON e.src = c.v
                )
                GROUP BY v
                HAVING (SELECT MAX(i) FROM sweep) < 4
              )
            )
            SELECT v AS node, d AS dist FROM sweep
            WHERE i = (SELECT MAX(i) FROM sweep)
            ORDER BY node
        """,
        "user_value_trend": """
            WITH s AS (SELECT user_id, value,
                              CAST(ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS DOUBLE) AS rn
                       FROM events),
            a AS (SELECT user_id,
                         COUNT(*) AS n,
                         SUM(rn) AS sx, SUM(value) AS sy,
                         SUM(rn * rn) AS sxx,
                         SUM(value * value) AS syy,
                         SUM(rn * value) AS sxy
                  FROM s GROUP BY user_id)
            SELECT user_id, CAST(n AS BIGINT) AS n_events,
                   CASE WHEN n >= 2
                        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                        ELSE NULL END AS slope,
                   CASE WHEN n >= 2
                        THEN (sy - (n * sxy - sx * sy)
                                   / (n * sxx - sx * sx) * sx) / n
                        ELSE NULL END AS intercept,
                   CASE WHEN n >= 2 AND (n * syy - sy * sy) > 0
                        THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                             / ((n * sxx - sx * sx)
                                * (n * syy - sy * sy))
                        ELSE NULL END AS r2
            FROM a ORDER BY user_id
        """,
        # per-source shingle diversity: the MinHash family's shingle
        # CTE (per-doc distinct, lowercased, whole-doc below n tokens)
        "ngram_diversity": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_distinct(list_transform(
                            range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' '
                                 || toks[i+2]))
                END AS sh
              FROM toks
            ),
            g AS (SELECT doc_id, unnest(sh) AS gram FROM sh
                  WHERE len(sh) > 0),
            j AS (SELECT d.source, g.gram FROM g
                  JOIN documents d USING (doc_id))
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
                   round(COUNT(DISTINCT gram) * 1.0 / COUNT(*), 6)
                       AS diversity
            FROM j GROUP BY 1 ORDER BY 1
        """,
        # stream throttle: LAG-gap debounce per (user, type); first
        # event keeps (NULL LAG)
        "event_throttle": """
            WITH g AS (SELECT event_id, user_id, event_type, ts,
                              epoch_us(ts) - epoch_us(LAG(ts) OVER (
                                  PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id)) AS dus
                       FROM events)
            SELECT event_id, user_id, event_type, ts FROM g
            WHERE dus IS NULL OR dus >= 30 * 60 * 1000000
            ORDER BY event_id
        """,
        # deterministic 80/10/10 split manifest: md5_number_upper ==
        # the kernels' hash64, so assignment is bit-exact
        "dataset_split": """
            WITH s AS (
              SELECT CASE WHEN md5_number_upper('split:'
                               || CAST(doc_id AS VARCHAR)) % 100 < 80
                          THEN 'train'
                          WHEN md5_number_upper('split:'
                               || CAST(doc_id AS VARCHAR)) % 100 < 90
                          THEN 'valid'
                          ELSE 'test' END AS split,
                     lang, n_chars
              FROM documents)
            SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # medoid per embedding near-dup component: recursive reach over
        # the cosine>=0.4 pair graph, then SUM(round(cos,6)) centrality
        "neardup_medoids": """
            WITH RECURSIVE n AS (SELECT vec_id,
                                        CAST(embedding AS DOUBLE[]) AS e
                                 FROM embeddings),
            pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
                      FROM n a JOIN n b ON a.vec_id < b.vec_id
                      WHERE list_cosine_similarity(a.e, b.e) >= 0.4),
            edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                      UNION ALL SELECT doc_b, doc_a FROM pairs),
            reach(node, label) AS (SELECT vec_id, vec_id FROM n
                                   UNION
                                   SELECT e.dst, r.label FROM reach r
                                   JOIN edges e ON e.src = r.node),
            lab AS (SELECT node AS vec_id, MIN(label) AS component
                    FROM reach GROUP BY node),
            s AS (SELECT la.component, la.vec_id,
                         SUM(round(list_cosine_similarity(ea.e, eb.e), 6))
                             AS score
                  FROM lab la JOIN lab lb
                    ON la.component = lb.component
                   AND la.vec_id <> lb.vec_id
                  JOIN n ea ON ea.vec_id = la.vec_id
                  JOIN n eb ON eb.vec_id = lb.vec_id
                  GROUP BY 1, 2),
            m AS (SELECT component, vec_id AS medoid_id,
                         round(score, 6) AS score,
                         row_number() OVER (PARTITION BY component
                                            ORDER BY score DESC, vec_id)
                             AS rn
                  FROM s),
            cnt AS (SELECT component, COUNT(*) AS n_members FROM lab
                    GROUP BY 1)
            SELECT m.component, m.medoid_id,
                   CAST(cnt.n_members AS BIGINT) AS n_members, m.score
            FROM m JOIN cnt USING (component)
            WHERE rn = 1 AND cnt.n_members >= 2
            ORDER BY 1
        """,
        # vocab growth: "seen by cutoff" == each token's MIN doc_id;
        # cutoffs from MAX(doc_id) (footer column stats on the Ray side)
        "vocab_growth": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            f AS (SELECT token, MIN(doc_id) AS first_doc FROM tok
                  GROUP BY 1),
            m AS (SELECT MAX(doc_id) AS mx FROM documents),
            th AS (SELECT i, CAST(floor(i * mx / 10.0) AS BIGINT)
                          AS cutoff
                   FROM m CROSS JOIN
                        (SELECT unnest(generate_series(1, 10)) AS i))
            SELECT CAST(i AS BIGINT) AS decile, cutoff AS cutoff_doc,
                   CAST((SELECT COUNT(*) FROM f
                         WHERE first_doc <= cutoff) AS BIGINT)
                       AS vocab_size
            FROM th ORDER BY 1
        """,
        # clique-size histogram: GROUP BY text == the md5 key grouping
        # under the house collision-free assumption; NULL folds to ''
        "dup_clique_histogram": """
            WITH c AS (SELECT COUNT(*) AS clique_size FROM documents
                       GROUP BY COALESCE(text, ''))
            SELECT clique_size, CAST(COUNT(*) AS BIGINT) AS n_cliques
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # concentration: NTILE(100) percentile semantics shared with
        # the deciles core; SUM FILTER over missing tiles -> NULL
        "value_concentration": """
            WITH tot AS (SELECT user_id,
                                CAST(SUM(CAST(value AS DECIMAL(18,2)))
                                     AS DOUBLE) AS total
                         FROM events GROUP BY 1),
            r AS (SELECT total,
                         NTILE(100) OVER (ORDER BY total, user_id) AS tile
                  FROM tot)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(COUNT(*) FILTER (WHERE tile = 100) AS BIGINT)
                       AS top1_users,
                   round(SUM(total) FILTER (WHERE tile = 100)
                         / SUM(total), 6) AS top1_share,
                   round(SUM(total) FILTER (WHERE tile > 90)
                         / SUM(total), 6) AS top10_share
            FROM r
        """,
        # feature correlation matrix over the pivot: all sums are
        # INTEGER-exact on both sides, so the single final divide
        # rounds identically
        "feature_correlations": """
            WITH p AS (
              SELECT user_id,
                     COUNT(*) FILTER (WHERE event_type = 'click')
                         AS n_click,
                     COUNT(*) FILTER (WHERE event_type = 'error')
                         AS n_error,
                     COUNT(*) FILTER (WHERE event_type = 'purchase')
                         AS n_purchase,
                     COUNT(*) FILTER (WHERE event_type = 'signup')
                         AS n_signup,
                     COUNT(*) FILTER (WHERE event_type = 'view')
                         AS n_view,
                     COUNT(*) AS n_total
              FROM events GROUP BY 1),
            u AS (SELECT * FROM (VALUES
                    ('n_click', 1), ('n_error', 2), ('n_purchase', 3),
                    ('n_signup', 4), ('n_view', 5), ('n_total', 6))
                  f(name, i)),
            long AS (
              SELECT user_id, f.name, f.i,
                     CASE f.i WHEN 1 THEN n_click WHEN 2 THEN n_error
                              WHEN 3 THEN n_purchase
                              WHEN 4 THEN n_signup
                              WHEN 5 THEN n_view ELSE n_total END AS v
              FROM p CROSS JOIN u f),
            pairs AS (
              SELECT a.name AS feat_a, b.name AS feat_b,
                     CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(a.v) AS DOUBLE) AS sx,
                     CAST(SUM(b.v) AS DOUBLE) AS sy,
                     CAST(SUM(a.v * a.v) AS DOUBLE) AS sxx,
                     CAST(SUM(b.v * b.v) AS DOUBLE) AS syy,
                     CAST(SUM(a.v * b.v) AS DOUBLE) AS sxy
              FROM long a JOIN long b
                ON a.user_id = b.user_id AND a.i < b.i
              GROUP BY 1, 2)
            SELECT feat_a, feat_b, CAST(n AS BIGINT) AS n_users,
                   CASE WHEN (n * sxx - sx * sx) > 0
                         AND (n * syy - sy * sy) > 0
                        THEN round((n * sxy - sx * sy)
                                   / sqrt((n * sxx - sx * sx)
                                          * (n * syy - sy * sy)), 6)
                        ELSE NULL END AS corr
            FROM pairs ORDER BY 1, 2
        """,
        # PIVOT: wide conditional aggregation; pivot columns are schema
        "user_type_pivot": """
            SELECT user_id,
                   COUNT(*) FILTER (WHERE event_type = 'click')
                       AS n_click,
                   COUNT(*) FILTER (WHERE event_type = 'error')
                       AS n_error,
                   COUNT(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   COUNT(*) FILTER (WHERE event_type = 'signup')
                       AS n_signup,
                   COUNT(*) FILTER (WHERE event_type = 'view')
                       AS n_view,
                   COUNT(*) AS n_total
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # Benford audit: exact cents (round(x·100) == the house _cents
        # fixed-point on 2-decimal data), leading digit by string on
        # the SQL side / divide-loop on the Ray side
        "benford_digits": """
            WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                              AS cents
                       FROM orders WHERE round(o_totalprice * 100) > 0),
            d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                              AS BIGINT) AS digit FROM c),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM d)
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   COUNT(*) / (SELECT total FROM n) AS observed_p,
                   log10(1 + 1.0 / digit) AS benford_p
            FROM d GROUP BY 1 ORDER BY 1
        """,
        # Zipf head fit: the top_tokens CTE + ln-ln OLS with the exact
        # n·Σxy − ΣxΣy formula shape the Ray fold uses
        "zipf_slope": r"""
            WITH t AS (
              SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            tok AS (SELECT unnest(toks) AS token FROM t),
            c AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS cnt FROM tok
                  GROUP BY token ORDER BY cnt DESC, token LIMIT 100),
            r AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC,
                                                    token)
                                 AS DOUBLE)) AS x,
                         ln(cnt) AS y FROM c),
            a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
                         SUM(y) AS sy, SUM(x * x) AS sxx,
                         SUM(y * y) AS syy, SUM(x * y) AS sxy
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_tokens,
                   CASE WHEN n >= 2
                        THEN round((n * sxy - sx * sy)
                                   / (n * sxx - sx * sx), 6)
                        ELSE NULL END AS slope,
                   CASE WHEN n >= 2
                        THEN round((sy - (n * sxy - sx * sy)
                                         / (n * sxx - sx * sx) * sx) / n,
                                   6)
                        ELSE NULL END AS intercept,
                   CASE WHEN n >= 2 AND (n * syy - sy * sy) > 0
                        THEN round((n * sxy - sx * sy)
                                   * (n * sxy - sx * sy)
                                   / ((n * sxx - sx * sx)
                                      * (n * syy - sy * sy)), 6)
                        ELSE NULL END AS r2
            FROM a
        """,
        # inter-arrival burstiness: exact µs LAG gaps -> per-user
        # moment sums; GREATEST clamp and the x/0 NULL mirror the
        # kernel's max(var, 0) and nan-on-zero-denominator
        "user_burstiness": """
            WITH g AS (
              SELECT user_id,
                     (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id)))
                     / 3600000000.0 AS gap
              FROM events),
            a AS (SELECT user_id, COUNT(gap) AS n, SUM(gap) AS s,
                         SUM(gap * gap) AS ss
                  FROM g WHERE gap IS NOT NULL GROUP BY 1)
            SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
                   s / n AS mean_gap_hours,
                   sqrt(greatest(ss / n - (s / n) * (s / n), 0))
                       AS std_gap_hours,
                   CASE WHEN sqrt(greatest(ss / n - (s / n) * (s / n), 0))
                             + s / n = 0
                        THEN NULL
                        ELSE (sqrt(greatest(ss / n - (s / n) * (s / n), 0))
                              - s / n)
                             / (sqrt(greatest(ss / n - (s / n) * (s / n),
                                              0)) + s / n)
                   END AS burstiness
            FROM a ORDER BY 1
        """,
        # PSI drift: floor(log2) buckets (exact at the power-of-two
        # floor boundaries on both engines), Laplace-smoothed
        # proportions over the corpus bucket set via COALESCE cross join
        "psi_source_drift": """
            WITH b AS (SELECT source,
                              CAST(floor(log2(CAST(n_chars AS DOUBLE) + 1))
                                   AS BIGINT) AS bucket
                       FROM documents),
            sb AS (SELECT source, bucket, CAST(COUNT(*) AS DOUBLE) AS c
                   FROM b GROUP BY 1, 2),
            tb AS (SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS ct
                   FROM b GROUP BY 1),
            ns AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
                   FROM b GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM b),
            nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM tb),
            g AS (SELECT ns.source, ns.n, tb.ct, tot.nt, nb.k,
                         COALESCE(sb.c, 0) AS c
                  FROM ns CROSS JOIN tb CROSS JOIN tot CROSS JOIN nb
                  LEFT JOIN sb ON sb.source = ns.source
                              AND sb.bucket = tb.bucket)
            SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
                   round(SUM(((c + 0.5) / (n + 0.5 * k)
                              - (ct + 0.5) / (nt + 0.5 * k))
                         * ln(((c + 0.5) / (n + 0.5 * k))
                              / ((ct + 0.5) / (nt + 0.5 * k)))), 6) AS psi
            FROM g GROUP BY 1 ORDER BY 1
        """,
        # Theil–Sen: median of all strictly-increasing-ts pairwise
        # slopes; epoch_us difference FIRST then one divide, mirroring
        # the Ray kernel's exact double op order
        "theil_sen_trend": """
            WITH p AS (
              SELECT e1.user_id AS user_id,
                     (e2.value - e1.value) /
                     ((epoch_us(e2.ts) - epoch_us(e1.ts))
                      / 3600000000.0) AS slope
              FROM events e1 JOIN events e2
                ON e1.user_id = e2.user_id AND e2.ts > e1.ts)
            SELECT user_id, COUNT(*) AS n_pairs,
                   median(slope) AS slope_per_hour
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "asof_join_events": """
            SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id
        """,
        "range_join_events": """
            SELECT p.event_id, c.event_id AS click_event_id,
                   p.user_id, p.ts, c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 60 MINUTE
             AND c.ts <= p.ts
            ORDER BY p.event_id, click_event_id
        """,
        "sessionize": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id, count(*) AS n_events,
                   CAST(1 + sum(new_session) AS BIGINT) AS n_sessions
            FROM gaps GROUP BY user_id ORDER BY user_id
        """,
    }
    # both tiers of the distributed OCR join-back are byte-identical to
    # the inline path by contract, so they answer to ITS oracle
    # Content-defined chunking: the fingerprint_rolling recurrence,
    # with a cut wherever the 16-byte window hash divides by 64;
    # chunks = spans between {0, boundaries, n}. Parameterized over
    # the source relation so the dedup-stats oracle can run it over a
    # planted-duplicates CTE.
    _m = 1 << 61
    _bw = pow(257, 15, _m)

    def _cdc_chunks_sql(src: str) -> str:
        return f"""
        WITH RECURSIVE r AS (
          SELECT doc_id, text, length(text) AS n, 0 AS i,
                 CAST(0 AS HUGEINT) AS h
          FROM {src}
          UNION ALL
          SELECT doc_id, text, n, i + 1,
            CASE WHEN i < 16
                 THEN (h * 257 + ord(substr(text, i + 1, 1))) % {_m}
                 ELSE ((((h - ord(substr(text, i - 15, 1))
                          * {_bw}::HUGEINT) % {_m}) + {_m}) % {_m}
                       * 257 + ord(substr(text, i + 1, 1))) % {_m}
            END AS h
          FROM r WHERE i < n
        ),
        bounds AS (
          SELECT doc_id, i AS p FROM r WHERE i >= 16 AND h % 64 = 0
        ),
        marks AS (
          SELECT DISTINCT doc_id, p FROM (
            SELECT doc_id, 0 AS p FROM {src} WHERE length(text) > 0
            UNION ALL
            SELECT doc_id, length(text) FROM {src}
            WHERE length(text) > 0
            UNION ALL SELECT doc_id, p FROM bounds
          )
        ),
        spans AS (
          SELECT doc_id, p AS s,
                 lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS e
          FROM marks
        )
        SELECT spans.doc_id,
               CAST(row_number() OVER (PARTITION BY spans.doc_id
                                       ORDER BY s) AS BIGINT) AS chunk_ord,
               CAST(s AS BIGINT) AS start,
               CAST(e - s AS BIGINT) AS length,
               md5(substr(d.text, CAST(s + 1 AS INT),
                          CAST(e - s AS INT))) AS chunk_md5
        FROM spans JOIN {src} d ON d.doc_id = spans.doc_id
        WHERE e IS NOT NULL
    """

    oracles["cdc_chunks"] = _cdc_chunks_sql("documents")
    # CDC dedup accounting over planted duplicate docs (%41 in {7,8}
    # share one repeated payload): chunk-level duplicate mass.
    oracles["cdc_dedup_stats"] = (
        """
        WITH dup2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 41 IN (7, 8)
                      THEN repeat('shared duplicate payload block """
        """alpha beta gamma delta. ', 4)
                      ELSE text END AS text
          FROM documents
        ),
        chunks AS ("""
        + _cdc_chunks_sql("dup2")
        + """),
        g AS (
          SELECT chunk_md5, COUNT(*) AS c, MIN(length) AS l
          FROM chunks GROUP BY 1
        )
        SELECT CAST(SUM(c) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               round(SUM(c - 1) * 1.0 / SUM(c), 6) AS dup_chunk_frac,
               round(SUM((c - 1) * l) * 1.0 / SUM(c * l), 6)
                 AS dup_byte_frac
        FROM g
    """
    )
    # WET roundtrip: extraction -> conversion-record framing -> parse
    # must reproduce extract_docs_text byte-for-byte.
    oracles["parse_wet"] = oracles["extract_docs_text"]
    # Incremental extraction: the v2 snapshot's from-scratch closed
    # form (extract_docs_text over the modified text), composed by
    # substituting the v2 docs CTE — plus the reused flag, which is
    # simply "the page did not change".
    oracles["incremental_extract"] = (
        "WITH docs2 AS (SELECT doc_id, text ||"
        " CASE WHEN doc_id % 23 = 7 THEN ' v2' ELSE '' END AS text"
        " FROM documents), base AS ("
        + oracles["extract_docs_text"].replace("FROM documents", "FROM docs2")
        + r""") SELECT url, extracted_text,
               (CAST(regexp_extract(url, '(\d+)$', 1) AS BIGINT) % 23)
                 <> 7 AS reused
          FROM base"""
    )
    oracles["extract_pdf_ocr_distributed"] = oracles["extract_pdf_ocr"]
    oracles["extract_pdf_ocr_cogroup"] = oracles["extract_pdf_ocr"]
    # the standalone recognize stage over the same planted wrap: one
    # task row per doc (page 0, cluster nl+2, fixed bbox), md5-stub text
    oracles["ocr_recognize_pdf"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        l AS (
          SELECT doc_id, CAST(ceil(len(toks) / 12.0) AS INT) AS nl FROM t
        )
        SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(0 AS INT) AS page_no,
               CAST(nl + 2 AS INT) AS cluster_id,
               '[ocr ' ||
               substr(md5(printf('0:%d:420.0,60.0,560.0,90.0', nl + 2)), 1, 8)
               || ']' AS ocr_text
        FROM l
    """
    oracles["top_tokens"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT unnest(toks) AS token FROM t)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY token
        ORDER BY cnt DESC, token LIMIT 20
    """
    oracles["frequent_ngrams"] = r"""
        WITH t AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                 AS gram
          FROM t, UNNEST(range(1, len(toks) - 1)) AS r(i)
          WHERE len(toks) >= 3
        ),
        tot AS (SELECT COUNT(*) AS n FROM g)
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g, tot
        GROUP BY gram, n
        HAVING COUNT(*) >= 0.0002 * n
        ORDER BY cnt DESC, gram
    """
    # count-min sketch rebuilt from exact counts: salted md5 buckets,
    # per-(row, bucket) sums, min over rows; absent tokens hit empty
    # buckets -> COALESCE 0
    oracles["cms_token_estimates"] = r"""
        WITH t AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        counts AS (
          SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token
        ),
        rows_j AS (
          SELECT * FROM (VALUES
            (0, CAST(1609587929392839161 AS HUGEINT)),
            (1, CAST(2870177450012600261 AS HUGEINT)),
            (2, CAST(2685821657736338717 AS HUGEINT)),
            (3, CAST(1983613069789375825 AS HUGEINT))) AS t(j, m)
        ),
        bucketed AS (
          SELECT j,
                 ((CAST(md5_number_upper(token) AS HUGEINT) * m)
                  % 18446744073709551616) // 18014398509481984 AS b,
                 cnt
          FROM counts CROSS JOIN rows_j
        ),
        sums AS (SELECT j, b, SUM(cnt) AS s FROM bucketed GROUP BY 1, 2),
        probe AS (
          SELECT p.token, r.j,
                 ((CAST(md5_number_upper(p.token) AS HUGEINT) * r.m)
                  % 18446744073709551616) // 18014398509481984 AS b
          FROM (SELECT unnest(['spark', 'window', 'merge', 'the',
                               'zzzabsent']) AS token) p
          CROSS JOIN rows_j r
        )
        SELECT probe.token, CAST(MIN(COALESCE(sums.s, 0)) AS BIGINT) AS est
        FROM probe LEFT JOIN sums ON sums.j = probe.j AND sums.b = probe.b
        GROUP BY probe.token
    """
    oracles["quantize_embeddings"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        m AS (
          SELECT vec_id, emb,
                 list_max(list_transform(emb, x -> abs(x))) AS mx
          FROM e
        ),
        s AS (
          SELECT vec_id, emb,
                 CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END AS scale
          FROM m
        ),
        err AS (
          SELECT vec_id, scale,
                 list_transform(emb, x -> x - round(x / scale) * scale)
                   AS ev,
                 len(emb) AS d
          FROM s
        )
        SELECT vec_id,
               round(scale, 6) AS scale,
               round(list_aggregate(list_transform(ev, x -> x*x), 'sum')
                     / d, 6) AS mse,
               round(list_max(list_transform(ev, x -> abs(x))), 6)
                 AS max_abs_err
        FROM err
    """
    oracles["postings_lookup"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t)
        SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE token IN ('spark', 'window', 'merge')
        GROUP BY 1, 2
    """
    # connected components over the exact n-gram pair set: recursive
    # reachability closure, min label per node == min doc_id reachable
    oracles["neardup_components"] = r"""
        WITH RECURSIVE toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
            END AS sh
          FROM toks
        ),
        ne AS (SELECT doc_id, sh, len(sh) AS L FROM sh WHERE len(sh) > 0),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM ne a JOIN ne b ON a.doc_id < b.doc_id
          WHERE CAST(least(a.L, b.L) AS DOUBLE) >= 0.5 * greatest(a.L, b.L)
            AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / (a.L + b.L - len(list_intersect(a.sh, b.sh))) >= 0.5
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS component
        FROM reach GROUP BY node
    """
    # incremental dedup: the persisted store holds distinct md5 hashes
    # of every NON-src1 doc; src1 is the incoming shard. is_new =
    # first-in-shard (min doc_id per hash) and absent from history
    oracles["incremental_dedup"] = """
        WITH planted AS (
          SELECT doc_id, source,
            CASE WHEN doc_id % 20 IN (1, 2) AND (doc_id // 20) % 5 = 0
                 THEN 'hist shared ' ||
                      CAST((doc_id // 20) % 4 AS VARCHAR)
                 WHEN doc_id % 20 = 1 AND (doc_id // 20) % 5 = 2
                 THEN 'shard dup ' ||
                      CAST((doc_id // 20) % 3 AS VARCHAR)
                 ELSE text END AS text
          FROM documents
        ),
        base AS (
          SELECT DISTINCT md5(text) AS text_hash FROM planted
          WHERE COALESCE(source, '') <> 'src1'
        ),
        shard AS (
          SELECT doc_id, md5(text) AS text_hash FROM planted
          WHERE COALESCE(source, '') = 'src1'
        ),
        w AS (SELECT text_hash, MIN(doc_id) AS winner
              FROM shard GROUP BY 1)
        SELECT s.doc_id, s.text_hash,
               (s.doc_id = w.winner AND s.text_hash NOT IN
                  (SELECT text_hash FROM base)) AS is_new
        FROM shard s JOIN w USING (text_hash)
    """
    # cross-doc duplicate n-gram fraction: same 3-gram shingle CTE as
    # the dedup family (lowercased, whole-doc shingle below n tokens,
    # list_distinct); one (gram, doc) row per distinct gram per doc so
    # COUNT(*) per gram IS the doc frequency
    oracles["crossdoc_ngram_dup"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
            END AS sh
          FROM toks
        ),
        g AS (SELECT doc_id, unnest(sh) AS gram FROM sh
              WHERE len(sh) > 0),
        df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY 1)
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(*) FILTER (df.df >= 2) AS BIGINT) AS n_dup,
               round(COUNT(*) FILTER (df.df >= 2) * 1.0 / COUNT(*), 6)
                 AS dup_frac
        FROM g JOIN df USING (gram)
        GROUP BY 1
    """
    # keep-best survivor selection: same component labels, winner =
    # longest member (n_chars DESC, doc_id ASC) per component
    oracles["dedup_keep_best"] = (
        "WITH lab AS ("
        + oracles["neardup_components"]
        + """),
        w AS (
          SELECT component, doc_id AS winner FROM (
            SELECT l.component, l.doc_id,
                   row_number() OVER (PARTITION BY l.component
                                      ORDER BY d.n_chars DESC, l.doc_id)
                     AS rn
            FROM lab l JOIN documents d USING (doc_id)
          ) WHERE rn = 1
        )
        SELECT l.doc_id, l.component, l.doc_id = w.winner AS keep
        FROM lab l JOIN w USING (component)
        """
    )
    oracles["sample_per_group"] = """
        SELECT doc_id, lang FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)), doc_id
        ) <= 3
    """
    oracles["exact_quantiles"] = """
        SELECT CAST(q AS DOUBLE) AS q, CAST(value AS DOUBLE) AS value
        FROM (
          SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q,
                 unnest((SELECT quantile_disc(l_quantity,
                                              [0.25, 0.5, 0.75, 0.95])
                         FROM lineitem)) AS value
        )
    """
    oracles["anti_join_customers"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        )
    """
    # corpus-cleaning ops (pipelines/corpus_clean.py): exact oracles
    oracles["repetition_signals"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        base AS (
          SELECT doc_id, COUNT(*) AS n_tokens,
                 COUNT(DISTINCT token) AS n_distinct
          FROM tok GROUP BY doc_id
        ),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS gram
          FROM t WHERE len(toks) >= 2
        ),
        bgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bga AS (SELECT doc_id, MAX(c) AS mx FROM bgc GROUP BY doc_id),
        tg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS gram
          FROM t WHERE len(toks) >= 3
        ),
        tgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM tg GROUP BY 1, 2),
        tga AS (
          SELECT doc_id, SUM(c) AS total,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
          FROM tgc GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(b.n_tokens, 0) AS BIGINT) AS n_tokens,
               round(COALESCE((b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens,
                              0), 6) AS dup_token_frac,
               round(COALESCE(2.0 * g.mx / b.n_tokens, 0), 6)
                 AS top_bigram_frac,
               round(COALESCE(a.dup * 1.0 / a.total, 0), 6)
                 AS dup_trigram_frac
        FROM documents d
        LEFT JOIN base b USING (doc_id)
        LEFT JOIN bga g USING (doc_id)
        LEFT JOIN tga a USING (doc_id)
    """
    oracles["redact_pii"] = r"""
        WITH p AS (
          SELECT doc_id,
                 text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
                 '@mail.example.com or +1-555-01' ||
                 lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '.' AS planted
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(planted,
                   '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g'),
                 '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')
                 AS redacted,
               CAST(len(regexp_extract_all(planted,
                 '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(
                 regexp_replace(planted,
                   '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g'),
                 '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
        FROM p
    """
    # keep-first-by-(doc_id, ord) winner == groupby MIN of the packed
    # key; docs losing every segment emit no row on both sides
    oracles["segment_dedup"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        s2 AS (
          SELECT doc_id, CAST(u.ord AS BIGINT) AS ord,
                 array_to_string(toks[u.ord*13+1 : u.ord*13+13], ' ')
                   AS segment
          FROM t,
               unnest(range(0, CAST(ceil(len(toks) / 13.0) AS INT))) AS u(ord)
        ),
        w AS (
          SELECT segment, MIN(doc_id * 1048576 + ord) AS packed
          FROM s2 GROUP BY segment
        )
        SELECT CAST(packed // 1048576 AS BIGINT) AS doc_id,
               string_agg(segment, ' ' ORDER BY packed % 1048576)
                 AS dedup_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM w GROUP BY 1
    """
    # 8-gram shingles under the ngram_set rules (lowercased tokens,
    # whole-doc shingle below 8 tokens); hashes == kernels hash64, so
    # distinct-hash counts match bit-exactly even under collisions
    oracles["decontaminate"] = r"""
        WITH p AS (
          SELECT doc_id,
                 text || CASE
                   WHEN doc_id % 50 = 0 THEN
                     ' leak sequence ' ||
                     CAST((doc_id // 50) % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   WHEN doc_id % 7 = 3 THEN
                     ' leak sequence ' || CAST(doc_id % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   ELSE '' END AS text
          FROM documents
        ),
        t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM p
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 6),
                        i -> array_to_string(toks[i : i + 7], ' ')))
            END AS sh
          FROM t
        ),
        hv AS (
          SELECT doc_id, md5_number_upper(s) AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
        ),
        ev AS (SELECT DISTINCT h FROM hv WHERE doc_id % 50 = 0),
        tr AS (SELECT DISTINCT doc_id, h FROM hv WHERE doc_id % 50 <> 0)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM tr JOIN ev USING (h) GROUP BY 1
    """
    # Incremental decontamination: the decontaminate construction with
    # the training side restricted to the incoming shard (source =
    # 'src3'); the Ray side probes the PERSISTED eval-shingle store.
    oracles["incremental_decontaminate"] = r"""
        WITH p AS (
          SELECT doc_id, source,
                 text || CASE
                   WHEN doc_id % 50 = 0 THEN
                     ' leak sequence ' ||
                     CAST((doc_id // 50) % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   WHEN doc_id % 7 = 3 THEN
                     ' leak sequence ' || CAST(doc_id % 3 AS VARCHAR) ||
                     ' alpha beta gamma delta epsilon zeta eta'
                   ELSE '' END AS text
          FROM documents
        ),
        t AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM p
        ),
        sh AS (
          SELECT doc_id, source,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 6),
                        i -> array_to_string(toks[i : i + 7], ' ')))
            END AS sh
          FROM t
        ),
        hv AS (
          SELECT doc_id, source, md5_number_upper(s) AS h
          FROM (SELECT doc_id, source, unnest(sh) AS s FROM sh)
        ),
        ev AS (SELECT DISTINCT h FROM hv WHERE doc_id % 50 = 0),
        tr AS (
          SELECT DISTINCT doc_id, h FROM hv
          WHERE doc_id % 50 <> 0 AND source = 'src3'
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM tr JOIN ev USING (h) GROUP BY 1
    """
    # fastText-style hashed linear classifier: features are the same
    # trim + \s+ unigrams plus space-joined adjacent bigrams; bucket =
    # md5 % 4096, weight k = md5(str(bucket)) % 2001, score =
    # (sum(k) - 1000 n)/(997 n) (997 prime -> no round-6 straddles),
    # keep decided in INTEGER arithmetic on both sides
    oracles["quality_classifier"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        uni AS (SELECT doc_id, unnest(toks) AS f FROM t),
        bi AS (
          SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS f
          FROM t, unnest(range(1, len(toks))) AS u(i)
        ),
        feat AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        k AS (
          SELECT doc_id,
                 CAST(md5_number_upper(CAST(md5_number_upper(f) % 4096
                                            AS VARCHAR)) % 2001
                      AS BIGINT) AS k
          FROM feat
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_feat,
               round((SUM(k) - 1000 * COUNT(*))
                     / (997.0 * COUNT(*)), 6) AS score,
               round(1 / (1 + exp(-4.0 * ((SUM(k) - 1000 * COUNT(*))
                                          / (997.0 * COUNT(*))))), 6)
                 AS prob,
               SUM(k) >= 1000 * COUNT(*) AS keep
        FROM k GROUP BY doc_id
    """
    # unigram LM scoring shares tfidf's tokenization (trim + \s+ split,
    # not lowercased); zero-token docs emit no row on either side
    oracles["unigram_logprob"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
        total AS (SELECT COUNT(*) AS total FROM tok)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               round(SUM(tf * ln(cnt / CAST(total.total AS DOUBLE)))
                     / SUM(tf), 6) AS logprob
        FROM tf JOIN cnt USING (token) CROSS JOIN total
        GROUP BY doc_id
    """
    # two-level prefix sum == one SQL window cumsum over doc_id order;
    # a doc spans chunks floor(start/512)..floor((end-1)/512)
    oracles["pack_sequences"] = r"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS n
          FROM documents
        ),
        o AS (
          SELECT doc_id, n,
                 CAST(SUM(n) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n
                      AS BIGINT) AS s
          FROM t WHERE n > 0
        ),
        x AS (
          SELECT doc_id, CAST(u.c AS BIGINT) AS chunk_id,
                 least(s + n, (u.c + 1) * 512)
                   - greatest(s, u.c * 512) AS ov
          FROM o, unnest(range(s // 512, (s + n - 1) // 512 + 1)) AS u(c)
        )
        SELECT chunk_id, CAST(SUM(ov) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM x GROUP BY 1
    """
    # the composite cleaner: plantings (eval leak / dup pairs / spam /
    # train leak, mutually exclusive by precedence), then every rule's
    # existing SQL piece over the SAME planted text; comparisons use
    # round(...,6) on both sides so thresholds can't straddle a ulp
    oracles["clean_corpus"] = rf"""
        WITH p AS ({_CLEAN_PLANTED_SQL}),
        t AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks,
                 list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x <> '') AS ltoks,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
          FROM p
        ),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram
          FROM t WHERE len(toks) >= 2
        ),
        bgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bga AS (SELECT doc_id, MAX(c) AS mx FROM bgc GROUP BY doc_id),
        tg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS gram
          FROM t WHERE len(toks) >= 3
        ),
        tgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM tg GROUP BY 1, 2),
        tga AS (
          SELECT doc_id, SUM(c) AS total,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
          FROM tgc GROUP BY doc_id
        ),
        q AS (
          SELECT doc_id,
            round(0.4 * least(1.0, len(toks) / 50.0)
              + 0.2 * (CASE WHEN len(toks) = 0 THEN 0.5
                            WHEN CAST(list_sum(list_transform(toks,
                                     x -> length(x))) AS DOUBLE) / len(toks)
                                 BETWEEN 3.0 AND 10.0
                            THEN 1.0 ELSE 0.5 END)
              + 0.2 * least(1.0,
                  (CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE CAST(len(list_filter(ltoks,
                                 x -> x IN ({_STOP_EN}))) AS DOUBLE)
                             / len(toks) END) * 5.0)
              + 0.2 * (1.0 - least(1.0, greatest(0.0,
                  (CASE WHEN n_chars = 0 THEN 0.0
                        ELSE CAST(n_punct AS DOUBLE) / n_chars END)
                  - 0.2) * 2.0)), 6) AS quality
          FROM t
        ),
        w AS (
          SELECT md5(text) AS h, MIN(doc_id) AS win FROM p GROUP BY 1
        ),
        lt AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> x <> '') AS toks
          FROM p
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 6),
                        i -> array_to_string(toks[i : i + 7], ' ')))
            END AS sh
          FROM lt
        ),
        hv AS (
          SELECT doc_id, md5_number_upper(s) AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
        ),
        evh AS (SELECT DISTINCT h FROM hv WHERE doc_id % 50 = 0),
        cont AS (
          SELECT DISTINCT doc_id FROM hv
          WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM evh)
        ),
        v AS (
          SELECT t.doc_id,
            CASE
              WHEN t.doc_id % 50 = 0 THEN 'holdout'
              WHEN len(t.toks) < 15 THEN 'too_short'
              WHEN t.doc_id <> w.win THEN 'exact_dup'
              WHEN round(COALESCE(tga.dup * 1.0 / tga.total, 0), 6) > 0.25
                OR round(COALESCE(2.0 * bga.mx / len(t.toks), 0), 6) > 0.5
                THEN 'repetitious'
              WHEN q.quality < 0.55 THEN 'low_quality'
              WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
            END AS reason
          FROM t
          JOIN w ON w.h = md5(t.text)
          JOIN q ON q.doc_id = t.doc_id
          LEFT JOIN bga ON bga.doc_id = t.doc_id
          LEFT JOIN tga ON tga.doc_id = t.doc_id
          LEFT JOIN cont ON cont.doc_id = t.doc_id
        )
        SELECT doc_id,
               CAST(CASE WHEN reason IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS keep,
               reason
        FROM v
    """
    # hourly HLL: same bit-exact register rebuild as the global oracle,
    # grouped by epoch hour instead of event_type
    oracles["hll_distinct_hourly"] = """
        WITH h AS (
          SELECT DISTINCT CAST(epoch_us(ts) // 3600000000 AS BIGINT)
                   AS hour_bucket,
                 md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
          FROM events
        ),
        rk AS (
          SELECT hour_bucket, CAST(hv >> 52 AS INTEGER) AS idx,
                 to_hex(CAST((hv % 4503599627370496::HUGEINT) * 4096 + 4095
                             AS UBIGINT)) AS hx
          FROM h
        ),
        rk2 AS (
          SELECT hour_bucket, idx,
                 65 - (4 * (length(hx) - 1) +
                       CASE substr(hx, 1, 1)
                            WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
                            WHEN '4' THEN 3 WHEN '5' THEN 3 WHEN '6' THEN 3
                            WHEN '7' THEN 3 ELSE 4 END) AS rank
          FROM rk
        ),
        regs AS (SELECT hour_bucket, idx, max(rank) AS reg
                 FROM rk2 GROUP BY 1, 2),
        agg AS (
          SELECT hour_bucket, count(*) AS npresent,
                 sum(1::HUGEINT << (53 - reg)) AS present_num
          FROM regs GROUP BY 1
        ),
        est AS (
          SELECT hour_bucket,
                 4096 - npresent AS zeros,
                 (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                     (CAST(present_num + (4096 - npresent) * (1::HUGEINT << 53)
                           AS DOUBLE) / 9007199254740992.0) AS raw
          FROM agg
        )
        SELECT hour_bucket,
               CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                               THEN 4096 * ln(4096.0 / zeros)
                               ELSE raw END) AS BIGINT)
                   AS approx_distinct_users
        FROM est ORDER BY hour_bucket
    """
    # same RE2 pattern both sides; rows with no match count n=0, k=0
    oracles["props_extract"] = r"""
        WITH x AS (
          SELECT event_type,
                 regexp_extract(props, '"k":\s*(-?\d+)', 1) AS ks
          FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) FILTER (ks <> '') AS BIGINT) AS n,
               CAST(COALESCE(SUM(CAST(CASE WHEN ks = '' THEN '0' ELSE ks
                                      END AS BIGINT)), 0) AS BIGINT) AS sum_k,
               round(COALESCE(SUM(CAST(CASE WHEN ks = '' THEN '0' ELSE ks
                                       END AS BIGINT)), 0)
                     * 1.0 / greatest(COUNT(*) FILTER (ks <> ''), 1), 6)
                 AS avg_k
        FROM x GROUP BY 1
    """
    # centroid = AVG per (label, dim); cosine via the dim join; all
    # arithmetic CAST to DOUBLE to match the numpy float64 path
    oracles["label_centroids"] = """
        WITH e AS (
          SELECT vec_id, label, embedding,
                 sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * x))) AS vnorm
          FROM embeddings
        ),
        dims AS (
          SELECT label, u.i AS i,
                 CAST(embedding[u.i] AS DOUBLE) AS v
          FROM e, unnest(range(1, len(embedding) + 1)) AS u(i)
        ),
        c AS (SELECT label, i, AVG(v) AS cv FROM dims GROUP BY 1, 2),
        cn AS (SELECT label, sqrt(SUM(cv * cv)) AS cnorm FROM c GROUP BY 1),
        dots AS (
          SELECT e.vec_id, e.label, ANY_VALUE(e.vnorm) AS vnorm,
                 SUM(CAST(e.embedding[c.i] AS DOUBLE) * c.cv) AS dot
          FROM e JOIN c ON c.label = e.label
          GROUP BY 1, 2
        ),
        cos AS (
          SELECT d.label,
                 d.dot / (CASE WHEN d.vnorm * cn.cnorm = 0 THEN 1
                               ELSE d.vnorm * cn.cnorm END) AS cosv
          FROM dots d JOIN cn ON cn.label = d.label
        ),
        cosagg AS (SELECT label, AVG(cosv) AS mc FROM cos GROUP BY 1)
        SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               round(AVG(e.vnorm), 6) AS mean_norm,
               round(ANY_VALUE(cn.cnorm), 6) AS centroid_norm,
               round(ANY_VALUE(cosagg.mc), 6) AS mean_cos_to_centroid
        FROM e
        JOIN cn ON cn.label = e.label
        JOIN cosagg ON cosagg.label = e.label
        GROUP BY e.label
    """
    # entropy folds <= |langs| terms per source, round-6 on both sides
    oracles["source_composition"] = """
        WITH c AS (
          SELECT source, lang, COUNT(*) AS n, SUM(n_chars) AS ch
          FROM documents GROUP BY 1, 2
        ),
        s AS (
          SELECT source, SUM(n) AS n_docs, SUM(ch) AS total_chars
          FROM c GROUP BY 1
        )
        SELECT c.source, CAST(s.n_docs AS BIGINT) AS n_docs,
               CAST(s.total_chars AS BIGINT) AS total_chars,
               round(s.total_chars * 1.0 / s.n_docs, 6) AS mean_chars,
               round(-SUM((c.n * 1.0 / s.n_docs)
                          * ln(c.n * 1.0 / s.n_docs)), 6) AS lang_entropy
        FROM c JOIN s USING (source)
        GROUP BY 1, s.n_docs, s.total_chars
    """
    # winnowing (MOSS): word 4-grams (same trim + \s+ tokens), 8-hash
    # windows; j <= greatest(m-8, 0) keeps exactly the full windows
    # plus one truncated whole-doc window for docs with < 8 grams
    # (DuckDB ROWS ... FOLLOWING truncates at the partition edge);
    # rightmost tie = MAX(pos) among window rows equal to the min
    oracles["winnowing_fingerprints"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS i,
                 md5_number_upper(
                   array_to_string(toks[u.i:u.i + 3], ' ')) AS h
          FROM t, unnest(range(1, len(toks) - 4 + 2)) AS u(i)
        ),
        win AS (
          SELECT doc_id, i AS j,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND 7 FOLLOWING) AS mh,
                 COUNT(*) OVER (PARTITION BY doc_id) AS m
          FROM g
        ),
        w2 AS (SELECT * FROM win WHERE j <= greatest(m - 8, 0)),
        sel AS (
          SELECT w2.doc_id, w2.j, MAX(g.i) AS pos
          FROM w2 JOIN g ON g.doc_id = w2.doc_id
                        AND g.i BETWEEN w2.j AND w2.j + 7
                        AND g.h = w2.mh
          GROUP BY w2.doc_id, w2.j
        )
        SELECT DISTINCT sel.doc_id, sel.pos, CAST(g.h AS UBIGINT) AS h
        FROM sel JOIN g ON g.doc_id = sel.doc_id AND g.i = sel.pos
    """
    # snapshot diff: the CLOSED FORM of the v2 planting (removed
    # checked before modified — doc 190 at sf0.01 matches both)
    oracles["corpus_diff"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 31 = 4 THEN 'removed'
                    WHEN doc_id % 17 = 3 THEN 'modified'
                    ELSE 'unchanged' END AS status
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, 'added' AS status
        FROM documents WHERE doc_id % 23 = 5
    """
    # exact phrase occurrences of 'hash join' (0-based first_pos)
    oracles["phrase_lookup"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        occ AS (
          SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS p
          FROM t, unnest(range(1, len(toks))) AS u(i)
          WHERE toks[u.i] = 'hash' AND toks[u.i + 1] = 'join'
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
               MIN(p) AS first_pos
        FROM occ GROUP BY doc_id
    """
    # MOSS overlap: distinct (doc, h) over the winnowing oracle, df
    # cap, self-join pair counts
    oracles["winnowing_overlap_pairs"] = (
        "WITH fp AS (SELECT DISTINCT doc_id, h FROM ("
        + oracles["winnowing_fingerprints"]
        + """)),
        df AS (SELECT h, COUNT(*) AS c FROM fp GROUP BY h),
        ok AS (SELECT h FROM df WHERE c BETWEEN 2 AND 64)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM fp a JOIN fp b USING (h) JOIN ok USING (h)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
        """
    )
    # JS divergence per source vs the corpus unigram distribution;
    # same trim + \s+ tokens; tokens absent from a source contribute
    # (1 - sum q) ln 2 in closed form on both sides
    oracles["source_divergence"] = r"""
        WITH t AS (
          SELECT COALESCE(source, '') AS source,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT source, unnest(toks) AS token FROM t),
        ts AS (SELECT source, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        ns AS (SELECT source, SUM(cnt) AS n_s FROM ts GROUP BY 1),
        qt AS (SELECT token, SUM(cnt) AS qcnt FROM ts GROUP BY 1),
        tot AS (SELECT SUM(cnt) AS n FROM ts),
        terms AS (
          SELECT ts.source,
                 ts.cnt / CAST(ns.n_s AS DOUBLE) AS p,
                 qt.qcnt / CAST(tot.n AS DOUBLE) AS q
          FROM ts JOIN ns USING (source) JOIN qt USING (token)
          CROSS JOIN tot
        )
        SELECT terms.source, CAST(ANY_VALUE(ns.n_s) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               round(0.5 * SUM(p * ln(2 * p / (p + q)))
                     + 0.5 * (SUM(q * ln(2 * q / (p + q)))
                              + (1 - SUM(q)) * ln(2)), 6) AS jsd
        FROM terms JOIN ns USING (source)
        GROUP BY terms.source
    """
    # rank in md5 order; hash64 == md5_number_upper, doc_id tiebreak
    oracles["shuffle_ranks"] = r"""
        SELECT doc_id,
               CAST(row_number() OVER (
                 ORDER BY md5_number_upper('0:' || CAST(doc_id AS VARCHAR)),
                          doc_id) - 1 AS BIGINT) AS shuffle_rank
        FROM documents
    """
    # FFD bin packing IS SQL-expressible (VERDICT r4 #7): a recursive
    # CTE walks each bucket in (n_tok DESC, doc_id) order carrying the
    # per-bin remaining capacities as a LIST column; list_position of
    # the first fitting bin mirrors the Python first-fit scan exactly
    # (DuckDB list_position returns 0, not NULL, when absent); global
    # bin ids add the same per-bucket cumsum offset.
    oracles["pack_bins"] = r"""
        WITH RECURSIVE t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS n,
                 doc_id // 256 AS bucket
          FROM documents
        ),
        s AS (
          SELECT doc_id, n, bucket,
                 row_number() OVER (PARTITION BY bucket
                                    ORDER BY n DESC, doc_id) AS rn
          FROM t WHERE n > 0
        ),
        pack AS (
          SELECT bucket, rn, doc_id, n,
                 CASE WHEN n >= 512 THEN [CAST(0 AS BIGINT)]
                      ELSE [CAST(512 - n AS BIGINT)] END AS bins,
                 CAST(0 AS BIGINT) AS bin_of,
                 n > 512 AS overflow
          FROM s WHERE rn = 1
          UNION ALL
          SELECT s.bucket, s.rn, s.doc_id, s.n,
                 CASE
                   WHEN s.n >= 512 THEN pack.bins || [CAST(0 AS BIGINT)]
                   WHEN list_position(list_transform(pack.bins,
                                                     x -> x >= s.n),
                                      true) > 0
                     THEN list_transform(pack.bins, (x, i) ->
                            CASE WHEN i = list_position(
                                   list_transform(pack.bins,
                                                  y -> y >= s.n), true)
                                 THEN x - s.n ELSE x END)
                   ELSE pack.bins || [CAST(512 - s.n AS BIGINT)]
                 END AS bins,
                 CAST(CASE
                   WHEN s.n >= 512 THEN len(pack.bins)
                   WHEN list_position(list_transform(pack.bins,
                                                     x -> x >= s.n),
                                      true) > 0
                     THEN list_position(list_transform(pack.bins,
                                                       x -> x >= s.n),
                                        true) - 1
                   ELSE len(pack.bins)
                 END AS BIGINT) AS bin_of,
                 s.n > 512 AS overflow
          FROM pack JOIN s ON s.bucket = pack.bucket
                          AND s.rn = pack.rn + 1
        ),
        nb AS (
          SELECT bucket, max(bin_of) + 1 AS n_bins FROM pack
          GROUP BY bucket
        ),
        off AS (
          SELECT bucket,
                 CAST(SUM(n_bins) OVER (ORDER BY bucket
                                        ROWS UNBOUNDED PRECEDING)
                      - n_bins AS BIGINT) AS o
          FROM nb
        )
        SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_tok,
               CAST(p.bin_of + off.o AS BIGINT) AS bin_id, p.overflow
        FROM pack p JOIN off ON off.bucket = p.bucket
    """
    # constant-truth recall gate: the engine side computes recall@10
    # of the nprobe<n_lists IVF scan against exact brute force and
    # returns the pinned-bound boolean — deterministic, so the hash
    # compare goes RED the moment an IVF regression drops recall
    oracles["knn_ivf_cosine"] = """
        SELECT CAST(10 AS BIGINT) AS k, true AS recall_ge_half
    """
    # LSH gate: n_exact_pairs is genuinely computed on both sides (the
    # quadratic cosine join); precision/recall booleans pin that LSH
    # pairs are an exact-verified subset with the measured recall floor
    oracles["embedding_neardup_lsh"] = """
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        )
        SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
               true AS precision_one, true AS recall_ge_quarter
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    """
    # PCA gate: n_vecs is genuinely computed on both sides (every
    # embedding must be projected); the booleans pin basis invariants
    oracles["pca_project"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(8 AS BIGINT) AS k,
               true AS orthonormal_ok, true AS variance_desc_ok
        FROM embeddings
    """
    # BPE gates: n_distinct_words / per-doc n_words are genuinely
    # computed on both sides (whitespace tokenizer == regexp split);
    # the booleans pin merge-substring validity and lossless decode
    oracles["bpe_train"] = r"""
        SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words,
               CAST(12 AS BIGINT) AS n_merges,
               true AS merges_substring_ok
        FROM (
          SELECT unnest(list_filter(
                   regexp_split_to_array(trim(text), '\s+'),
                   x -> x <> '')) AS w
          FROM documents
        )
    """
    oracles["bpe_encode"] = r"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x <> '')) AS n_words,
               true AS roundtrip_ok
        FROM documents
    """
    # the x CTE of pack_sequences IS the assignment table
    oracles["pack_assignments"] = r"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS n
          FROM documents
        ),
        o AS (
          SELECT doc_id, n,
                 CAST(SUM(n) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n
                      AS BIGINT) AS s
          FROM t WHERE n > 0
        )
        SELECT doc_id, CAST(u.c AS BIGINT) AS chunk_id,
               CAST(least(s + n, (u.c + 1) * 512)
                 - greatest(s, u.c * 512) AS BIGINT) AS n_tokens
        FROM o, unnest(range(s // 512, (s + n - 1) // 512 + 1)) AS u(c)
    """
    # the composition: clean verdicts (nested CTE) filter the packer's
    # doc spans; pack runs over the PLANTED text of kept docs
    oracles["curate_and_pack"] = rf"""
        WITH verdict AS ({oracles["clean_corpus"]}),
        p2 AS ({_CLEAN_PLANTED_SQL}),
        t2 AS (
          SELECT p2.doc_id,
                 len(list_filter(regexp_split_to_array(trim(p2.text), '\s+'),
                                 x -> x <> '')) AS n
          FROM p2 JOIN verdict ON verdict.doc_id = p2.doc_id
          WHERE verdict.keep = 1
        ),
        o AS (
          SELECT doc_id, n,
                 CAST(SUM(n) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n
                      AS BIGINT) AS s
          FROM t2 WHERE n > 0
        ),
        x AS (
          SELECT doc_id, CAST(u.c AS BIGINT) AS chunk_id,
                 least(s + n, (u.c + 1) * 512)
                   - greatest(s, u.c * 512) AS ov
          FROM o, unnest(range(s // 512, (s + n - 1) // 512 + 1)) AS u(c)
        )
        SELECT chunk_id, CAST(SUM(ov) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM x GROUP BY 1
    """
    # Bloom positions = the CMS bucket scheme at width 8192 (shift 51)
    oracles["bloom_tokens"] = r"""
        WITH t AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        vocab AS (SELECT DISTINCT unnest(toks) AS token FROM t),
        rows_j AS (
          SELECT * FROM (VALUES
            (0, CAST(1609587929392839161 AS HUGEINT)),
            (1, CAST(2870177450012600261 AS HUGEINT)),
            (2, CAST(2685821657736338717 AS HUGEINT)),
            (3, CAST(1983613069789375825 AS HUGEINT))) AS t(j, m)
        ),
        bits AS (
          SELECT DISTINCT
                 ((CAST(md5_number_upper(token) AS HUGEINT) * m)
                  % 18446744073709551616) // 2251799813685248 AS b
          FROM vocab CROSS JOIN rows_j
        ),
        probe AS (
          SELECT p.token, r.j,
                 ((CAST(md5_number_upper(p.token) AS HUGEINT) * r.m)
                  % 18446744073709551616) // 2251799813685248 AS b
          FROM (SELECT unnest(['spark', 'window', 'merge', 'the',
                               'zzzabsent', 'qqmissing']) AS token) p
          CROSS JOIN rows_j r
        )
        SELECT probe.token,
               CAST(CASE WHEN COUNT(bits.b) = 4 THEN 1 ELSE 0 END
                    AS BIGINT) AS hit
        FROM probe LEFT JOIN bits ON bits.b = probe.b
        GROUP BY probe.token
    """
    oracles["top_tokens_per_lang"] = r"""
        WITH t AS (
          SELECT lang,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT lang, unnest(toks) AS token FROM t),
        c AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
        SELECT lang, token, CAST(cnt AS BIGINT) AS cnt FROM c
        QUALIFY row_number() OVER (PARTITION BY lang
                                   ORDER BY cnt DESC, token) <= 10
    """
    oracles["tfidf_topk"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        sc AS (
          SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
                 CAST(df AS BIGINT) AS df,
                 round(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS score
          FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, tf, df, score FROM sc
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) <= 5
    """
    # full-probe IVF == brute force (lossless at nprobe == n_lists)
    oracles["knn_ivf_fullprobe"] = oracles["knn_brute_cosine"]
    # figure_block fixture: one picture cluster at the fixed top-right
    # bbox per doc (page 0), caption block directly beneath it
    oracles["figure_crops"] = """
        SELECT 'https://docs.example/pdf/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(0 AS INT) AS page_no,
               420.0 AS l, 8.0 AS t, 560.0 AS r, 28.0 AS b,
               'Figure: doc ' || CAST(doc_id AS VARCHAR) AS caption
        FROM documents
    """
    # k-means: exploded-dim CTEs; init = vec_id < 8; 2 Lloyd sweeps
    # (assign -> per-dim AVG update, empty clusters keep the previous
    # centroid) then the final assignment. Ties break to the lowest
    # cluster index on both sides (np.argmin == row_number ORDER BY
    # d2, cl). All arithmetic in DOUBLE; dist2 rounded to 6dp.
    _km_assign = """
        SELECT vec_id, cl FROM (
          SELECT vec_id, cl,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cl) AS rn
          FROM (
            SELECT ed.vec_id, c.cl,
                   SUM((ed.x - c.cv) * (ed.x - c.cv)) AS d2
            FROM ed JOIN {cent} c USING (i) GROUP BY 1, 2
          )
        ) WHERE rn = 1
    """
    _km_update = """
        SELECT p.cl, p.i, COALESCE(u.cv, p.cv) AS cv
        FROM {prev} p LEFT JOIN (
          SELECT {assign}.cl, ed.i, AVG(ed.x) AS cv
          FROM ed JOIN {assign} USING (vec_id) GROUP BY 1, 2
        ) u ON u.cl = p.cl AND u.i = p.i
    """
    oracles["kmeans_clusters"] = (
        """
        WITH ed AS (
          SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        ),
        c0 AS (SELECT vec_id AS cl, i, x AS cv FROM ed WHERE vec_id < 8),
        a1 AS (""" + _km_assign.format(cent="c0") + """),
        c1 AS (""" + _km_update.format(assign="a1", prev="c0") + """),
        a2 AS (""" + _km_assign.format(cent="c1") + """),
        c2 AS (""" + _km_update.format(assign="a2", prev="c1") + """)
        SELECT vec_id, CAST(cl AS BIGINT) AS cluster,
               round(d2, 6) AS dist2
        FROM (
          SELECT vec_id, cl, d2,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cl) AS rn
          FROM (
            SELECT ed.vec_id, c.cl,
                   SUM((ed.x - c.cv) * (ed.x - c.cv)) AS d2
            FROM ed JOIN c2 c USING (i) GROUP BY 1, 2
          )
        ) WHERE rn = 1
        """
    )
    # SemDeDup: same k-means assignment CTEs, then within-cluster
    # cosine pruning — drop a vector when a lower-vec_id cluster-mate
    # has cosine > 0.4 with it (keep-lowest-id rule, both sides)
    oracles["semdedup"] = (
        "WITH a AS ("
        + oracles["kmeans_clusters"]
        + """),
        en AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        d AS (
          SELECT DISTINCT hi.vec_id
          FROM a lo
          JOIN a hi ON lo.cluster = hi.cluster
                   AND lo.vec_id < hi.vec_id
          JOIN en e1 ON e1.vec_id = lo.vec_id
          JOIN en e2 ON e2.vec_id = hi.vec_id
          WHERE list_cosine_similarity(e1.v, e2.v) > 0.4
        )
        SELECT a.vec_id, a.cluster,
               a.vec_id NOT IN (SELECT vec_id FROM d) AS keep
        FROM a
        """
    )
    # Population covariance of the embedding matrix, long-format upper
    # triangle (1-based dims). E[xy] - E[x]E[y] in DOUBLE, round 6 —
    # the Ray side folds per-block float64 moment registers.
    oracles["embedding_covariance"] = """
        WITH ed AS (
          SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        ),
        m AS (SELECT i, AVG(x) AS mu FROM ed GROUP BY 1),
        p AS (
          SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy,
                 COUNT(*) AS n
          FROM ed a JOIN ed b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY 1, 2
        )
        SELECT p.i, p.j, round(sxy / n - ma.mu * mb.mu, 6) AS cov
        FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
    """
    # Product quantization: m=4 independent k-means (k=4, 2 Lloyd
    # sweeps) over contiguous 16-dim subspaces — the kmeans_clusters
    # CTE chain instantiated per subspace and UNION ALLed. Same
    # determinism rules (init vec_id < k, ties -> lowest code, empty
    # clusters keep their codeword). The chain ends in a reusable
    # code_{s}(vec_id, code, d2) CTE shared by the pq_codes output
    # and the knn_pq_adc lookup-table scan.
    def _pq_subspace(s: int, lo: int, hi: int, k: int) -> str:
        assign = """
          SELECT vec_id, cl FROM (
            SELECT vec_id, cl,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cl) AS rn
            FROM (
              SELECT e.vec_id, c.cl,
                     SUM((e.x - c.cv) * (e.x - c.cv)) AS d2
              FROM ed{s} e JOIN {cent} c USING (i) GROUP BY 1, 2
            )
          ) WHERE rn = 1
        """
        update = """
          SELECT p.cl, p.i, COALESCE(u.cv, p.cv) AS cv
          FROM {prev} p LEFT JOIN (
            SELECT a.cl, e.i, AVG(e.x) AS cv
            FROM ed{s} e JOIN {assign} a USING (vec_id) GROUP BY 1, 2
          ) u ON u.cl = p.cl AND u.i = p.i
        """
        code = f"""
          SELECT vec_id, cl AS code, d2 FROM (
            SELECT vec_id, cl, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cl) AS rn
            FROM (
              SELECT e.vec_id, c.cl,
                     SUM((e.x - c.cv) * (e.x - c.cv)) AS d2
              FROM ed{s} e JOIN c2_{s} c USING (i) GROUP BY 1, 2
            )
          ) WHERE rn = 1
        """
        return (
            f"ed{s} AS (SELECT vec_id, i, x FROM ed "
            f"WHERE i BETWEEN {lo} AND {hi}),\n"
            f"c0_{s} AS (SELECT vec_id AS cl, i, x AS cv FROM ed{s} "
            f"WHERE vec_id < {k}),\n"
            f"a1_{s} AS ({assign.format(s=s, cent=f'c0_{s}')}),\n"
            f"c1_{s} AS ({update.format(s=s, assign=f'a1_{s}', prev=f'c0_{s}')}),\n"
            f"a2_{s} AS ({assign.format(s=s, cent=f'c1_{s}')}),\n"
            f"c2_{s} AS ({update.format(s=s, assign=f'a2_{s}', prev=f'c1_{s}')}),\n"
            f"code_{s} AS ({code})"
        )

    _pq_ed = """
        WITH ed AS (
          SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        ),
    """
    _pq_parts = [
        _pq_subspace(s, s * 16 + 1, (s + 1) * 16, 4) for s in range(4)
    ]
    oracles["pq_codes"] = (
        _pq_ed
        + ",\n".join(_pq_parts)
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT vec_id, CAST({s} AS BIGINT) AS sub, "
            f"CAST(code AS BIGINT) AS code, round(d2, 6) AS dist2 "
            f"FROM code_{s}"
            for s in range(4)
        )
    )
    # ADC top-k: per-query lookup tables lut_{s}(qid, cl, ld) = squared
    # distance from the un-quantized query subvector to each codeword;
    # a corpus vector's approximate distance is the SUM of its m
    # looked-up entries. round(...,6) BEFORE ranking on both sides;
    # ties -> lowest vec_id. Queries = vec_id < 3 (qid == vec_id since
    # vec_ids are 0-based contiguous — the same identity the pq init
    # relies on).
    oracles["knn_pq_adc"] = (
        _pq_ed
        + ",\n".join(_pq_parts)
        + ",\n"
        + ",\n".join(
            f"lut_{s} AS (SELECT e.vec_id AS qid, c.cl, "
            f"SUM((e.x - c.cv) * (e.x - c.cv)) AS ld "
            f"FROM ed{s} e JOIN c2_{s} c USING (i) "
            f"WHERE e.vec_id < 3 GROUP BY 1, 2)"
            for s in range(4)
        )
        + ",\ncontrib AS (\n"
        + "\nUNION ALL\n".join(
            f"SELECT l.qid, co.vec_id, l.ld "
            f"FROM code_{s} co JOIN lut_{s} l ON l.cl = co.code"
            for s in range(4)
        )
        + """
        ),
        a AS (
          SELECT qid, vec_id, round(SUM(ld), 6) AS adist
          FROM contrib GROUP BY 1, 2
        )
        SELECT CAST(qid AS BIGINT) AS query_id, vec_id, adist FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY adist, vec_id) AS rn
          FROM a
        ) WHERE rn <= 10
        """
    )
    # JL sign projection: the sign matrix is md5-derived per (i, j) so
    # SQL rebuilds it exactly; sum-then-scale order matches the Ray
    # kernel (SUM(x*sign) / sqrt(16), round 6).
    oracles["random_projection"] = """
        WITH ed AS (
          SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        ),
        r AS (
          SELECT d.i, u.j,
                 CASE WHEN md5_number_upper('rp:' || d.i || ':' || u.j)
                           % 2 = 0
                      THEN 1.0 ELSE -1.0 END AS sign
          FROM (SELECT DISTINCT i FROM ed) d,
               unnest(range(1, 17)) AS u(j)
        )
        SELECT e.vec_id, r.j,
               round(SUM(e.x * r.sign) / sqrt(16.0), 6) AS y
        FROM ed e JOIN r USING (i) GROUP BY 1, 2
    """
    # Priority sampling: u = (double(md5) + 1) / 2^64 with the same
    # IEEE op order as the kernel, so weight/u is bit-identical on
    # both sides and the top-50 rank needs no tolerance. Zero-weight
    # docs are unsampleable.
    oracles["weighted_sample"] = """
        WITH w AS (
          SELECT doc_id,
                 COALESCE(length(text), 0) AS weight,
                 (CAST(md5_number_upper('ws:' || doc_id) AS DOUBLE) + 1)
                   / 18446744073709551616.0 AS u
          FROM documents
        )
        SELECT doc_id, CAST(weight AS BIGINT) AS weight,
               round(weight / u, 6) AS priority
        FROM (
          SELECT *, row_number() OVER (ORDER BY weight / u DESC,
                                       doc_id) AS rn
          FROM w WHERE weight > 0
        ) WHERE rn <= 50
    """
    # Outlink extraction: the Ray side regex-parses the planted HTML
    # (sources/pages.py:pages_with_links) and urljoin-resolves; the
    # oracle reconstructs the same 6 links per doc as a closed form of
    # doc_id — extract_pages-style verification.
    oracles["extract_links"] = """
        WITH base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example' AS host,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        )
        SELECT url, '/n0' AS href, host || '/n0' AS resolved,
               CAST(1 AS BIGINT) AS pos FROM base
        UNION ALL SELECT url, '/n1', host || '/n1', 2 FROM base
        UNION ALL SELECT url, 'https://docs.example/' || t1,
                         'https://docs.example/' || t1, 3 FROM base
        UNION ALL SELECT url, '/d/' || t2,
                         host || '/d/' || t2, 4 FROM base
        UNION ALL SELECT url,
                         'https://ext' || m || '.example/p/' || r,
                         'https://ext' || m || '.example/p/' || r,
                         5 FROM base
        UNION ALL SELECT url, '/contact', host || '/contact', 6 FROM base
    """
    # Co-citation pairs over the planted link structure: the oracle
    # reconstructs each page's 6 resolved targets as closed forms of
    # doc_id (extract_links style), self-joins within page, and
    # mirrors the hub cap + min_shared filter. Pair order is binary
    # string order on BOTH sides.
    oracles["cocitation_pairs"] = """
        WITH base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example' AS host,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        ),
        l AS (
          SELECT url, host || '/n0' AS t FROM base
          UNION ALL SELECT url, host || '/n1' FROM base
          UNION ALL SELECT url, 'https://docs.example/' || t1 FROM base
          UNION ALL SELECT url, host || '/d/' || t2 FROM base
          UNION ALL SELECT url,
                    'https://ext' || m || '.example/p/' || r FROM base
          UNION ALL SELECT url, host || '/contact' FROM base
        ),
        d AS (SELECT DISTINCT url, t FROM l),
        ok AS (SELECT url FROM d GROUP BY url
               HAVING COUNT(*) BETWEEN 2 AND 64),
        p AS (SELECT a.t AS ta, b.t AS tb
              FROM d a JOIN d b ON a.url = b.url AND a.t < b.t
              JOIN ok ON ok.url = a.url)
        SELECT ta AS target_a, tb AS target_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """
    oracles["cocitation_pairs_grouped"] = oracles["cocitation_pairs"]
    oracles["link_domain_graph"] = """
        WITH e AS (
          SELECT 'site' || (doc_id % 5) || '.example' AS src_domain,
                 'site' || (doc_id % 5) || '.example' AS dst_domain,
                 4 AS n
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 5) || '.example',
                 'docs.example', 1
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 5) || '.example',
                 'ext' || (doc_id % 7) || '.example', 1
          FROM documents
        )
        SELECT src_domain, dst_domain,
               CAST(SUM(n) AS BIGINT) AS n_links
        FROM e GROUP BY 1, 2
    """
    # Weighted PageRank with dangling-mass redistribution over the
    # same closed-form domain edge aggregate; 3 sweeps, d = 0.85.
    _dpr_sweep = """
        SELECT nd.node,
               0.15 / (SELECT n FROM nn) + 0.85 * (
                 COALESCE(infl.s, 0)
                 + (SELECT COALESCE(SUM(p.r), 0) FROM {prev} p
                    LEFT JOIN ow ON ow.node = p.node
                    WHERE ow.node IS NULL) / (SELECT n FROM nn)
               ) AS r
        FROM nd
        LEFT JOIN (
          SELECT e.dst_domain AS node, SUM(p.r * e.n_links / ow.w) AS s
          FROM e JOIN {prev} p ON p.node = e.src_domain
                 JOIN ow ON ow.node = e.src_domain
          GROUP BY 1
        ) infl ON infl.node = nd.node
    """
    _dpr_ctes = (
        """
        WITH raw AS (
          SELECT 'site' || (doc_id % 5) || '.example' AS src_domain,
                 'site' || (doc_id % 5) || '.example' AS dst_domain,
                 4 AS n
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 5) || '.example',
                 'docs.example', 1
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 5) || '.example',
                 'ext' || (doc_id % 7) || '.example', 1
          FROM documents
        ),
        e AS (
          SELECT src_domain, dst_domain, SUM(n) AS n_links
          FROM raw GROUP BY 1, 2
        ),
        nd AS (
          SELECT src_domain AS node FROM e
          UNION
          SELECT dst_domain FROM e
        ),
        ow AS (SELECT src_domain AS node, SUM(n_links) AS w
               FROM e GROUP BY 1),
        nn AS (SELECT COUNT(*) AS n FROM nd),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nd),
        r1 AS ("""
        + _dpr_sweep.format(prev="r0")
        + """),
        r2 AS ("""
        + _dpr_sweep.format(prev="r1")
        + """),
        r3 AS ("""
        + _dpr_sweep.format(prev="r2")
        + """)"""
    )
    oracles["domain_pagerank"] = (
        _dpr_ctes
        + "\nSELECT node AS domain, round(r, 6) AS pagerank FROM r3"
    )
    # HITS over the same closed-form domain edge aggregate: 3 weighted
    # half-sweep pairs with L1 normalization, unrolled like the
    # pagerank CTEs; nodes with no inlinks keep authority 0 via the
    # LEFT JOIN COALESCE
    _hits_sweeps = []
    for _k in range(1, 4):
        _prev_h = f"h{_k - 1}" if _k > 1 else "h0"
        _hits_sweeps.append(
            f"""
        a{_k}r AS MATERIALIZED (SELECT nd.node, COALESCE(t.s, 0) AS v
               FROM nd LEFT JOIN (
                 SELECT e.dst_domain AS node,
                        SUM(h.v * e.n_links) AS s
                 FROM e JOIN {_prev_h} h ON h.node = e.src_domain
                 GROUP BY 1
               ) t ON t.node = nd.node),
        a{_k} AS MATERIALIZED (SELECT node,
                     CASE WHEN (SELECT SUM(v) FROM a{_k}r) > 0
                          THEN v / (SELECT SUM(v) FROM a{_k}r)
                          ELSE v END AS v
              FROM a{_k}r),
        h{_k}r AS MATERIALIZED (SELECT nd.node, COALESCE(t.s, 0) AS v
               FROM nd LEFT JOIN (
                 SELECT e.src_domain AS node,
                        SUM(a.v * e.n_links) AS s
                 FROM e JOIN a{_k} a ON a.node = e.dst_domain
                 GROUP BY 1
               ) t ON t.node = nd.node),
        h{_k} AS MATERIALIZED (SELECT node,
                     CASE WHEN (SELECT SUM(v) FROM h{_k}r) > 0
                          THEN v / (SELECT SUM(v) FROM h{_k}r)
                          ELSE v END AS v
              FROM h{_k}r)"""
        )
    oracles["domain_hits"] = (
        _dpr_ctes
        + ",\n        h0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn)"
        + " AS v FROM nd),"
        + ",".join(_hits_sweeps)
        + """
        SELECT h3.node AS domain, round(h3.v, 6) AS hub,
               round(a3.v, 6) AS authority
        FROM h3 JOIN a3 ON a3.node = h3.node"""
    )
    # Anchor texts aggregated per destination domain — the planted
    # anchors (home/about/ref one/ref two/src/contact) are closed
    # forms of doc_id like the links themselves.
    oracles["anchor_text_stats"] = """
        WITH p AS (
          SELECT doc_id,
                 'site' || (doc_id % 5) || '.example' AS host,
                 'ext' || (doc_id % 7) || '.example' AS exth
          FROM documents
        ),
        a AS (
          SELECT host AS dst_domain, 'home' AS anchor FROM p
          UNION ALL SELECT host, 'about' FROM p
          UNION ALL SELECT 'docs.example', 'ref one' FROM p
          UNION ALL SELECT host, 'ref two' FROM p
          UNION ALL SELECT exth, 'src' FROM p
          UNION ALL SELECT host, 'contact' FROM p
        )
        SELECT dst_domain, anchor, CAST(COUNT(*) AS BIGINT) AS n
        FROM a GROUP BY 1, 2
    """
    # Crawl frontier: distinct resolved targets anti-joined against
    # the crawled url set. A /d/{t2} content link is crawled exactly
    # when its target doc lives on the linking host — the LEFT JOIN
    # against the closed-form url set decides it, no count assumption.
    oracles["crawl_frontier"] = """
        WITH base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example' AS host,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        ),
        l AS (
          SELECT host || '/n0' AS url FROM base
          UNION ALL SELECT host || '/n1' FROM base
          UNION ALL SELECT 'https://docs.example/' || t1 FROM base
          UNION ALL SELECT host || '/d/' || t2 FROM base
          UNION ALL SELECT 'https://ext' || m || '.example/p/' || r
            FROM base
          UNION ALL SELECT host || '/contact' FROM base
        ),
        agg AS (
          SELECT url, CAST(COUNT(*) AS BIGINT) AS n_inlinks
          FROM l GROUP BY 1
        )
        SELECT a.url, a.n_inlinks
        FROM agg a LEFT JOIN base b ON b.url = a.url
        WHERE b.url IS NULL
    """
    # Frontier ranked by destination-domain PageRank (crawl
    # scheduling): reuse the 3-sweep pagerank CTE chain, rebuild the
    # frontier, join on the regexp-extracted domain, rank by
    # (round-6 rank DESC, in-links DESC, url ASC), keep the top 100.
    oracles["frontier_prioritized"] = (
        _dpr_ctes
        + """,
        base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example' AS host,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        ),
        l AS (
          SELECT host || '/n0' AS url FROM base
          UNION ALL SELECT host || '/n1' FROM base
          UNION ALL SELECT 'https://docs.example/' || t1 FROM base
          UNION ALL SELECT host || '/d/' || t2 FROM base
          UNION ALL SELECT 'https://ext' || m || '.example/p/' || r
            FROM base
          UNION ALL SELECT host || '/contact' FROM base
        ),
        agg AS (
          SELECT url, CAST(COUNT(*) AS BIGINT) AS n_inlinks
          FROM l GROUP BY 1
        ),
        fr AS (
          SELECT a.url, a.n_inlinks,
                 regexp_extract(a.url, '^https://([^/]+)', 1) AS domain
          FROM agg a LEFT JOIN base b ON b.url = a.url
          WHERE b.url IS NULL
        ),
        scored AS (
          SELECT fr.url, fr.domain, fr.n_inlinks,
                 COALESCE(round(r3.r, 6), 0) AS domain_rank
          FROM fr LEFT JOIN r3 ON r3.node = fr.domain
        )
        SELECT url, domain, n_inlinks, domain_rank,
               CAST(rn AS BIGINT) AS priority_rank
        FROM (
          SELECT *, row_number() OVER (ORDER BY domain_rank DESC,
                                       n_inlinks DESC, url) AS rn
          FROM scored
        ) WHERE rn <= 100
    """
    )
    # CDX capture index: SURT key + global rank in SURT order. SURTs
    # are unique (url is the dedup key) so the order is total; the Ray
    # side's rank comes from Ray's distributed sort + per-block offsets.
    oracles["cdx_index"] = """
        WITH base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 'example,site' || (doc_id % 5) || ')/d/'
                   || doc_id AS surt,
                 make_timestamp(1704067200000000 + doc_id) AS warc_ts
          FROM documents
        )
        SELECT surt, url, warc_ts,
               CAST(row_number() OVER (ORDER BY surt) - 1 AS BIGINT)
                 AS "rank"
        FROM base
    """
    # Robots politeness gate over the frontier: the planted policy
    # (odd site hosts disallow /d/, all site hosts disallow /contact,
    # ext hosts with residue % 3 == 0 disallow everything) mirrored as
    # a CASE filter over the rebuilt frontier.
    oracles["robots_filter"] = """
        WITH base AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example' AS host,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        ),
        l AS (
          SELECT host || '/n0' AS url FROM base
          UNION ALL SELECT host || '/n1' FROM base
          UNION ALL SELECT 'https://docs.example/' || t1 FROM base
          UNION ALL SELECT host || '/d/' || t2 FROM base
          UNION ALL SELECT 'https://ext' || m || '.example/p/' || r
            FROM base
          UNION ALL SELECT host || '/contact' FROM base
        ),
        agg AS (
          SELECT url, CAST(COUNT(*) AS BIGINT) AS n_inlinks
          FROM l GROUP BY 1
        ),
        fr AS (
          SELECT a.url, a.n_inlinks,
                 regexp_extract(a.url, '^https://([^/]+)', 1) AS dom,
                 regexp_extract(a.url, '^https://[^/]+(/.*)$', 1) AS path
          FROM agg a LEFT JOIN base b ON b.url = a.url
          WHERE b.url IS NULL
        )
        SELECT url, n_inlinks FROM fr
        WHERE NOT (
          (dom LIKE 'site%.example' AND path LIKE '/contact%')
          OR (dom LIKE 'site%.example' AND path LIKE '/d/%'
              AND COALESCE(TRY_CAST(regexp_extract(dom,
                    'site(\\d+)\\.example', 1) AS BIGINT) % 2, -1) = 1)
          OR (dom LIKE 'ext%.example'
              AND COALESCE(TRY_CAST(regexp_extract(dom,
                    'ext(\\d+)\\.example', 1) AS BIGINT) % 3, -1) = 0)
        )
    """
    # Corpus-relative quality gate: keep docs at/above the p90 quality
    # score. quantile_disc on the round-6 scores == the Ray side's
    # ceil(q*n)-1 cumulative-count rule; the score expression is the
    # hash-verified quality_scores formula.
    oracles["quality_threshold_filter"] = f"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '') AS toks,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS ltoks,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
          FROM documents
        ),
        f AS (
          SELECT doc_id, n_chars, len(toks) AS n_tokens,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                           AS DOUBLE) / len(toks)
            END AS mwl,
            CASE WHEN n_chars = 0 THEN 0.0
                 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS pr,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(ltoks, x -> x IN ({_STOP_EN})))
                           AS DOUBLE) / len(toks)
            END AS sr
          FROM t
        ),
        sc AS (
          SELECT doc_id,
            round(0.4 * least(1.0, n_tokens / 50.0)
                  + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0
                                THEN 1.0 ELSE 0.5 END)
                  + 0.2 * least(1.0, sr * 5.0)
                  + 0.2 * (1.0 - least(1.0,
                                       greatest(0.0, pr - 0.2) * 2.0)),
                  6) AS quality
          FROM f
        ),
        th AS (SELECT quantile_disc(quality, 0.9) AS t FROM sc)
        SELECT doc_id, quality FROM sc, th WHERE quality >= th.t
    """
    # WARC record parse: the Ray side walks real Content-Length-framed
    # binary records; the oracle rebuilds each record's url, payload
    # byte length (strlen == octet count of the utf-8 html) and md5
    # digest from the same closed-form page construction.
    oracles["parse_warc"] = """
        WITH base AS (
          SELECT doc_id, text,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 (doc_id * 31 + 17) % 100000 AS t1,
                 (doc_id * 7 + 3) % 97 AS t2,
                 doc_id % 7 AS m, doc_id % 13 AS r
          FROM documents
        ),
        h AS (
          SELECT url,
            '<html><body><nav><a href="/n0">home</a>'
            || '<a href="/n1">about</a></nav><main><h1>Doc '
            || doc_id || '</h1><p>' || text
            || '</p><a href="https://docs.example/' || t1
            || '">ref one</a><a href="/d/' || t2
            || '">ref two</a><a href="https://ext' || m
            || '.example/p/' || r
            || '">src</a></main><footer>'
            || '<a href="/contact">contact</a></footer></body></html>'
            AS html
          FROM base
        )
        SELECT url, 'response' AS warc_type,
               CAST(strlen(html) AS BIGINT) AS content_length,
               md5(html) AS payload_md5
        FROM h
    """
    # BM25: same whitespace tokenizer as tfidf (trim + \s+ split, not
    # lowercased); scores rounded to 6dp BEFORE ranking on both sides
    # so the top-20 SET is stable; ties break by doc_id
    oracles["bm25_topk"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        dl AS (SELECT doc_id, len(toks) AS dl FROM t),
        st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        qt AS (SELECT * FROM (VALUES ('table'), ('hash'), ('sort'),
                              ('window')) q(token)),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM tok JOIN qt USING (token) GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        s AS (
          SELECT tf.doc_id,
                 SUM(ln(1 + ((SELECT n FROM st) - df.df + 0.5)
                            / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                       / (SELECT avgdl FROM st)))
                 ) AS score
          FROM tf JOIN df USING (token)
          JOIN dl ON dl.doc_id = tf.doc_id
          GROUP BY 1
        )
        SELECT doc_id, round(score, 6) AS score
        FROM s
        QUALIFY row_number()
          OVER (ORDER BY round(score, 6) DESC, doc_id) <= 20
    """
    # DSIR hashed-unigram importance weights: bucket(token) =
    # md5_number_upper % 1024 == kernels.sketch.hash64; add-1 smoothing
    # over the fixed bucket domain; zero-token docs emit no row
    oracles["dsir_weights"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        b AS (SELECT doc_id,
                     CAST(md5_number_upper(token) % 1024 AS BIGINT)
                       AS bucket
              FROM tok),
        raw AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY 1),
        tgt AS (SELECT bucket, COUNT(*) AS c FROM b
                WHERE doc_id % 50 = 0 GROUP BY 1),
        tots AS (SELECT (SELECT COUNT(*) FROM b) AS rawtot,
                        (SELECT COUNT(*) FROM b
                         WHERE doc_id % 50 = 0) AS tgttot),
        w AS (
          SELECT raw.bucket,
                 ln((COALESCE(tgt.c, 0) + 1.0)
                    / (tots.tgttot + 1024))
                   - ln((raw.c + 1.0) / (tots.rawtot + 1024)) AS w
          FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tots
        )
        SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round(SUM(w.w), 6) AS dsir_logweight
        FROM b JOIN w USING (bucket)
        GROUP BY 1
    """
    # interpolated bigram LM: counts keyed by md5_number_upper (== the
    # Ray side's hash64) so any hash collision collides identically;
    # same whitespace tokenizer; docs with < 2 tokens emit no row
    oracles["bigram_logprob"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        pos AS (
          SELECT doc_id,
                 md5_number_upper(toks[u.i - 1]) AS hp,
                 md5_number_upper(toks[u.i]) AS hc,
                 md5_number_upper(toks[u.i - 1] || ' ' || toks[u.i]) AS h2
          FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
          WHERE len(toks) >= 2
        ),
        tok AS (SELECT md5_number_upper(unnest(toks)) AS h FROM t),
        c1 AS (SELECT h, COUNT(*) AS c FROM tok GROUP BY 1),
        c2 AS (SELECT h2 AS h, COUNT(*) AS c FROM pos GROUP BY 1),
        tot AS (SELECT COUNT(*) AS t FROM tok)
        SELECT pos.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(AVG(ln(0.7 * c2.c / cp.c
                            + 0.3 * cc.c / tot.t)), 6) AS bigram_logprob
        FROM pos
        JOIN c2 ON c2.h = pos.h2
        JOIN c1 cp ON cp.h = pos.hp
        JOIN c1 cc ON cc.h = pos.hc
        CROSS JOIN tot
        GROUP BY 1
    """
    # jsonl ingest roundtrip: the Ray side exports documents to
    # sharded JSONL and reads it back through ray.data.read_json, so
    # the identity oracle hash-gates the parquet -> jsonl -> Arrow path
    oracles["ingest_jsonl"] = """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """
    oracles["ingest_csv"] = """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """
    # leakage-aware split: md5 threshold on the registrable DOMAIN so
    # templated near-dups within a domain land in one split
    oracles["domain_split"] = """
        WITH d AS (
          SELECT doc_id,
                 lower(COALESCE(source, 'nosrc')) || '.example.com'
                   AS domain
          FROM documents
        )
        SELECT doc_id, domain,
               CASE WHEN md5_number_upper(domain) % 1000 < 50
                    THEN 'test'
                    WHEN md5_number_upper(domain) % 1000 < 100
                    THEN 'val'
                    ELSE 'train' END AS split
        FROM d
    """
    # normalize_text: the oracle mirrors the planted unicode mess as a
    # closed form of the construction (decomposed combining marks via
    # chr(), NBSP, BEL, wide gaps), then applies the identical chain —
    # DuckDB's nfc_normalize composes per standard Unicode NFC (the
    # Ray side routes composition through stdlib unicodedata because
    # this pyarrow build's utf8_normalize NFC does not compose), and
    # both regexp engines are RE2 so the strip/collapse steps agree
    # byte-for-byte.
    oracles["normalize_text"] = r"""
        WITH planted AS (
          SELECT doc_id,
            text
            || CASE WHEN doc_id % 23 = 3
                    THEN ' nfc Cafe' || chr(769) ELSE '' END
            || CASE WHEN doc_id % 23 = 10
                    THEN ' ring A' || chr(778) ELSE '' END
            || CASE WHEN doc_id % 29 = 11
                    THEN ' ctl x' || chr(7) || 'y' ELSE '' END
            || CASE WHEN doc_id % 13 = 5
                    THEN ' nbsp p' || chr(160) || 'q' ELSE '' END
            || CASE WHEN doc_id % 19 = 2
                    THEN '  wide   gaps  ' ELSE '' END AS ptext
          FROM documents
        ), norm AS (
          SELECT doc_id, ptext,
            trim(regexp_replace(regexp_replace(
                replace(nfc_normalize(ptext), chr(160), ' '),
                '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
              '\s+', ' ', 'g')) AS text_norm
          FROM planted
        )
        SELECT doc_id, text_norm,
               length(ptext) AS n_before,
               length(text_norm) AS n_after,
               ptext <> text_norm AS changed
        FROM norm
    """
    # corpus_report: long-format datasheet; the dup planting is the
    # clean_corpus construction (doc_id%41 in {7,8} share one text per
    # 41-block) and the hash is md5_number_upper == hash64, so dup
    # group multiplicities are bit-identical
    oracles["corpus_report"] = r"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 41 IN (7, 8)
                      THEN 'dup page body ' || CAST(doc_id // 41 AS VARCHAR)
                      ELSE text END AS ptext
          FROM documents
        ), dup AS (
          SELECT COALESCE(SUM(c), 0) AS n_dup FROM (
            SELECT COUNT(*) AS c FROM planted
            GROUP BY md5_number_upper(ptext) HAVING COUNT(*) > 1
          )
        ), tot AS (
          SELECT COUNT(*) AS n, SUM(n_chars) AS ch FROM documents
        ), strata AS (
          SELECT 'lang' AS section, COALESCE(lang, '') AS stratum,
                 COUNT(*) AS n, SUM(n_chars) AS ch
          FROM documents GROUP BY lang
          UNION ALL
          SELECT 'source', COALESCE(source, ''), COUNT(*), SUM(n_chars)
          FROM documents GROUP BY source
        )
        SELECT 'global' AS section, 'ALL' AS stratum, 'docs' AS metric,
               CAST(n AS DOUBLE) AS value FROM tot
        UNION ALL
        SELECT 'global', 'ALL', 'chars', CAST(ch AS DOUBLE) FROM tot
        UNION ALL
        SELECT 'global', 'ALL', 'dup_doc_frac',
               ROUND(CAST(n_dup AS DOUBLE) / (SELECT n FROM tot), 6)
        FROM dup
        UNION ALL
        SELECT section, stratum, 'docs', CAST(n AS DOUBLE) FROM strata
        UNION ALL
        SELECT section, stratum, 'mean_chars',
               ROUND(CAST(ch AS DOUBLE) / n, 6) FROM strata
    """
    # incremental shard-vs-store NEAR-dup: same exact 64-perm
    # signature rebuild as minhash_lsh_pairs, over the _plant_near
    # text, restricted to (shard x base) cross-partition pairs with
    # >= 1 band agreement and est_jaccard >= 0.8
    oracles["incremental_minhash"] = f"""
        WITH perms(p, a, b) AS (VALUES {_minhash_perm_values()}),
        planted AS (
          SELECT doc_id, COALESCE(source, '') AS source,
            CASE WHEN doc_id % 20 IN (1, 2) AND (doc_id // 20) % 5 = 0
                 THEN 'hist shared ' ||
                      CAST((doc_id // 20) % 4 AS VARCHAR)
                 WHEN doc_id % 20 IN (1, 6) AND (doc_id // 20) % 5 = 1
                 THEN 'near shared ' ||
                      CAST((doc_id // 20) % 4 AS VARCHAR) ||
                      ' alpha beta gamma delta epsilon zeta eta theta' ||
                      ' iota kappa lambda mu nu xi omicron pi rho sigma' ||
                      ' tau upsilon' ||
                      CASE WHEN COALESCE(source, '') = 'src1'
                           THEN ' shardtail' ELSE '' END
                 ELSE text END AS text
          FROM documents
        ),
        toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS toks
          FROM planted
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
            END AS sh
          FROM toks
        ),
        hv AS (
          SELECT doc_id, md5_number_upper(s) AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
        ),
        sig AS (
          SELECT hv.doc_id, perms.p,
                 CAST(min((perms.a * hv.h::HUGEINT + perms.b)
                      % 18446744073709551616::HUGEINT) AS UBIGINT) AS v
          FROM hv CROSS JOIN perms GROUP BY hv.doc_id, perms.p
        ),
        sigg AS (SELECT doc_id, list(v ORDER BY p) AS sig
                 FROM sig GROUP BY doc_id),
        sigl AS (
          SELECT s.doc_id, p.source,
                 coalesce(g.sig, list_transform(range(1, 65),
                     x -> 18446744073709551615::UBIGINT)) AS sig
          FROM sh s
          JOIN planted p USING (doc_id)
          LEFT JOIN sigg g ON s.doc_id = g.doc_id
        )
        SELECT a.doc_id AS shard_doc, b.doc_id AS base_doc,
          round(CAST(len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i]))
               AS DOUBLE) / 64, 6) AS est_jaccard
        FROM sigl a JOIN sigl b
          ON a.source = 'src1' AND b.source <> 'src1'
        WHERE len(list_filter(range(0, 16),
              bnd -> a.sig[4*bnd+1] = b.sig[4*bnd+1]
                 AND a.sig[4*bnd+2] = b.sig[4*bnd+2]
                 AND a.sig[4*bnd+3] = b.sig[4*bnd+3]
                 AND a.sig[4*bnd+4] = b.sig[4*bnd+4])) > 0
          AND len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i]))
              >= 0.8 * 64
    """
    # line-level boilerplate removal: planted lines mirror
    # web_curation.py:_plant_lines; df keyed by md5_number_upper(line)
    # (== hash64, collisions collide identically); a doc losing > 30%
    # of its chars is dropped
    # Within-doc paragraph dedup: first occurrence per (doc, para),
    # order preserved — the whole op is a pure map on the Ray side.
    oracles["paragraph_dedup"] = r"""
        WITH base AS (
          SELECT doc_id,
            COALESCE(text, '') ||
            CASE WHEN doc_id % 9 = 4
                 THEN repeat(chr(10) || 'repeated promo paragraph '
                               || (doc_id % 5), 3)
                 ELSE '' END AS text
          FROM documents
        ),
        l AS (
          SELECT doc_id, unnest(range(len(ls))) AS o, unnest(ls) AS para
          FROM (SELECT doc_id, str_split(text, chr(10)) AS ls FROM base)
        ),
        f AS (SELECT doc_id, para, MIN(o) AS fo FROM l GROUP BY 1, 2),
        agg AS (SELECT doc_id, COUNT(*) AS n_paras FROM l GROUP BY 1),
        ded AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(para, chr(10) ORDER BY fo) AS clean_text
          FROM f GROUP BY 1
        )
        SELECT agg.doc_id, CAST(n_paras AS BIGINT) AS n_paras,
               CAST(n_paras - n_kept AS BIGINT) AS n_removed, clean_text
        FROM agg JOIN ded USING (doc_id)
    """
    # Host-scoped variant: df counted per (source, line) — the planted
    # per-source footers always trip it; the cross-host notice is
    # removed only on hosts where >= 2 of its docs collide.
    oracles["host_line_dedup"] = r"""
        WITH base AS (
          SELECT doc_id, source,
            COALESCE(text, '') || chr(10) ||
            '(c) footer of ' || source || chr(10) ||
            'visit ' || source || ' for more' ||
            CASE WHEN doc_id % 97 = 5 THEN chr(10) ||
              'rare cross-host migration notice' ELSE '' END AS text
          FROM documents
        ),
        l AS (
          SELECT doc_id, source, unnest(range(len(ls))) AS o,
                 unnest(ls) AS line
          FROM (SELECT doc_id, source,
                       str_split(text, chr(10)) AS ls FROM base)
        ),
        dfm AS (
          SELECT source, line, COUNT(DISTINCT doc_id) AS df
          FROM l GROUP BY 1, 2
        ),
        v AS (
          SELECT l.doc_id, l.o, l.line, length(l.line) AS len,
                 (dfm.df >= 2) AS rm
          FROM l JOIN dfm
            ON dfm.source = l.source AND dfm.line = l.line
        ),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_lines,
                 SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS n_removed_lines,
                 SUM(CASE WHEN rm THEN len ELSE 0 END) AS rm_chars,
                 SUM(len) AS tot_chars
          FROM v GROUP BY 1
        ),
        txt AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY o) AS clean_text
          FROM v WHERE NOT rm GROUP BY 1
        )
        SELECT agg.doc_id, CAST(n_lines AS BIGINT) AS n_lines,
               CAST(n_removed_lines AS BIGINT) AS n_removed_lines,
               (CASE WHEN tot_chars > 0
                     THEN rm_chars * 1.0 / tot_chars ELSE 0 END)
                 <= 0.3 AS kept,
               COALESCE(txt.clean_text, '') AS clean_text
        FROM agg LEFT JOIN txt ON txt.doc_id = agg.doc_id
    """
    oracles["line_dedup"] = r"""
        WITH base AS (
          SELECT doc_id,
            COALESCE(text, '') || chr(10) ||
            'cookie notice please accept this site uses cookies' ||
            CASE WHEN doc_id % 3 = 0 THEN chr(10) ||
              'subscribe to our newsletter for updates today'
              ELSE '' END ||
            CASE WHEN doc_id % 13 = 4 THEN chr(10) ||
              'all rights reserved contact us about advertising here' ||
              chr(10) ||
              'terms of service privacy policy and cookie settings apply' ||
              chr(10) ||
              'follow us on social media for the latest updates and news' ||
              chr(10) ||
              'copyright two thousand twenty four example media holdings llc'
              ELSE '' END AS text
          FROM documents
        ),
        l AS (
          SELECT doc_id, unnest(range(len(ls))) AS o, unnest(ls) AS line
          FROM (SELECT doc_id, str_split(text, chr(10)) AS ls FROM base)
        ),
        dfm AS (
          SELECT md5_number_upper(line) AS h,
                 COUNT(DISTINCT doc_id) AS df
          FROM l GROUP BY 1
        ),
        v AS (
          SELECT l.doc_id, l.o, l.line, length(l.line) AS len,
                 (dfm.df >= 2) AS rm
          FROM l JOIN dfm ON dfm.h = md5_number_upper(l.line)
        ),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_lines,
                 SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS n_removed_lines,
                 SUM(CASE WHEN rm THEN len ELSE 0 END) AS rm_chars,
                 SUM(len) AS tot_chars
          FROM v GROUP BY 1
        ),
        txt AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY o) AS clean_text
          FROM v WHERE NOT rm GROUP BY 1
        )
        SELECT agg.doc_id, CAST(n_lines AS BIGINT) AS n_lines,
               CAST(n_removed_lines AS BIGINT) AS n_removed_lines,
               (CASE WHEN tot_chars > 0
                     THEN rm_chars / CAST(tot_chars AS DOUBLE)
                     ELSE 0 END) <= 0.3 AS kept,
               COALESCE(txt.clean_text, '') AS clean_text
        FROM agg LEFT JOIN txt USING (doc_id)
    """
    # sliding-window chunking: K = 1 + ceil((n - size)/stride) in
    # integer math ((n - size + stride - 1) // stride); DuckDB list
    # slices are 1-based inclusive
    oracles["chunk_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        n AS (
          SELECT doc_id, toks, len(toks) AS n,
                 CASE WHEN len(toks) = 0 THEN 0
                      WHEN len(toks) <= 128 THEN 1
                      ELSE 1 + (len(toks) - 128 + 95) // 96 END AS k
          FROM t
        )
        SELECT doc_id, u.c AS chunk_ord,
               u.c * 96 AS start_tok,
               CAST(least(128, n - u.c * 96) AS BIGINT) AS n_tok,
               array_to_string(
                 toks[u.c * 96 + 1 : least(u.c * 96 + 128, n)], ' ')
                 AS chunk_text
        FROM n, unnest(range(0, k)) AS u(c)
    """
    # data-mixing sampler: integer micro-thresholds (floor(1e6*T_s/n_s))
    # and the hash_sample md5 rule — no float comparison anywhere
    oracles["mixture_sample"] = r"""
        WITH t AS (
          SELECT doc_id, COALESCE(source, '') AS source,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS n_tok
          FROM documents
        ),
        ns AS (SELECT source, SUM(n_tok) AS n_s FROM t GROUP BY 1),
        tot AS (SELECT SUM(n_s) AS total, COUNT(*) AS s FROM ns),
        th AS (
          SELECT source,
                 CASE WHEN n_s = 0 THEN 1000000
                      ELSE least(1000000, CAST(floor(
                        1000000.0 * ((SELECT total FROM tot)
                                     // (2 * (SELECT s FROM tot)))
                        / n_s) AS BIGINT)) END AS p_micro
          FROM ns
        )
        SELECT t.doc_id, t.source, CAST(t.n_tok AS BIGINT) AS n_tok,
               th.p_micro,
               md5_number_upper(CAST(t.doc_id AS VARCHAR)) % 1000000
                 < th.p_micro AS sampled
        FROM t JOIN th USING (source)
    """
    # URL curation: the normalized url is a CLOSED FORM of the planted
    # construction (pipelines/web_curation.py:_synth_raw_urls) — the
    # oracle never reimplements RFC 3986, it knows scheme/host case
    # lowers, :443 / trailing slash / #frag / utm params all vanish,
    # and only a bare ?id=N query can survive; spam count via the same
    # RE2 both sides
    oracles["url_curation"] = r"""
        WITH u AS (
          SELECT doc_id,
                 lower(COALESCE(source, 'nosrc')) || '.example.com'
                   AS domain,
                 'https://m' || CAST(doc_id % 7 AS VARCHAR) || '.' ||
                 lower(COALESCE(source, 'nosrc')) || '.example.com' ||
                 '/p/' || CAST(doc_id // 10 AS VARCHAR) ||
                 CASE WHEN doc_id % 31 = 9 THEN '-casino-bonus'
                      ELSE '' END ||
                 CASE WHEN doc_id % 17 IN (2, 3, 4)
                      THEN '?id=' || CAST(doc_id % 97 AS VARCHAR)
                      ELSE '' END AS url_norm
          FROM documents
        ),
        v AS (
          SELECT doc_id, url_norm, domain,
                 CAST(len(regexp_extract_all(url_norm, 'casino|bonus'))
                      AS BIGINT) AS spam_hits,
                 domain IN ('src3.example.com', 'src7.example.com',
                            'src11.example.com') AS blocked
          FROM u
        )
        SELECT doc_id, url_norm, domain, spam_hits, blocked,
               (NOT blocked) AND spam_hits = 0 AS keep
        FROM v
    """
    oracles["domain_stats"] = r"""
        WITH u AS (
          SELECT doc_id, COALESCE(n_chars, 0) AS n_chars,
                 lower(COALESCE(source, 'nosrc')) || '.example.com'
                   AS domain,
                 CASE WHEN doc_id % 31 = 9 THEN 1 ELSE 0 END AS spam
          FROM documents
        ),
        v AS (
          SELECT domain, n_chars,
                 CASE WHEN domain IN ('src3.example.com',
                                      'src7.example.com',
                                      'src11.example.com') THEN 0
                      WHEN spam = 1 THEN 0 ELSE 1 END AS keep
          FROM u
        )
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               round(SUM(n_chars) / CAST(COUNT(*) AS DOUBLE), 6)
                 AS mean_chars
        FROM v GROUP BY 1
    """
    # ExactSubstr dedup (Lee et al. 2022): planted passages mirror
    # pipelines/substring.py:_plant_passages; windows keyed by
    # md5_number_upper of the space-joined L=8 window (== hash64, so
    # collisions collide identically); winner = MIN(doc_id*2^20 + i);
    # a token is removed iff covered by any non-winner dup window
    oracles["substring_dedup"] = r"""
        WITH base AS (
          SELECT doc_id,
            CASE WHEN doc_id % 23 = 5 THEN COALESCE(text, '') ||
                   ' the shared boilerplate footer appears on every mirrored page here'
                 WHEN doc_id % 29 = 7 THEN COALESCE(text, '') ||
                   ' repeat block alpha beta gamma delta epsilon zeta eta' ||
                   ' repeat block alpha beta gamma delta epsilon zeta eta'
                 ELSE COALESCE(text, '') END AS text
          FROM documents
        ),
        t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM base
        ),
        p AS (
          SELECT doc_id, u.i AS i,
                 md5_number_upper(
                   array_to_string(toks[u.i + 1 : u.i + 8], ' ')) AS h,
                 doc_id * 1048576 + u.i AS packed
          FROM t, unnest(range(0, len(toks) - 7)) AS u(i)
          WHERE len(toks) >= 8
        ),
        agg AS (SELECT h, COUNT(*) AS c, MIN(packed) AS win
                FROM p GROUP BY 1),
        dup AS (
          SELECT p.doc_id, p.i
          FROM p JOIN agg USING (h)
          WHERE agg.c >= 2 AND p.packed <> agg.win
        ),
        cov AS (
          SELECT DISTINCT doc_id, i + u.k AS j
          FROM dup, unnest(range(0, 8)) AS u(k)
        ),
        tokrows AS (
          SELECT doc_id, unnest(range(len(toks))) AS j,
                 unnest(toks) AS tok
          FROM t
        ),
        keep AS (
          SELECT tr.doc_id, tr.j, tr.tok
          FROM tokrows tr
          ANTI JOIN cov ON (tr.doc_id = cov.doc_id AND tr.j = cov.j)
        )
        SELECT t.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(c.rm, 0) AS BIGINT) AS n_removed,
               COALESCE(k.txt, '') AS clean_text
        FROM t
        LEFT JOIN (SELECT doc_id, COUNT(*) AS rm FROM cov GROUP BY 1) c
          USING (doc_id)
        LEFT JOIN (SELECT doc_id,
                          string_agg(tok, ' ' ORDER BY j) AS txt
                   FROM keep GROUP BY 1) k
          USING (doc_id)
    """
    # CCNet terciles composed on the unigram-logprob oracle: per-lang
    # thresholds are the VALUES at integer ranks (n+2)//3 and
    # (2n+2)//3 of logprob ascending (ties share a value, so window
    # row_number tie order is irrelevant); >= comparisons both sides
    oracles["perplexity_buckets"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
        total AS (SELECT COUNT(*) AS total FROM tok),
        lp AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                 round(SUM(tf * ln(cnt / CAST(total.total AS DOUBLE)))
                       / SUM(tf), 6) AS logprob
          FROM tf JOIN cnt USING (token) CROSS JOIN total
          GROUP BY doc_id
        ),
        lpl AS (
          SELECT lp.doc_id, COALESCE(d.lang, '') AS lang,
                 lp.n_tokens, lp.logprob
          FROM lp JOIN documents d USING (doc_id)
        ),
        ranked AS (
          SELECT lang, logprob,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY logprob) AS r,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM lpl
        ),
        th AS (
          SELECT lang,
                 MAX(CASE WHEN r = greatest(1, (n + 2) // 3)
                     THEN logprob END) AS t1,
                 MAX(CASE WHEN r = greatest(1, (2 * n + 2) // 3)
                     THEN logprob END) AS t2
          FROM ranked GROUP BY lang
        )
        SELECT lpl.doc_id, lpl.lang, lpl.n_tokens, lpl.logprob,
               CASE WHEN lpl.logprob >= th.t2 THEN 'head'
                    WHEN lpl.logprob >= th.t1 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM lpl JOIN th USING (lang)
    """
    # Gumbel-top-k importance resampling composed on the DSIR oracle:
    # u = (md5_number_upper(doc_id)+0.5)/2^64, key = w - ln(-ln(u)),
    # rounded to 6dp BEFORE ranking (doc_id tiebreak) on both sides.
    # NOTE: dsir_logweight in the subselect is already round(...,6),
    # matching the Ray side which composes on dsir_weights' output.
    oracles["importance_resample"] = (
        "WITH dsir AS ("
        + oracles["dsir_weights"]
        + """),
        g AS (
          SELECT doc_id, dsir_logweight,
                 round(dsir_logweight
                       - ln(-ln((md5_number_upper(CAST(doc_id AS VARCHAR))
                                 + 0.5) / 18446744073709551616.0)),
                       6) AS gumbel_key
          FROM dsir
        )
        SELECT doc_id, dsir_logweight, gumbel_key FROM g
        QUALIFY row_number()
          OVER (ORDER BY gumbel_key DESC, doc_id) <= 50
        """
    )
    # PageRank over the symmetrised supplier<->part bipartite graph
    # (suppliers at node 2s, parts at 2p+1); 3 synchronous sweeps,
    # d=0.85, r0 = 1/N. Symmetric edges => no dangling term and every
    # node receives mass each sweep.
    _pr_sweep = """
        SELECT es.dst AS node,
               0.15 / (SELECT n FROM nn)
                 + 0.85 * SUM({prev}.r / deg.d) AS r
        FROM es
        JOIN {prev} ON es.src = {prev}.node
        JOIN deg ON es.src = deg.node
        GROUP BY 1
    """
    oracles["pagerank"] = (
        """
        WITH e0 AS (
          SELECT DISTINCT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst
          FROM lineitem
        ),
        es AS (
          SELECT src, dst FROM e0
          UNION ALL
          SELECT dst AS src, src AS dst FROM e0
        ),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM es GROUP BY 1),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM deg),
        r1 AS (""" + _pr_sweep.format(prev="r0") + """),
        r2 AS (""" + _pr_sweep.format(prev="r1") + """),
        r3 AS (""" + _pr_sweep.format(prev="r2") + """)
        SELECT node, round(r, 6) AS pagerank FROM r3
        """
    )
    # Mojibake repair: the Ray side genuinely round-trips the planted
    # UTF-8-as-Latin-1 text back through latin-1 -> utf-8; the oracle
    # is the closed form of the planting (repair(break(x)) == x).
    oracles["fix_mojibake"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 2
                    THEN 'café — naïve résumé: ' || text
                    ELSE text END AS text_fixed,
               doc_id % 6 = 2 AS was_mojibake
        FROM documents
    """
    # Head-section metadata: the Ray side regex-parses the planted
    # <head> block (sources/pages.py:pages_with_metadata); the oracle
    # is the closed form of the planting.
    oracles["page_metadata"] = """
        SELECT 'https://site' || (doc_id % 5) || '.example/d/'
                 || doc_id AS url,
               'Title ' || doc_id AS title,
               CASE WHEN doc_id % 3 != 0
                    THEN 'Summary of doc ' || doc_id END AS description,
               CASE WHEN doc_id % 4 = 1
                    THEN 'https://canon.example/c/' || doc_id
               END AS canonical,
               CASE WHEN doc_id % 5 IN (0, 2)
                    THEN 'OG ' || doc_id END AS og_title,
               doc_id % 11 = 7 AS noindex
        FROM documents
    """
    # Heading hierarchy: rows generated in (j, k) section order, ord =
    # row_number per doc; breadcrumb paths rebuilt level by level.
    oracles["html_outline"] = """
        WITH h AS (
          SELECT doc_id, 0 AS j, 0 AS k, 1 AS level,
                 'Doc ' || doc_id AS heading
          FROM documents
          UNION ALL
          SELECT doc_id, j, 0, 2, 'S' || j
          FROM documents, UNNEST(range(1, 2 + doc_id % 3)) AS t(j)
          UNION ALL
          SELECT doc_id, j, k, 3, 'S' || j || '.' || k
          FROM documents,
               UNNEST(range(1, 2 + doc_id % 3)) AS t(j),
               UNNEST(range(1, 1 + (doc_id + j) % 3)) AS s(k)
        )
        SELECT 'https://site' || (doc_id % 5) || '.example/d/'
                 || doc_id AS url,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY j, k) AS ord,
               CAST(level AS BIGINT) AS level, heading,
               CASE level
                 WHEN 1 THEN heading
                 WHEN 2 THEN 'Doc ' || doc_id || ' > ' || heading
                 ELSE 'Doc ' || doc_id || ' > S' || j || ' > ' || heading
               END AS path
        FROM h
    """
    # Index export: noindex policy -> canonical collapse (winner = min
    # doc_id) -> whitespace-normalized extraction text (the metadata
    # fixture wraps the whole doc text in one <p>, so the extractor's
    # closed form is trim + collapse).
    oracles["index_export"] = r"""
        WITH meta AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 'Title ' || doc_id AS title,
                 CASE WHEN doc_id % 4 = 1
                      THEN 'https://canon.example/c/' || (doc_id % 50)
                      ELSE 'https://site' || (doc_id % 5)
                             || '.example/d/' || doc_id
                 END AS collapse_key
          FROM documents
          WHERE doc_id % 11 <> 7
        ),
        g AS (
          SELECT collapse_key, MIN(doc_id) AS wid, COUNT(*) AS n
          FROM meta GROUP BY 1
        )
        SELECT m.url, m.title, m.collapse_key,
               CAST(g.n AS BIGINT) AS n_members,
               trim(regexp_replace(d.text, '\s+', ' ', 'g'))
                 AS extracted_text
        FROM meta m
        JOIN g ON g.collapse_key = m.collapse_key AND g.wid = m.doc_id
        JOIN documents d ON d.doc_id = m.doc_id
    """
    # Template detection: the opening-tag sequence of the metadata
    # fixture is a closed form of the four presence flags; the oracle
    # md5s the same comma-joined sequence.
    oracles["html_structure_groups"] = """
        WITH s AS (
          SELECT md5('html,head,title,meta'
                 || CASE WHEN doc_id % 3 != 0 THEN ',meta' ELSE '' END
                 || CASE WHEN doc_id % 4 = 1 THEN ',link' ELSE '' END
                 || CASE WHEN doc_id % 5 IN (0, 2) THEN ',meta'
                         ELSE '' END
                 || CASE WHEN doc_id % 11 = 7 THEN ',meta' ELSE '' END
                 || ',body,p') AS structure_md5
          FROM documents
        )
        SELECT structure_md5, CAST(COUNT(*) AS BIGINT) AS n_pages
        FROM s GROUP BY 1
    """
    # Sitemap-seeded frontier: a loc is already crawled only when it
    # equals an existing doc's REAL url — host matches only at i = 5
    # (t % 5 == doc_id % 5 iff i % 5 == 0), and the target must exist.
    oracles["sitemap_frontier"] = """
        SELECT 'https://site' || (doc_id % 5) || '.example/d/'
                 || (doc_id + i) AS loc,
               '2024-01-' || printf('%02d', 1 + (doc_id + i) % 28)
                 AS lastmod,
               i / 10.0 AS priority
        FROM documents, UNNEST(range(1, 6)) AS t(i)
        WHERE doc_id % 10 = 0
          AND NOT (i = 5 AND EXISTS (
                SELECT 1 FROM documents d2
                WHERE d2.doc_id = documents.doc_id + 5))
    """
    # Sitemap harvest: 5 planted <url> entries per doc_id % 10 == 0.
    oracles["sitemap_urls"] = """
        SELECT 'https://site' || (doc_id % 5) || '.example/sitemap'
                 || doc_id || '.xml' AS sitemap_url,
               CAST(i AS BIGINT) AS ord,
               'https://site' || (doc_id % 5) || '.example/d/'
                 || (doc_id + i) AS loc,
               '2024-01-' || printf('%02d', 1 + (doc_id + i) % 28)
                 AS lastmod,
               i / 10.0 AS priority
        FROM documents, UNNEST(range(1, 6)) AS t(i)
        WHERE doc_id % 10 = 0
    """
    # Canonical collapse: groups keyed by the extracted canonical
    # target (shared_canonical planting: c/{doc_id % 50} for
    # doc_id % 4 == 1), winner = earliest capture = min doc_id.
    oracles["canonical_collapse"] = """
        WITH meta AS (
          SELECT doc_id,
                 'https://site' || (doc_id % 5) || '.example/d/'
                   || doc_id AS url,
                 CASE WHEN doc_id % 4 = 1
                      THEN 'https://canon.example/c/' || (doc_id % 50)
                      ELSE 'https://site' || (doc_id % 5)
                             || '.example/d/' || doc_id
                 END AS collapse_key
          FROM documents
        ),
        g AS (
          SELECT collapse_key, MIN(doc_id) AS wid, COUNT(*) AS n
          FROM meta GROUP BY 1
        )
        SELECT m.url, m.collapse_key, CAST(g.n AS BIGINT) AS n_members
        FROM meta m
        JOIN g ON g.collapse_key = m.collapse_key AND g.wid = m.doc_id
    """
    # Capture change rate: the Ray side hashes each capture's html and
    # run-scans consecutive hashes per url; the oracle counts the
    # planted change points ((doc_id + k) % 3 == 0) directly.
    oracles["capture_change_rate"] = """
        WITH p AS (SELECT doc_id, 1 + doc_id % 4 AS n FROM documents),
        c AS (
          SELECT doc_id, n,
                 (SELECT COUNT(*) FROM UNNEST(range(1, n)) AS t(k)
                  WHERE (doc_id + k) % 3 = 0) AS ch
          FROM p
        )
        SELECT 'https://site' || (doc_id % 5) || '.example/d/'
                 || doc_id AS url,
               CAST(n AS BIGINT) AS n_captures,
               CAST(ch AS BIGINT) AS n_changes,
               CASE WHEN n > 1
                    THEN round(ch / (n - 1.0), 6) END AS change_rate
        FROM c
    """
    # HTML table grid: the Ray side runs the standard layout algorithm
    # (first free column + rowspan occupancy) over planted markup; the
    # oracle rebuilds the same anchors as CASE closed forms — row 1's
    # colspan shifts later tds right by 1, row 3 under an open rowspan
    # starts at col 1, and each spanned row is written one td short.
    oracles["html_tables"] = """
        WITH p AS (
          SELECT doc_id,
                 2 + doc_id % 2 AS ncols,
                 2 + doc_id % 3 AS nr,
                 doc_id % 5 = 0 AS cs,
                 (doc_id % 7 = 2 AND 2 + doc_id % 3 >= 3) AS rs
          FROM documents
        ),
        hdr AS (
          SELECT doc_id, 0 AS r, c, 1 AS rowspan, 1 AS colspan,
                 true AS header, 'C' || c AS text
          FROM p, UNNEST(range(0, ncols)) AS t(c)
        ),
        dat AS (
          SELECT doc_id, r,
                 CASE WHEN r = 1 AND cs THEN
                        CASE WHEN k = 0 THEN 0 ELSE k + 1 END
                      WHEN r = 3 AND rs THEN k + 1
                      ELSE k END AS c,
                 CASE WHEN r = 2 AND rs AND k = 0 THEN 2 ELSE 1
                   END AS rowspan,
                 CASE WHEN r = 1 AND cs AND k = 0 THEN 2 ELSE 1
                   END AS colspan,
                 false AS header,
                 'v' || doc_id || '.' || r || '.' || k AS text
          FROM p,
               UNNEST(range(1, nr + 1)) AS t(r),
               UNNEST(range(0, ncols)) AS s(k)
          WHERE k < ncols
                  - (CASE WHEN r = 1 AND cs THEN 1 ELSE 0 END)
                  - (CASE WHEN r = 3 AND rs THEN 1 ELSE 0 END)
        )
        SELECT 'https://site' || (doc_id % 5) || '.example/d/'
                 || doc_id AS url,
               CAST(r AS BIGINT) AS "row", CAST(c AS BIGINT) AS col,
               CAST(rowspan AS BIGINT) AS rowspan,
               CAST(colspan AS BIGINT) AS colspan, header, text
        FROM (SELECT * FROM hdr UNION ALL SELECT * FROM dat)
    """
    oracles["pagerank_cogroup"] = oracles["pagerank"]
    oracles["degree_stats"] = """
        WITH e0 AS (
          SELECT DISTINCT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst
          FROM lineitem
        ),
        es AS (
          SELECT src, dst FROM e0
          UNION ALL
          SELECT dst AS src, src AS dst FROM e0
        ),
        deg AS (SELECT src AS node, COUNT(*) AS d FROM es GROUP BY 1)
        SELECT CAST(d AS BIGINT) AS deg,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY 1
    """
    # ANALYZE-style profile: min/max computed on the NATIVE type then
    # stringified (matches the pipeline's pc.min_max-then-str rule;
    # string comparisons agree because the corpus is pure ASCII —
    # same assumption the rolling-fingerprint oracle documents)
    oracles["column_profile"] = " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str,
               round(avg(length(CAST({c} AS VARCHAR))), 6) AS avg_len
        FROM documents"""
        for c in ("doc_id", "lang", "n_chars", "source", "text")
    )
    # script composition: planted Cyrillic/CJK/Greek mirrored as the
    # same closed-form appends; length() counts codepoints on both
    # sides (everything planted is BMP, no astral chars)
    oracles["script_mix"] = r"""
        WITH p AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 13 = 4
                    THEN ' Пример русского текста номер ' || doc_id || '.'
                    ELSE '' END
            || CASE WHEN doc_id % 17 = 6
                    THEN ' 中文样本文档' || doc_id || '号' ELSE '' END
            || CASE WHEN doc_id % 19 = 3
                    THEN ' Ελληνικό δείγμα ' || doc_id ELSE '' END
            AS planted
          FROM documents
        ), c AS (
          SELECT doc_id, length(planted) AS n_chars,
            CAST(len(regexp_extract_all(planted, '[A-Za-z]'))
                 AS BIGINT) AS n_latin,
            CAST(len(regexp_extract_all(planted, '[\x{0400}-\x{04FF}]'))
                 AS BIGINT) AS n_cyrillic,
            CAST(len(regexp_extract_all(planted, '[\x{0370}-\x{03FF}]'))
                 AS BIGINT) AS n_greek,
            CAST(len(regexp_extract_all(planted, '[\x{4E00}-\x{9FFF}]'))
                 AS BIGINT) AS n_cjk,
            CAST(len(regexp_extract_all(planted, '[0-9]'))
                 AS BIGINT) AS n_digit
          FROM p
        )
        SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
               n_digit,
               CASE WHEN n_chars = 0 THEN 0.0
                    ELSE round(CAST(n_cyrillic + n_greek + n_cjk AS DOUBLE)
                               / n_chars, 6)
               END AS frac_non_latin
        FROM c
    """
    # Dolma-style tagger: token count + rounded quality + language
    # agreement, composed from the token_counts / quality_scores /
    # language_id oracle fragments (nested-CTE composition pattern)
    _attr_cte = f"""
        tok AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS n_ws_tokens
          FROM documents
        ),
        qt AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '') AS toks,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS ltoks,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
          FROM documents
        ),
        qf AS (
          SELECT doc_id, n_chars, len(toks) AS n_tokens,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                           AS DOUBLE) / len(toks)
            END AS mwl,
            CASE WHEN n_chars = 0 THEN 0.0
                 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS pr,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(ltoks, x -> x IN ({_STOP_EN})))
                           AS DOUBLE) / len(toks)
            END AS sr
          FROM qt
        ),
        qs AS (
          SELECT doc_id,
            round(0.4 * least(1.0, n_tokens / 50.0)
                  + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0
                                THEN 1.0 ELSE 0.5 END)
                  + 0.2 * least(1.0, sr * 5.0)
                  + 0.2 * (1.0 - least(1.0,
                                       greatest(0.0, pr - 0.2) * 2.0)),
                  6) AS quality
          FROM qf
        ),
        lw AS (
          SELECT doc_id, lang,
                 list_distinct(list_filter(
                     regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> ''
                 )) AS words
          FROM documents
        ),
        lh AS (
          SELECT doc_id, lang, len(words) AS nw,
            len(list_filter(words, x -> x IN ('der','die','das','und','ist','ich','nicht','sie','mit','ein','zu','den','von'))) AS hde,
            len(list_filter(words, x -> x IN ({_STOP_EN}))) AS hen,
            len(list_filter(words, x -> x IN ('el','la','los','las','de','y','un','una','es','en','no','que','por','para'))) AS hes,
            len(list_filter(words, x -> x IN ('le','la','les','de','et','un','une','est','je','pas','pour','que','dans'))) AS hfr,
            len(list_filter(words, x -> x IN ('il','lo','la','gli','le','di','e','un','una','è','che','non','per','con'))) AS hit
          FROM lw
        ),
        ld AS (
          SELECT doc_id,
            (CASE WHEN nw = 0 OR greatest(hde,hen,hes,hfr,hit) = 0
                  THEN 'und'
                  WHEN hde >= hen AND hde >= hes AND hde >= hfr
                       AND hde >= hit THEN 'de'
                  WHEN hen >= hes AND hen >= hfr AND hen >= hit THEN 'en'
                  WHEN hes >= hfr AND hes >= hit THEN 'es'
                  WHEN hfr >= hit THEN 'fr'
                  ELSE 'it' END = lang) AS lang_agrees
          FROM lh
        )
    """
    oracles["tag_attributes"] = f"""
        WITH {_attr_cte}
        SELECT tok.doc_id, tok.n_ws_tokens, qs.quality, ld.lang_agrees
        FROM tok JOIN qs USING (doc_id) JOIN ld USING (doc_id)
    """
    # mixer verdict over the SAME rounded attribute values; precedence
    # too_short > low_quality > lang_mismatch > keep
    oracles["mix_attributes"] = f"""
        WITH {_attr_cte},
        a AS (
          SELECT tok.doc_id, tok.n_ws_tokens, qs.quality, ld.lang_agrees
          FROM tok JOIN qs USING (doc_id) JOIN ld USING (doc_id)
        )
        SELECT a.doc_id, d.n_chars,
               CASE WHEN a.n_ws_tokens < 20 THEN 'too_short'
                    WHEN a.quality < 0.7 THEN 'low_quality'
                    WHEN NOT a.lang_agrees THEN 'lang_mismatch'
                    ELSE 'keep' END AS reason,
               (reason = 'keep') AS keep
        FROM a JOIN documents d USING (doc_id)
    """
    # margin-based bitext mining: ratio margin over mean top-4
    # neighborhoods, mutual-best via two row_number windows; ulp-level
    # float differences (duckdb cosine vs numpy normalized matmul)
    # wash out in the 6dp round, same as embedding_neardup_pairs
    oracles["bitext_mine"] = """
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        a AS (SELECT vec_id, e FROM n WHERE vec_id % 2 = 0),
        b AS (SELECT vec_id, e FROM n WHERE vec_id % 2 = 1),
        s AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                     list_cosine_similarity(a.e, b.e) AS c
              FROM a, b),
        tka AS (SELECT ai, avg(c) AS tk FROM (
                  SELECT ai, c, row_number() OVER (
                      PARTITION BY ai ORDER BY c DESC) AS r FROM s
                ) WHERE r <= 4 GROUP BY ai),
        tkb AS (SELECT bi, avg(c) AS tk FROM (
                  SELECT bi, c, row_number() OVER (
                      PARTITION BY bi ORDER BY c DESC) AS r FROM s
                ) WHERE r <= 4 GROUP BY bi),
        m AS (SELECT s.ai, s.bi, s.c / ((tka.tk + tkb.tk) / 2) AS margin
              FROM s JOIN tka USING (ai) JOIN tkb USING (bi)),
        fb AS (SELECT ai, bi, margin, row_number() OVER (
                   PARTITION BY ai ORDER BY margin DESC, bi ASC) AS r
               FROM m),
        bb AS (SELECT ai, bi, row_number() OVER (
                   PARTITION BY bi ORDER BY margin DESC, ai ASC) AS r
               FROM m)
        SELECT fb.ai AS src_id, fb.bi AS tgt_id,
               round(fb.margin, 6) AS margin
        FROM fb JOIN bb ON fb.ai = bb.ai AND fb.bi = bb.bi
        WHERE fb.r = 1 AND bb.r = 1 AND fb.margin >= 1.06
    """
    oracles["bitext_mine_sharded"] = oracles["bitext_mine"]
    # compaction is a pure storage rewrite: read-back must equal the
    # extraction itself (the parse_wet hash-gate pattern)
    oracles["compact_store"] = oracles["extract_docs_text"]
    # histogram sketch estimator rebuilt bin-for-bin: first bin whose
    # cumulative count reaches q*n, interpolated with the SAME float
    # op order as the pipeline
    oracles["histogram_quantiles"] = """
        WITH c AS (
          SELECT least(CAST(n_chars // 16 AS INT), 64) AS bin,
                 count(*) AS cnt
          FROM documents GROUP BY 1
        ),
        t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c),
        cum AS (SELECT bin, cnt,
                       sum(cnt) OVER (ORDER BY bin) AS cum FROM c),
        qv(q) AS (VALUES (0.25), (0.5), (0.75), (0.9)),
        sel AS (
          SELECT qv.q, cum.bin, cum.cnt, cum.cum,
                 row_number() OVER (
                     PARTITION BY qv.q ORDER BY cum.bin) AS r
          FROM qv JOIN cum
            ON CAST(cum.cum AS DOUBLE) >= qv.q * (SELECT n FROM t)
        )
        SELECT q, round(bin * 16.0
                        + 16.0 * (q * (SELECT n FROM t)
                                  - CAST(cum - cnt AS DOUBLE))
                          / CAST(cnt AS DOUBLE), 6) AS value
        FROM sel WHERE r = 1
    """
    # per-paragraph language ID: newline explode (ordinal via the
    # range-unnest idiom) + the language_id detection CASE per
    # paragraph, over the same closed-form stopword-line plants
    oracles["paragraph_langs"] = f"""
        WITH p AS (
          SELECT doc_id, lang, text
            || CASE WHEN doc_id % 7 = 2 THEN chr(10) ||
                 'der und die das ist nicht ein von mit zu' ELSE '' END
            || CASE WHEN doc_id % 11 = 5 THEN chr(10) ||
                 'le la les et un une est pour dans pas' ELSE '' END
            || CASE WHEN doc_id % 13 = 8 THEN chr(10) ||
                 'el la los las de y un una es en no que' ELSE '' END
            AS planted
          FROM documents
        ),
        sp AS (SELECT doc_id, lang,
                      regexp_split_to_array(planted, chr(10)) AS parts
               FROM p),
        e AS (
          SELECT doc_id, lang, CAST(u.ord AS BIGINT) AS para_ord,
                 parts[u.ord + 1] AS para
          FROM sp, unnest(range(0, len(parts))) AS u(ord)
        ),
        w AS (
          SELECT doc_id, lang, para_ord,
                 list_distinct(list_filter(
                     regexp_split_to_array(lower(para), '\\s+'),
                     x -> x <> '')) AS words
          FROM e
        ),
        h AS (
          SELECT doc_id, lang, para_ord, len(words) AS nw,
            len(list_filter(words, x -> x IN ('der','die','das','und','ist','ich','nicht','sie','mit','ein','zu','den','von'))) AS hde,
            len(list_filter(words, x -> x IN ({_STOP_EN}))) AS hen,
            len(list_filter(words, x -> x IN ('el','la','los','las','de','y','un','una','es','en','no','que','por','para'))) AS hes,
            len(list_filter(words, x -> x IN ('le','la','les','de','et','un','une','est','je','pas','pour','que','dans'))) AS hfr,
            len(list_filter(words, x -> x IN ('il','lo','la','gli','le','di','e','un','una','è','che','non','per','con'))) AS hit
          FROM w
        )
        SELECT doc_id, para_ord,
          CASE WHEN nw = 0 OR greatest(hde,hen,hes,hfr,hit) = 0 THEN 'und'
               WHEN hde >= hen AND hde >= hes AND hde >= hfr
                    AND hde >= hit THEN 'de'
               WHEN hen >= hes AND hen >= hfr AND hen >= hit THEN 'en'
               WHEN hes >= hfr AND hes >= hit THEN 'es'
               WHEN hfr >= hit THEN 'fr'
               ELSE 'it' END AS para_lang,
          lang AS doc_lang,
          (para_lang <> lang) AS differs
        FROM h
    """
    # Merkle fingerprint: leaf = md5 of doc digests in doc_id order,
    # root = md5 of leaf digests in shard order (shard = -1 row)
    oracles["dataset_fingerprint"] = """
        WITH d AS (
          SELECT doc_id % 16 AS shard, doc_id, md5(text) AS h
          FROM documents
        ),
        l AS (
          SELECT CAST(shard AS BIGINT) AS shard,
                 md5(string_agg(h, '' ORDER BY doc_id)) AS node_md5,
                 count(*) AS n_docs
          FROM d GROUP BY shard
        ),
        r AS (
          SELECT CAST(-1 AS BIGINT) AS shard,
                 md5(string_agg(node_md5, '' ORDER BY shard)) AS node_md5,
                 CAST(sum(n_docs) AS BIGINT) AS n_docs
          FROM l
        )
        SELECT shard, node_md5, n_docs FROM l
        UNION ALL
        SELECT shard, node_md5, n_docs FROM r
    """
    # triangles of the mod-40 contracted supplier/part graph; the
    # three-way self-join counts each triangle once (u < v < w order)
    oracles["triangle_count"] = """
        WITH e0 AS (
          SELECT DISTINCT least(l_suppkey % 40, l_partkey % 40) AS u,
                          greatest(l_suppkey % 40, l_partkey % 40) AS v
          FROM lineitem WHERE l_suppkey % 40 <> l_partkey % 40
        )
        SELECT (SELECT count(DISTINCT n) FROM
                  (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0))
                 AS n_nodes,
               (SELECT count(*) FROM e0) AS n_edges,
               (SELECT count(*) FROM e0 a
                  JOIN e0 b ON b.u = a.u AND b.v > a.v
                  JOIN e0 c ON c.u = a.v AND c.v = b.v) AS n_triangles
    """
    oracles["triangle_count_cogroup"] = oracles["triangle_count"]
    # per-node local clustering coefficient over the same contracted
    # graph: the triple self-join enumerates each triangle once
    # (a<b<c via the two-smaller-join pattern), UNION ALL credits all
    # three corners, coeff closes in the same float op order
    oracles["clustering_coefficient"] = """
        WITH e0 AS (
          SELECT DISTINCT least(l_suppkey % 40, l_partkey % 40) AS u,
                          greatest(l_suppkey % 40, l_partkey % 40) AS v
          FROM lineitem WHERE l_suppkey % 40 <> l_partkey % 40
        ),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
          ) GROUP BY node
        ),
        tri AS (
          SELECT a.u AS x, a.v AS y, b.v AS z
          FROM e0 a
            JOIN e0 b ON b.u = a.u AND b.v > a.v
            JOIN e0 c ON c.u = a.v AND c.v = b.v
        ),
        pern AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) GROUP BY node
        )
        SELECT d.node, d.deg,
               CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
               CASE WHEN d.deg >= 2
                    THEN round(2.0 * CAST(COALESCE(p.t, 0) AS DOUBLE)
                               / (CAST(d.deg AS DOUBLE)
                                  * (d.deg - 1.0)), 6)
                    ELSE NULL END AS clustering_coeff
        FROM deg d LEFT JOIN pern p ON p.node = d.node
        ORDER BY d.node
    """
    oracles["clustering_coefficient_cogroup"] = oracles[
        "clustering_coefficient"
    ]
    # degree assortativity: exact int64 moment sums over both edge
    # orientations; the Pearson close mirrors the Ray side's float
    # op order term for term
    oracles["degree_assortativity"] = """
        WITH e0 AS (
          SELECT DISTINCT least(l_suppkey % 40, l_partkey % 40) AS u,
                          greatest(l_suppkey % 40, l_partkey % 40) AS v
          FROM lineitem WHERE l_suppkey % 40 <> l_partkey % 40
        ),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
          ) GROUP BY node
        ),
        p AS (
          SELECT d1.deg AS x, d2.deg AS y
          FROM e0 JOIN deg d1 ON d1.node = e0.u
                  JOIN deg d2 ON d2.node = e0.v
          UNION ALL
          SELECT d2.deg, d1.deg
          FROM e0 JOIN deg d1 ON d1.node = e0.u
                  JOIN deg d2 ON d2.node = e0.v
        ),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM p
        )
        SELECT n AS n_edge_ends,
               CASE WHEN n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE)),
                         6)
                    ELSE NULL END AS assortativity
        FROM m
    """
    # Z-order layout plan: the Morton interleave is spelled out term
    # by term (bit j of xq at 2j, of yq at 2j+1) — identical bit
    # algebra to profiling._interleave_bits; quantization is integer
    # floor division over the occupied band on both sides, so every
    # reported stat is an exact int64
    _z_terms = " + ".join(
        f"(((xq >> {j}) & 1) << {2 * j})"
        f" + (((yq >> {j}) & 1) << {2 * j + 1})"
        for j in range(8)
    )
    oracles["zorder_layout"] = f"""
        WITH b AS (SELECT user_id AS x,
                          CAST(round(value * 100) AS BIGINT) AS y
                   FROM events),
        mm AS (SELECT MIN(x) AS minx, MAX(x) AS maxx,
                      MIN(y) AS miny, MAX(y) AS maxy FROM b),
        q AS (SELECT x, y,
                     (x - minx) * 256 // (maxx - minx + 1) AS xq,
                     (y - miny) * 256 // (maxy - miny + 1) AS yq
              FROM b CROSS JOIN mm),
        z AS (SELECT x, y, ({_z_terms}) >> 10 AS zpart FROM q)
        SELECT zpart, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(x) AS min_user, MAX(x) AS max_user,
               MIN(y) AS min_cents, MAX(y) AS max_cents
        FROM z GROUP BY zpart ORDER BY zpart
    """
    oracles["zorder_layout_grouped"] = oracles["zorder_layout"]
    oracles["q18_big_orders"] = """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
        )
        SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, big.sum_qty
        FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """
    # watermark lateness over the planted out-of-order arrival
    # (events with event_id%17==3 arrive 1000 sequence slots late)
    oracles["late_event_stats"] = """
        WITH a AS (
          SELECT user_id, event_id, ts,
                 event_id + CASE WHEN event_id % 17 = 3
                                 THEN 1000 ELSE 0 END AS arrival_key
          FROM events
        ), w AS (
          SELECT user_id, ts,
                 max(ts) OVER (PARTITION BY user_id
                               ORDER BY arrival_key, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS hwm
          FROM a
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CASE WHEN ts < hwm - INTERVAL 3600 SECOND
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM w GROUP BY user_id
    """
    # skew report buckets use the engine's own md5 hash64
    # (== md5_number_upper), so the SQL rebuild is the REAL placement
    oracles["partition_skew_report"] = " UNION ALL ".join(
        f"""
        SELECT '{k}' AS part_key, count(DISTINCT b) AS n_buckets_used,
               max(cnt) AS max_rows,
               round(sum(cnt) / 64.0, 6) AS avg_rows,
               round(max(cnt) / (sum(cnt) / 64.0), 6) AS skew_ratio
        FROM (SELECT md5_number_upper(CAST({k} AS VARCHAR)) % 64 AS b,
                     count(*) AS cnt
              FROM documents GROUP BY 1)"""
        for k in ("doc_id", "lang", "source")
    )
    # z-score outliers: per-dim moments rebuilt by unnest + avg; ulp
    # differences (streaming avg vs register fold) wash out in the
    # 6dp round, order decided pre-round on continuous values
    oracles["embedding_outliers"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) emb FROM embeddings
        ),
        x AS (SELECT vec_id, CAST(u.ord AS INT) dim, emb[u.ord + 1] AS x
              FROM e, unnest(range(0, len(emb))) u(ord)),
        s AS (SELECT dim, avg(x) mu,
                     sqrt(greatest(avg(x*x) - avg(x)*avg(x), 0.0)) sigma
              FROM x GROUP BY 1),
        z AS (SELECT vec_id,
                     max(abs(x - mu) /
                         (CASE WHEN sigma = 0 THEN 1 ELSE sigma END)) zmax
              FROM x JOIN s USING (dim) GROUP BY 1)
        SELECT vec_id, round(zmax, 6) AS z
        FROM z ORDER BY zmax DESC, vec_id LIMIT 10
    """
    # grouped histogram sketch: the histogram_quantiles estimator
    # partitioned by lang
    oracles["lang_histogram_quantiles"] = """
        WITH c AS (
          SELECT lang, least(CAST(n_chars // 16 AS INT), 64) bin,
                 count(*) cnt
          FROM documents GROUP BY 1, 2
        ),
        t AS (SELECT lang, CAST(sum(cnt) AS DOUBLE) n FROM c GROUP BY 1),
        cum AS (SELECT lang, bin, cnt,
                       sum(cnt) OVER (PARTITION BY lang ORDER BY bin) cum
                FROM c),
        qv(q) AS (VALUES (0.25), (0.5), (0.75), (0.9)),
        sel AS (SELECT qv.q, cum.lang, bin, cnt, cum,
                       row_number() OVER (
                           PARTITION BY qv.q, cum.lang ORDER BY bin) r
                FROM qv JOIN cum ON CAST(cum AS DOUBLE) >=
                     qv.q * (SELECT n FROM t WHERE t.lang = cum.lang))
        SELECT lang, q,
               round(bin * 16.0
                     + 16.0 * (q * (SELECT n FROM t
                                    WHERE t.lang = sel.lang)
                               - CAST(cum - cnt AS DOUBLE))
                       / CAST(cnt AS DOUBLE), 6) AS value
        FROM sel WHERE r = 1
    """
    # vocabulary-bounded PMI over document frequencies; pair
    # orientation = string order (vocab matrix is token-sorted)
    oracles["pmi_pairs"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        v AS (SELECT token FROM (
                SELECT token, count(*) cnt FROM tok GROUP BY 1
                ORDER BY cnt DESC, token LIMIT 64)),
        p AS (SELECT DISTINCT doc_id, token FROM tok JOIN v USING (token)),
        n AS (SELECT count(*) AS nd FROM documents),
        cx AS (SELECT token, count(*) c FROM p GROUP BY 1),
        cxy AS (SELECT a.token AS ta, b.token AS tb, count(*) c
                FROM p a JOIN p b
                  ON a.doc_id = b.doc_id AND a.token < b.token
                GROUP BY 1, 2),
        pm AS (SELECT ta, tb, cxy.c AS c_xy,
                      ln(CAST(cxy.c AS DOUBLE) * (SELECT nd FROM n)
                         / (ca.c * cb.c)) AS pmi
               FROM cxy JOIN cx ca ON ca.token = cxy.ta
                        JOIN cx cb ON cb.token = cxy.tb
               WHERE cxy.c >= 5)
        SELECT ta AS token_a, tb AS token_b,
               CAST(c_xy AS BIGINT) AS n_docs_xy, round(pmi, 6) AS pmi
        FROM pm ORDER BY pmi DESC, token_a, token_b LIMIT 25
    """
    # zero-filled hourly resample: generate-series join per user span
    oracles["events_gap_fill"] = """
        WITH e AS (SELECT user_id, date_trunc('hour', ts) h FROM events),
        b AS (SELECT user_id, min(h) h0, max(h) h1 FROM e GROUP BY 1),
        g AS (SELECT user_id, h0 + u.x * INTERVAL 1 HOUR AS hour
              FROM b, unnest(range(0,
                   CAST(date_diff('hour', h0, h1) AS BIGINT) + 1)) u(x)),
        c AS (SELECT user_id, h, count(*) n FROM e GROUP BY 1, 2)
        SELECT g.user_id, g.hour,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM g LEFT JOIN c ON c.user_id = g.user_id AND c.h = g.hour
    """
    # bulk kNN graph: per-vector top-5 neighbors, ranked; ulp-level
    # cosine differences wash out in round-6 (knn_brute precedent)
    oracles["knn_graph"] = """
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings
        ),
        s AS (SELECT a.vec_id ai, b.vec_id bi,
                     list_cosine_similarity(a.e, b.e) c
              FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        r AS (SELECT ai, bi, c, row_number() OVER (
                  PARTITION BY ai ORDER BY c DESC, bi) rnk FROM s)
        SELECT ai AS vec_id, bi AS neighbor_id, round(c, 6) AS cosine,
               CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= 5
    """
    oracles["knn_graph_sharded"] = oracles["knn_graph"]
    # hard-negative mining: top-1 different-label cosine neighbor;
    # rounding to 6dp happens BEFORE rank selection on both sides so
    # the tie-break is deterministic and identical
    oracles["hard_negatives"] = """
        WITH n AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        s AS (SELECT a.vec_id, b.vec_id AS neg_id,
                     round(list_cosine_similarity(a.e, b.e), 6) AS cosine
              FROM n a JOIN n b ON a.label <> b.label)
        SELECT vec_id, neg_id, cosine FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, neg_id) AS rn
          FROM s) WHERE rn = 1 ORDER BY vec_id
    """
    oracles["hard_negatives_sharded"] = oracles["hard_negatives"]
    # TPC-H widening family (pipelines/analytics.py). Money sums use
    # DECIMAL casts (exact 2-decimal data) mirrored by int64-cents
    # arithmetic on the Ray side; count aggregates use count(CASE...)
    # so DuckDB returns BIGINT (a HUGEINT sum would land as float64 in
    # pandas and break the value hash).
    oracles["q4_order_priority"] = """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """
    oracles["q6_forecast_revenue"] = """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """
    oracles["q7_nation_volume"] = """
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(vol) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l.l_shipdate) AS l_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        ) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """
    oracles["q10_returned_items"] = """
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue,
               c.c_acctbal, n.n_name
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - l.l_discount AS DECIMAL(18,2))) DESC,
                 c.c_custkey ASC
        LIMIT 20
    """
    oracles["q12_priority_lines"] = """
        SELECT l.l_returnflag,
               count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """
    # both sides compute 100.0 * (promo / total) with the SAME float op
    # order over the two exact DECIMAL-scale-4 sums
    oracles["q14_promo_revenue"] = """
        SELECT 100.0 * (
                 CAST(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                    * CAST(1 - l.l_discount AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                        AS DOUBLE)
               ) AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
          AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """
    oracles["revenue_rollup"] = """
        SELECT r.r_name, n.n_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, n.n_name)
        ORDER BY r.r_name, n.n_name, revenue
    """
    # strict min-time chaining: first view, first click AFTER it,
    # first purchase after that — counts per step
    oracles["funnel_analysis"] = """
        WITH v AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1
        ), c AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY 1
        ), p AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT step, users FROM (
          SELECT '1_view' AS step, count(*) AS users FROM v
          UNION ALL SELECT '2_click', count(*) FROM c
          UNION ALL SELECT '3_purchase', count(*) FROM p
        ) ORDER BY step
    """
    oracles["retention_cohorts"] = """
        WITH f AS (
          SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
          FROM events GROUP BY 1
        )
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, date_trunc('day', e.ts))
                 AS day_offset,
               count(DISTINCT e.user_id) AS users
        FROM events e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # TPC-H tail (pipelines/tpch_ext.py). Same money discipline as the
    # r3 widening family: DECIMAL(18,2) products mirrored by int64
    # cents, ratio/average outputs divide the two exact sums with the
    # identical float op order; q17/q22 thresholds are cross-multiplied
    # INTEGER predicates on both sides (no float compare anywhere).
    oracles["q8_market_share"] = """
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                  * CAST(1 - l.l_discount AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                      AS DOUBLE) AS mkt_share
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1
    """
    oracles["q13_order_distribution"] = """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """
    oracles["q15_top_supplier"] = """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_rev AS DOUBLE) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
        ORDER BY s.s_suppkey
    """
    oracles["q17_small_qty_revenue"] = """
        WITH pp AS (
          SELECT l_partkey,
                 sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1)
        SELECT COALESCE(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                             AS DOUBLE), 0.0) / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pp ON pp.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
          AND CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pp.cnt < pp.sq
    """
    oracles["q19_disjunctive_revenue"] = """
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """
    oracles["q21_waiting_suppliers"] = """
        WITH per AS (
          SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS ms
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F' GROUP BY 1, 2),
        agg AS (
          SELECT l_orderkey, max(ms) AS mx, count(*) AS nsupp
          FROM per GROUP BY 1),
        win AS (
          SELECT p.l_suppkey
          FROM per p JOIN agg a ON p.l_orderkey = a.l_orderkey
          WHERE a.nsupp >= 2 AND p.ms = a.mx
            AND 1 = (SELECT count(*) FROM per p2
                     WHERE p2.l_orderkey = a.l_orderkey AND p2.ms = a.mx))
        SELECT s.s_name, count(*) AS numwait
        FROM win w JOIN supplier s ON s.s_suppkey = w.l_suppkey
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10
    """
    oracles["q22_dormant_customers"] = """
        WITH cand AS (
          SELECT c.c_custkey, n.n_name,
                 CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')),
        stats AS (
          SELECT sum(bal_c) AS s, count(*) AS n FROM cand WHERE bal_c > 0)
        SELECT cand.n_name, count(*) AS numcust,
               CAST(sum(cand.bal_c) AS DOUBLE) / 100.0 AS totacctbal
        FROM cand, stats
        WHERE cand.bal_c * stats.n > stats.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = cand.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        GROUP BY 1 ORDER BY 1
    """
    # row-level enrichment join through the hot-key-SALTED cogroup tier
    # (every event_type is hot by construction); exact int64-us compare
    oracles["event_type_warmup"] = """
        WITH f AS (
          SELECT event_type, min(ts) AS first_ts FROM events GROUP BY 1)
        SELECT e.event_id, e.event_type,
               (e.ts < f.first_ts + INTERVAL 1 DAY) AS is_early
        FROM events e JOIN f USING (event_type)
        ORDER BY e.event_id
    """
    # LAG window over EXISTING days per type; growth = one DOUBLE
    # divide of the two exact counts, same op order both sides
    oracles["events_dod_growth"] = """
        WITH d AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 count(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT event_type, day, n_events,
               LAG(n_events) OVER (PARTITION BY event_type ORDER BY day)
                 AS prev_events,
               CAST(n_events AS DOUBLE)
                 / LAG(n_events) OVER (PARTITION BY event_type ORDER BY day)
                 AS growth
        FROM d ORDER BY event_type, day
    """
    oracles["events_cube"] = """
        SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
               count(*) AS n_events
        FROM events GROUP BY CUBE(event_type, dow)
    """
    # fuzzy self-join: the key CASE mirrors pipelines/fuzzy.derive_keys
    # (planted one-char delete / insert per residue, first-match
    # precedence); DuckDB levenshtein == the banded DP on ASCII keys
    oracles["edit_distance_pairs"] = """
        WITH k AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 5
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 12) + 1)
                           || substr(substr(text, 1, 24), (doc_id % 12) + 3)
                      WHEN doc_id % 17 = 3
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 10) + 2)
                           || 'x'
                           || substr(substr(text, 1, 24), (doc_id % 10) + 3)
                      ELSE substr(text, 1, 24) END AS key
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM k a, k b
        WHERE a.doc_id < b.doc_id AND levenshtein(a.key, b.key) <= 2
        ORDER BY 1, 2
    """
    # Jaro–Winkler blocked self-join: same derived-key CASE; blocking
    # mirrored in the join predicate; the Ray kernel is byte-level
    # bit-identical to DuckDB's jaro_winkler_similarity
    oracles["jaro_winkler_pairs"] = """
        WITH k AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 5
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 12) + 1)
                           || substr(substr(text, 1, 24), (doc_id % 12) + 3)
                      WHEN doc_id % 17 = 3
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 10) + 2)
                           || 'x'
                           || substr(substr(text, 1, 24), (doc_id % 10) + 3)
                      ELSE substr(text, 1, 24) END AS key
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               jaro_winkler_similarity(a.key, b.key) AS jw
        FROM k a JOIN k b
          ON substr(a.key, 1, 2) = substr(b.key, 1, 2)
         AND a.doc_id < b.doc_id
        WHERE jaro_winkler_similarity(a.key, b.key) >= 0.9
        ORDER BY 1, 2
    """
    oracles["jaro_winkler_pairs_grouped"] = oracles["jaro_winkler_pairs"]
    oracles["exact_quantiles_cont"] = """
        SELECT CAST(q AS DOUBLE) AS q, CAST(value AS DOUBLE) AS value
        FROM (
          SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q,
                 unnest((SELECT quantile_cont(l_quantity,
                                              [0.25, 0.5, 0.75, 0.95])
                         FROM lineitem)) AS value
        )
    """
    # pairwise HLL inclusion-exclusion: the per-type register rebuild
    # of hll_distinct_users, plus per-pair UNION registers (max over
    # either type's regs); raw estimates combine before one round
    oracles["hll_user_overlap"] = """
        WITH h AS (
          SELECT DISTINCT event_type,
                 md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
          FROM events
        ),
        rk AS (
          SELECT event_type, CAST(hv >> 52 AS INTEGER) AS idx,
                 to_hex(CAST((hv % 4503599627370496::HUGEINT) * 4096 + 4095
                             AS UBIGINT)) AS hx
          FROM h
        ),
        rk2 AS (
          SELECT event_type, idx,
                 65 - (4 * (length(hx) - 1) +
                       CASE substr(hx, 1, 1)
                            WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 2
                            WHEN '4' THEN 3 WHEN '5' THEN 3 WHEN '6' THEN 3
                            WHEN '7' THEN 3 ELSE 4 END) AS rank
          FROM rk
        ),
        regs AS (SELECT event_type, idx, max(rank) AS reg
                 FROM rk2 GROUP BY 1, 2),
        est1 AS (
          SELECT event_type,
                 CASE WHEN (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                           (CAST(sum(1::HUGEINT << (53 - reg))
                                 + (4096 - count(*)) * (1::HUGEINT << 53)
                                 AS DOUBLE) / 9007199254740992.0)
                             <= 2.5 * 4096
                       AND 4096 - count(*) > 0
                      THEN 4096 * ln(4096.0 / (4096 - count(*)))
                      ELSE (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                           (CAST(sum(1::HUGEINT << (53 - reg))
                                 + (4096 - count(*)) * (1::HUGEINT << 53)
                                 AS DOUBLE) / 9007199254740992.0)
                 END AS e
          FROM regs GROUP BY event_type
        ),
        pairs AS (
          SELECT a.event_type AS ta, b.event_type AS tb
          FROM (SELECT DISTINCT event_type FROM events) a,
               (SELECT DISTINCT event_type FROM events) b
          WHERE a.event_type < b.event_type
        ),
        uregs AS (
          SELECT p.ta, p.tb, r.idx, max(r.reg) AS reg
          FROM pairs p JOIN regs r
            ON r.event_type = p.ta OR r.event_type = p.tb
          GROUP BY 1, 2, 3
        ),
        uest AS (
          SELECT ta, tb,
                 CASE WHEN (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                           (CAST(sum(1::HUGEINT << (53 - reg))
                                 + (4096 - count(*)) * (1::HUGEINT << 53)
                                 AS DOUBLE) / 9007199254740992.0)
                             <= 2.5 * 4096
                       AND 4096 - count(*) > 0
                      THEN 4096 * ln(4096.0 / (4096 - count(*)))
                      ELSE (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096 /
                           (CAST(sum(1::HUGEINT << (53 - reg))
                                 + (4096 - count(*)) * (1::HUGEINT << 53)
                                 AS DOUBLE) / 9007199254740992.0)
                 END AS eu
          FROM uregs GROUP BY ta, tb
        )
        SELECT u.ta AS type_a, u.tb AS type_b,
               CAST(round(ea.e) AS BIGINT) AS approx_a,
               CAST(round(eb.e) AS BIGINT) AS approx_b,
               CAST(round(u.eu) AS BIGINT) AS approx_union,
               CAST(round(ea.e + eb.e - u.eu) AS BIGINT) AS approx_overlap
        FROM uest u
        JOIN est1 ea ON ea.event_type = u.ta
        JOIN est1 eb ON eb.event_type = u.tb
        ORDER BY 1, 2
    """
    # bounded-depth BFS as a recursive CTE: UNION (distinct) bounds
    # the state space to (node, dist<=4) so recursion terminates; the
    # min collapses multi-path reachability to the hop distance
    oracles["bfs_distances"] = """
        WITH RECURSIVE
        e0 AS (
          SELECT DISTINCT 2 * l_suppkey AS src, 2 * l_partkey + 1 AS dst
          FROM lineitem),
        es AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst AS src, src AS dst FROM e0),
        seeds AS (SELECT 2 * s_suppkey AS node FROM supplier
                  WHERE s_nationkey = 3),
        bfs AS (
          SELECT node, 0 AS dist FROM seeds
          UNION
          SELECT e.dst AS node, b.dist + 1 AS dist
          FROM bfs b JOIN es e ON e.src = b.node WHERE b.dist < 4)
        SELECT node, CAST(min(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY 1 ORDER BY 1
    """
    # tie-stable distribution windows: cume = n_le/n, pct = n_lt/(n-1)
    # — exact integer counts, one mirrored divide each
    oracles["events_value_ranks"] = """
        SELECT event_id,
               cume_dist() OVER (PARTITION BY event_type ORDER BY value)
                 AS cume_dist,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value)
                 AS percent_rank
        FROM events ORDER BY event_id
    """
    # LEAD window: (ts, event_id) sort key makes ties deterministic
    oracles["event_transitions"] = """
        WITH s AS (
          SELECT event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events)
        SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # robust aggregates: rank arithmetic over int64 cents; boundary
    # order statistics clamp the winsorized tails; mirrored divides
    oracles["trimmed_stats"] = """
        WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                   FROM lineitem),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
        kk AS (SELECT count(*) AS n,
                      CAST(floor(0.05 * count(*)) AS BIGINT) AS k FROM c),
        b AS (SELECT
                (SELECT sum(v) FROM r, kk WHERE rn > k AND rn <= n - k)
                  AS mid_sum,
                (SELECT v FROM r, kk WHERE rn = k + 1) AS lo,
                (SELECT v FROM r, kk WHERE rn = n - k) AS hi,
                n, k
              FROM kk)
        SELECT CAST(mid_sum AS DOUBLE) / (n - 2 * k) / 100.0
                 AS trimmed_mean,
               CAST(mid_sum + k * lo + k * hi AS DOUBLE) / n / 100.0
                 AS winsorized_mean
        FROM b
    """
    # composition: reachability min over the fuzzy oracle's pair set
    # (the same key CASE as edit_distance_pairs, CTE-substituted)
    oracles["fuzzy_components"] = """
        WITH RECURSIVE k AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 5
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 12) + 1)
                           || substr(substr(text, 1, 24), (doc_id % 12) + 3)
                      WHEN doc_id % 17 = 3
                      THEN substr(substr(text, 1, 24), 1, (doc_id % 10) + 2)
                           || 'x'
                           || substr(substr(text, 1, 24), (doc_id % 10) + 3)
                      ELSE substr(text, 1, 24) END AS key
          FROM documents),
        p AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM k a, k b
          WHERE a.doc_id < b.doc_id AND levenshtein(a.key, b.key) <= 2),
        edges AS (SELECT a_id AS src, b_id AS dst FROM p
                  UNION ALL SELECT b_id, a_id FROM p),
        reach(node, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS component
        FROM reach GROUP BY node ORDER BY 1
    """
    # ordered string aggregation; (ts, event_id) pins tie order
    oracles["user_event_paths"] = """
        WITH p AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM events GROUP BY user_id)
        SELECT path, count(*) AS n_users FROM p
        GROUP BY path ORDER BY path
    """
    # mergeable-moment statistics: integer moment sums, closed forms
    # evaluated with the SAME float op order on both sides (never
    # DuckDB's own corr()/regr_slope(), whose internal algorithms are
    # numerically different)
    oracles["price_qty_correlation"] = """
        WITH m AS (
          SELECT count(*) AS n,
                 sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
                 sum(CAST(round(l_quantity * 100) AS BIGINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
                 sum(CAST(round(l_quantity * 100) AS BIGINT)
                     * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
          FROM lineitem)
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                 AS corr_qty_price,
               CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0
                 AS cov_qty_price
        FROM m
    """
    oracles["events_trend"] = """
        WITH m AS (
          SELECT event_type, count(*) AS n,
                 sum(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS sx,
                 sum(CAST(round(value * 100) AS BIGINT)) AS sy,
                 sum(CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                     * CAST(round(value * 100) AS BIGINT)) AS sxy,
                 sum(CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                     * CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS sxx
          FROM events GROUP BY 1)
        SELECT event_type,
               CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope_per_day,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) / 100.0 AS intercept
        FROM m ORDER BY event_type
    """
    # exact median + MAD: quantile_cont(0.5) as the integer v_lo+v_hi
    # half-unit trick, deviations at half-cent scale — no float until
    # the final divides
    oracles["mad_stats"] = """
        WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                   FROM lineitem),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
        kk AS (SELECT count(*) AS n FROM c),
        med2 AS (SELECT (SELECT v FROM r, kk WHERE rn = (n + 1) // 2)
                      + (SELECT v FROM r, kk WHERE rn = n // 2 + 1) AS m2
                 FROM kk),
        d AS (SELECT abs(2 * v - m2) AS dv FROM c, med2),
        r2 AS (SELECT dv, row_number() OVER (ORDER BY dv) AS rn FROM d)
        SELECT CAST((SELECT m2 FROM med2) AS DOUBLE) / 2.0 / 100.0 AS median,
               CAST((SELECT dv FROM r2, kk WHERE rn = (n + 1) // 2)
                    + (SELECT dv FROM r2, kk WHERE rn = n // 2 + 1)
                    AS DOUBLE) / 2.0 / 2.0 / 100.0 AS mad
    """
    # CMS register rebuild (the cms_token_estimates idiom) + the exact
    # second frequency moment; estimate = min_j Σ_w reg² (self inner
    # product)
    oracles["selfjoin_size_estimate"] = r"""
        WITH counts AS (
          SELECT CAST(l_partkey AS VARCHAR) AS token, COUNT(*) AS cnt
          FROM lineitem GROUP BY 1),
        rows_j AS (
          SELECT * FROM (VALUES
            (0, CAST(1609587929392839161 AS HUGEINT)),
            (1, CAST(2870177450012600261 AS HUGEINT)),
            (2, CAST(2685821657736338717 AS HUGEINT)),
            (3, CAST(1983613069789375825 AS HUGEINT))) AS t(j, m)),
        bucketed AS (
          SELECT j,
                 ((CAST(md5_number_upper(token) AS HUGEINT) * m)
                  % 18446744073709551616) // 18014398509481984 AS b,
                 cnt
          FROM counts CROSS JOIN rows_j),
        sums AS (SELECT j, b, SUM(cnt) AS s FROM bucketed GROUP BY 1, 2),
        dot AS (SELECT j, SUM(s * s) AS d FROM sums GROUP BY 1)
        SELECT (SELECT CAST(SUM(cnt * cnt) AS BIGINT) FROM counts)
                 AS exact_size,
               (SELECT CAST(MIN(d) AS BIGINT) FROM dot) AS cms_estimate
    """
    # Gini via the tie-invariant mean-difference rank identity
    oracles["gini_coefficient"] = """
        WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
                   FROM orders),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
                     count(*) OVER () AS n
              FROM c)
        SELECT CAST(SUM((2 * rn - n - 1) * v) AS DOUBLE)
               / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)) AS gini
        FROM r
    """
    # grouped two-pass median + MAD: the mad_stats integer scheme with
    # PARTITION BY lang rank windows
    oracles["lang_median_mad"] = """
        WITH c AS (SELECT lang, n_chars AS v FROM documents),
        r AS (SELECT lang, v,
                     row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n FROM c),
        med2 AS (SELECT lang,
                        (SELECT v FROM r r2 WHERE r2.lang = g.lang
                         AND r2.rn = (g.n + 1) // 2)
                      + (SELECT v FROM r r3 WHERE r3.lang = g.lang
                         AND r3.rn = g.n // 2 + 1) AS m2
                 FROM (SELECT DISTINCT lang, n FROM r) g),
        d AS (SELECT c.lang, abs(2 * c.v - med2.m2) AS dv
              FROM c JOIN med2
                ON c.lang IS NOT DISTINCT FROM med2.lang),
        r2 AS (SELECT lang, dv,
                      row_number() OVER (PARTITION BY lang ORDER BY dv) AS rn,
                      count(*) OVER (PARTITION BY lang) AS n FROM d),
        dm AS (SELECT lang,
                      (SELECT dv FROM r2 a WHERE a.lang = g.lang
                       AND a.rn = (g.n + 1) // 2)
                    + (SELECT dv FROM r2 b WHERE b.lang = g.lang
                       AND b.rn = g.n // 2 + 1) AS d2
               FROM (SELECT DISTINCT lang, n FROM r2) g)
        SELECT med2.lang, CAST(med2.m2 AS DOUBLE) / 2.0 AS median_chars,
               CAST(dm.d2 AS DOUBLE) / 2.0 / 2.0 AS mad_chars
        FROM med2 JOIN dm ON med2.lang IS NOT DISTINCT FROM dm.lang
        ORDER BY med2.lang
    """
    # DENSE_RANK keeps every order tied at a qualifying value (a
    # row_number top-k would silently drop ties)
    oracles["top_order_values_with_ties"] = """
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC)
                    AS BIGINT) AS rnk
        FROM orders
        QUALIFY rnk <= 3
        ORDER BY o_orderpriority, rnk, o_orderkey
    """
    # lower weighted median: smallest v with 2·cumweight >= total —
    # pure integer rule, no float compare
    oracles["weighted_median_qty"] = """
        WITH c AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS v,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS w
                   FROM lineitem),
        g AS (SELECT v, sum(w) AS gw FROM c GROUP BY 1),
        r AS (SELECT v, sum(gw) OVER (ORDER BY v) AS cumw,
                     (SELECT sum(gw) FROM g) AS total FROM g)
        SELECT CAST(min(v) AS DOUBLE) / 100.0 AS weighted_median_qty
        FROM r WHERE 2 * cumw >= total
    """
    # derived partsupp (the same CTE the Ray side computes): distinct
    # (part,supp) pairs with ps_availqty = pair count and
    # ps_cost_c = (pk*31 + sk*17) % 90000 + 10000 — a pure integer
    # function of the keys, so both sides agree exactly
    _ps_cte = """ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 count(*) AS ps_availqty,
                 (l_partkey * 31 + l_suppkey * 17) % 90000 + 10000
                   AS ps_cost_c
          FROM lineitem GROUP BY l_partkey, l_suppkey)"""
    oracles["q2_min_cost_supplier"] = f"""
        WITH {_ps_cte},
        s AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
              JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'EUROPE'),
        c AS (SELECT ps.ps_partkey, ps.ps_cost_c, s.s_acctbal, s.s_name,
                     s.n_name
              FROM ps JOIN s ON s.s_suppkey = ps.ps_suppkey
              JOIN part ON p_partkey = ps.ps_partkey AND p_size = 15),
        m AS (SELECT ps_partkey, min(ps_cost_c) AS mc FROM c GROUP BY 1)
        SELECT c.s_acctbal, c.s_name, c.n_name, c.ps_partkey AS p_partkey
        FROM c JOIN m ON m.ps_partkey = c.ps_partkey
                     AND c.ps_cost_c = m.mc
        ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p_partkey
        LIMIT 100
    """
    oracles["q9_nation_profit"] = """
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))
                        - ((l_partkey * 31 + l_suppkey * 17) % 90000
                           + 10000)
                          * CAST(round(l_quantity * 100) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS sum_profit
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC
    """
    oracles["q11_important_stock"] = f"""
        WITH {_ps_cte},
        v AS (SELECT ps_partkey, sum(ps_cost_c * ps_availqty) AS value_c
              FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON n_nationkey = s_nationkey
              WHERE n_name = 'NATION_3' GROUP BY 1),
        t AS (SELECT sum(value_c) AS total FROM v)
        SELECT ps_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
        FROM v, t WHERE value_c * 10000 > total * 10
        ORDER BY value_c DESC, ps_partkey
    """
    oracles["q16_supplier_part_counts"] = f"""
        WITH {_ps_cte}
        SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM ps JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
        GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size
    """
    oracles["q20_promotion_suppliers"] = """
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 count(*) AS ps_availqty,
                 sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate < TIMESTAMP '1997-01-01'
                          THEN CAST(round(l_quantity * 100) AS BIGINT)
                          ELSE 0 END) AS qty_win_c
          FROM lineitem GROUP BY 1, 2)
        SELECT DISTINCT s_name FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3' AND qty_win_c > 0
          AND 200 * ps_availqty > qty_win_c
        ORDER BY s_name
    """
    # forced distributed-tier entries share the base query's oracle:
    # the driver hash-gates the cogroup tier against the same answer
    for name, (_module, _fn, oracle_name) in _COGROUP_TIERS.items():
        if oracle_name in oracles:
            oracles[name] = oracles[oracle_name]
    oracles["bloom_semi_join_cogroup"] = oracles["bloom_semi_join"]
    oracles["bloom_semi_join_exactonly"] = oracles["bloom_semi_join"]
    oracles["retention_cohorts_distributed"] = oracles["retention_cohorts"]
    oracles["events_moving_avg_grouped"] = oracles["events_moving_avg"]
    oracles["ntile_orders_grouped"] = oracles["ntile_orders"]
    oracles["mode_event_type_grouped"] = oracles["mode_event_type"]
    oracles["event_entropy_grouped"] = oracles["event_entropy"]
    oracles["interval_merge_grouped"] = oracles["interval_merge"]
    oracles["lag1_autocorr_grouped"] = oracles["lag1_autocorr"]
    oracles["user_value_trend_grouped"] = oracles["user_value_trend"]
    oracles["theil_sen_trend_grouped"] = oracles["theil_sen_trend"]
    oracles["user_burstiness_grouped"] = oracles["user_burstiness"]
    oracles["benford_digits_grouped"] = oracles["benford_digits"]
    oracles["user_type_pivot_grouped"] = oracles["user_type_pivot"]
    oracles["feature_correlations_grouped"] = oracles[
        "feature_correlations"
    ]
    oracles["dup_clique_histogram_grouped"] = oracles[
        "dup_clique_histogram"
    ]
    oracles["vocab_growth_grouped"] = oracles["vocab_growth"]
    oracles["neardup_medoids_distributed"] = oracles["neardup_medoids"]
    oracles["dataset_split_grouped"] = oracles["dataset_split"]
    # leakage-safe grouped split: a SOURCE hashes whole to one split
    oracles["dataset_split_by_source"] = """
        WITH s AS (
          SELECT CASE WHEN md5_number_upper('gsplit:' || source)
                           % 100 < 80 THEN 'train'
                      WHEN md5_number_upper('gsplit:' || source)
                           % 100 < 90 THEN 'valid'
                      ELSE 'test' END AS split,
                 source, n_chars
          FROM documents)
        SELECT split,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM s GROUP BY 1 ORDER BY 1
    """
    oracles["dataset_split_by_source_grouped"] = oracles[
        "dataset_split_by_source"
    ]
    # train->holdout shingle leakage under both split rules: distinct
    # 8-gram shingles present on BOTH sides of the boundary
    oracles["split_contamination"] = r"""
        WITH t AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(trim(lower(text)),
                                                   '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id, source,
            CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
                 ELSE list_distinct(list_transform(
                        range(1, len(toks) - 6),
                        i -> array_to_string(toks[i : i + 7], ' ')))
            END AS sh
          FROM t
        ),
        r AS (
          SELECT md5_number_upper(u.s) AS h,
                 md5_number_upper('split:' || CAST(doc_id AS VARCHAR))
                   % 100 < 80 AS doc_train,
                 md5_number_upper('gsplit:' || source) % 100 < 80
                   AS src_train
          FROM sh, unnest(sh.sh) AS u(s)
        ),
        agg AS (
          SELECT h,
                 max(CASE WHEN doc_train THEN 1 ELSE 0 END) AS dtr,
                 max(CASE WHEN NOT doc_train THEN 1 ELSE 0 END) AS dte,
                 max(CASE WHEN src_train THEN 1 ELSE 0 END) AS st,
                 max(CASE WHEN NOT src_train THEN 1 ELSE 0 END) AS se
          FROM r GROUP BY h
        )
        SELECT 'doc' AS rule,
               CAST(count(*) FILTER (dtr = 1 AND dte = 1) AS BIGINT)
                 AS shared_shingles
        FROM agg
        UNION ALL
        SELECT 'source',
               CAST(count(*) FILTER (st = 1 AND se = 1) AS BIGINT)
        FROM agg
        ORDER BY rule
    """
    oracles["split_contamination_grouped"] = oracles["split_contamination"]
    oracles["ngram_diversity_grouped"] = oracles["ngram_diversity"]
    oracles["event_throttle_grouped"] = oracles["event_throttle"]
    oracles["value_concentration_grouped"] = oracles["value_concentration"]
    oracles["psi_source_drift_grouped"] = oracles["psi_source_drift"]
    oracles["kcore_nodes_cogroup"] = oracles["kcore_nodes"]
    oracles["weighted_sssp_cogroup"] = oracles["weighted_sssp"]
    oracles["butterfly_count_grouped"] = oracles["butterfly_count"]
    oracles["frequent_item_pairs_grouped"] = oracles["frequent_item_pairs"]
    oracles["user_drawdown_grouped"] = oracles["user_drawdown"]
    oracles["activity_streaks_grouped"] = oracles["activity_streaks"]
    oracles["rolling_distinct_users_grouped"] = oracles[
        "rolling_distinct_users"
    ]
    oracles["ngram_containment_pairs_distributed"] = oracles[
        "ngram_containment_pairs"
    ]
    oracles["user_value_deciles_grouped"] = oracles["user_value_deciles"]
    oracles["spearman_user_metrics_grouped"] = oracles[
        "spearman_user_metrics"
    ]
    oracles["kendall_user_metrics_grouped"] = oracles[
        "kendall_user_metrics"
    ]
    oracles["sparse_cosine_pairs_distributed"] = oracles[
        "sparse_cosine_pairs"
    ]
    oracles["sparse_cosine_pairs_prefix"] = oracles["sparse_cosine_pairs"]
    oracles["sparse_cosine_pairs_dense_sharded"] = oracles[
        "sparse_cosine_pairs"
    ]
    oracles["mannwhitney_value_grouped"] = oracles["mannwhitney_value"]
    oracles["ks_two_sample_grouped"] = oracles["ks_two_sample"]
    oracles["welch_ttest_value_grouped"] = oracles["welch_ttest_value"]
    oracles["contingency_stats_grouped"] = oracles["contingency_stats"]
    oracles["sorted_neighborhood_pairs_grouped"] = oracles[
        "sorted_neighborhood_pairs"
    ]
    return oracles
