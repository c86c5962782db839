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
    from high_performance_docling_ray.pipelines.similarity import (
        embedding_neardup_pairs,
    )

    return embedding_neardup_pairs(sf_dir, threshold=0.95)


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
    from high_performance_docling_ray.pipelines.similarity import knn_ivf

    return knn_ivf(sf_dir, _query_vector(sf_dir), k=10)


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


def _q_image_features(sf_dir: str):
    from high_performance_docling_ray.stages.multimodal import image_features

    return image_features(n=256)


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


def _q_asof_join(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import asof_join_events

    return asof_join_events(sf_dir)


def _q_sessionize(sf_dir: str):
    from high_performance_docling_ray.pipelines.relational import sessionize

    return sessionize(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship extraction (SURVEY.md §3; non-SQL, rows-only check)
        "extract_pages": _q_extract_pages,
        "extract_docs_text": _q_extract_docs_text,
        "extract_synth_corpus": _q_extract_synth,
        "extract_ocr_enriched": _q_extract_enriched,
        "ocr_recognize": _q_ocr_tasks,
        # multimodal: binary media column -> actor-pool decode/feature
        "image_features": _q_image_features,
        "figure_features": _q_figure_features,
        # corpus dedup family
        "exact_dedup": _q_exact_dedup,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "embedding_neardup_pairs": _q_embedding_neardup,
        # similarity search
        "knn_brute_cosine": _q_knn_brute,
        "knn_ivf_cosine": _q_knn_ivf,
        # text analysis
        "token_counts": _q_token_counts,
        "fingerprint_md5": _q_fingerprint_md5,
        "fingerprint_rolling": _q_fingerprint_rolling,
        "language_id": _q_language_id,
        "quality_scores": _q_quality,
        "doc_stats": _q_doc_stats,
        "lang_stats": _q_lang_stats,
        "hll_distinct_users": _q_hll_distinct,
        # relational operator demos
        "q1_pricing_summary": _q_q1,
        "q3_top_orders": _q_q3,
        "q5_region_revenue": _q_q5,
        "topk_orders": _q_topk_orders,
        "distinct_segments": _q_distinct_segments,
        "filter_lineitem": _q_filter_lineitem,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
        "asof_join_events": _q_asof_join,
        "events_sliding_window": _q_sliding_window,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
        "doc_stats": r"""
            SELECT doc_id, length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
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
        "asof_join_events": """
            SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id
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
