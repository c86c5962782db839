"""high_performance_docling_ray — a Ray-Data-native document-extraction engine.

A from-scratch re-implementation of the query / data-processing
capabilities of the reference repo ``lucasastorian/high-performance-docling``
(studied read-only at ``/root/reference``), re-expressed as idiomatic
Ray Data: ``ray.data.Dataset`` pipelines of zero-copy Arrow
``map_batches`` transforms, actor pools for stateful stages, and
explicit partitioning / dedup / checkpointing for 100 TB-scale runs.

Layout:
    kernels/    pure deterministic kernels (text sanitization, bbox
                algebra, HTML boilerplate strip, layout post-processing
                rules, table-structure rules, reading order) shared by
                the distributed engine AND the serial test oracle so
                extracted text is byte-identical by construction.
    stages/     map_batches callables / actor classes.
    sources/    readers + deterministic synthetic corpus generators.
    functions/  scalar function library (string/math/array helpers).
    pipelines/  end-to-end Dataset pipeline builders (extraction,
                dedup family, similarity search, text analysis,
                relational demos).
    state/      shard manifests / resume, metrics counters.
"""

__version__ = "0.1.0"
