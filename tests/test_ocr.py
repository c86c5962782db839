"""OCR stage semantics (reference M11/M12/J6, gpu_processor.py:204-288)."""

from high_performance_docling_ray.kernels.document import (
    ExtractOptions,
    extract_document,
)
from high_performance_docling_ray.kernels.ocr import (
    identify_ocr_regions,
    run_ocr,
)
from high_performance_docling_ray.sources.pages import generate_doc


def test_identify_only_empty_text_labels():
    clusters = [
        {"id": 0, "label": "text", "bbox": (0, 0, 10, 10), "cells": []},
        {"id": 1, "label": "text", "bbox": (0, 0, 10, 10), "cells": [3]},
        {"id": 2, "label": "table", "bbox": (0, 0, 10, 10), "cells": []},
        {"id": 3, "label": "caption", "bbox": (5, 5, 9, 9), "cells": []},
    ]
    tasks = identify_ocr_regions(clusters)
    assert [t["cluster_id"] for t in tasks] == [0, 3]


def test_run_ocr_deterministic():
    clusters = [
        {"id": 7, "label": "text", "bbox": (1.0, 2.0, 3.0, 4.0), "cells": []}
    ]
    a = run_ocr(clusters, page_no=0)
    b = run_ocr(clusters, page_no=0)
    assert a == b and 7 in a and a[7].startswith("[ocr ")
    # different page -> different recognized text (position-keyed stub)
    assert run_ocr(clusters, page_no=1) != a


def test_extract_with_ocr_adds_text():
    # find a synthetic pdf doc whose fixture includes an empty text cluster
    for i in range(60):
        row = generate_doc(7, i)
        if not row["html"].startswith(b"%SYNTHPDF"):
            continue
        base = extract_document(row["html"])
        with_ocr = extract_document(
            row["html"], ExtractOptions(do_ocr=True)
        )
        if "[ocr " in with_ocr["extracted_text"]:
            assert "[ocr " not in base["extracted_text"]
            assert with_ocr["n_elements"] >= base["n_elements"]
            return
    raise AssertionError("no OCR fixture doc found in 60 seeds")
