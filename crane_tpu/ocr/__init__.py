from crane_tpu.ocr.pipeline import (  # noqa: F401
    OcrDocument,
    OcrRegion,
    PaddleOcrPipeline,
    ctc_greedy_decode,
    db_regions,
    load_dictionary,
    sort_reading_order,
)
