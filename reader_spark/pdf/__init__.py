from .layout import extract_pdf_spans, parse_boxes, reading_order

__all__ = ["extract_pdf_spans", "parse_boxes", "reading_order"]
