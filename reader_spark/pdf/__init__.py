from .layout import dehyphenate_lines, extract_pdf_spans, parse_boxes, reading_order

__all__ = ["dehyphenate_lines", "extract_pdf_spans", "parse_boxes", "reading_order"]
