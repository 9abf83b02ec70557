from .pipeline import extract_document, ExtractResult

__all__ = ["extract_document", "ExtractResult"]
