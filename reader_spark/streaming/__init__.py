from .extract_stream import extract_stream, start_extraction_stream

__all__ = ["extract_stream", "start_extraction_stream"]
