"""reader_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
``vakra-dev/reader`` (reference: /root/reference, studied for behavior only):
raw HTML -> metadata extraction -> DOM cleaning -> markdown/span
serialization -> postprocessing, expressed as vectorized pandas/Arrow UDFs
over tables of interleaved text+media documents.

Layout:
  htmlkit/    tolerant HTML parser, lightweight DOM, CSS-subset selectors
  extract/    cleaner (C1-C8), serializer (M1), postprocess (M2),
              metadata battery (X1-X11), fused per-document pipeline
  functions/  URL helpers (U1-U8), text utilities (C12, quality, lang-id)
  spark/      session factory, fused mapInPandas job, skew salting,
              checkpoint resume, lineage sidecar
  pdf/        PDF layout parser (column detection + XY-cut reading order)
  ops/        large-scale corpus operators (dedup, minhash-LSH, simhash,
              ANN similarity, token stats) over generic document tables
"""

__version__ = "0.1.0"
