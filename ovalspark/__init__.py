"""ovalspark — a PySpark-native schema & constraint validation engine.

A from-scratch re-imagination of peng225/oval (an S3 data-integrity
checker) as a distributed DataFrame validation engine over tables of
interleaved text+media documents::

    (doc_id: string,
     spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)

oval's per-object sequence of 256-byte data units becomes the per-document
``spans`` array; oval's per-unit embedded header fields (bucket, key,
writeCount, offset, workerID — reference ``internal/pattern/pattern.go:94-116``)
become fixed-width header segments embedded in each span's ``text`` payload.
Everything is expressed as DataFrame operations and vectorized pandas/Arrow
UDFs — zero per-row Python.

Layout:
    functions/   deterministic span derivation + samplers (pattern.go analog)
    datagen/     seeded synthetic generator + corruption injector
    operators/   the validators (span-sequence, existence, counts,
                 uniqueness, stats, referential, drift, dedup, similarity,
                 text analysis, multimodal)
    plans/       ValidationPlan IR + resumable runner + checkpoint manifest
    sources/     table IO abstraction (parquet now, Iceberg-shaped interface)
    streaming/   Structured Streaming wrapper (foreachBatch validation)
"""

__version__ = "0.1.0"
