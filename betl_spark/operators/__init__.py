"""Beyond-reference scale operators for training-data pipelines.

The reference (a star-schema ETL framework) has nothing in this space;
these are first-class engine capabilities designed for the 100 TB
regime (BASELINE north-star):

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed)
- ``text``       — language-ID, quality scoring, token counts,
                   fingerprinting
- ``multimodal`` — opaque binary columns + typed metadata, Arrow-batched
                   decode/feature plumbing (decoders stubbed: no codec
                   libs in this container)

Design rule: everything that can be a built-in-function column
expression IS one (whole-stage codegen, no Python in the hot path);
hashing is md5-based and deterministic so results are reproducible
across runs, engines, and cluster sizes.
"""

from betl_spark.operators import dedup, multimodal, similarity, text  # noqa: F401
