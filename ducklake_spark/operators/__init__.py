"""Scale-path operators that go beyond the reference's surface.

The reference (DuckLake) delegates all relational operators to its
host engine; this package holds the operators a 100 TB training-data
pipeline needs that neither the reference nor stock Spark ships as a
single primitive:

- :mod:`similarity` — approximate nearest neighbor over embedding
  columns (IVF coarse quantization, sign-random-projection LSH).
- :mod:`multimodal` — opaque binary (image/audio/video) columns with
  typed metadata and Arrow-batched decode/feature plumbing.
- :mod:`asof` — as-of / range join compositions.

All operators are DataFrame-in/DataFrame-out, shuffle-conscious
(broadcast small sides, pre-bucket where possible) and contain no
driver-side collects on the data path.
"""
