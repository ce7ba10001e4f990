"""setsketch_ray — a Ray-Data-native near-duplicate detection engine.

From-scratch re-expression of the computational semantics of the reference
repo *dynatrace-research/set-sketch-paper* ("SetSketch: Filling the Gap
between MinHash and HyperLogLog", VLDB 2021) as a distributed Ray Data
pipeline over image+caption tables, plus the training-data operations a
100 TB corpus pipeline needs (dedup, similarity search, text analysis).

Layout:
  sketchlib/  pure-NumPy sketch + estimator math (no Ray)
  stages/     map_batches stage callables (shingling, sketching, LSH, verify)
  sources/    synthetic image-table generator + readers
  pipelines/  end-to-end pipelines (near-dup dedup, approx distinct, ...)
  state/      checkpoint / lineage manifests
  functions/  text analysis, embedding search, misc batch functions
"""

__version__ = "0.1.0"
