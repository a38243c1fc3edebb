"""DataFrame-level operators.

- ``similarity_join``  exact distributed similarity score/top-k join
  (the 100 TB path: no driver-side corpus, pure Catalyst plan)
- ``dedup``            exact + near-duplicate detection family
- ``ann``              approximate nearest neighbor (IVF / LSH bucketed)
- ``text``             text analysis: lang-id, quality, tokens, fingerprints
- ``multimodal``       binary-column plumbing with stubbed decoders
"""

from polars_matmul_spark.operators.similarity_join import (  # noqa: F401
    score_expr,
    similarity_join_exact,
    topk_join_exact,
)
