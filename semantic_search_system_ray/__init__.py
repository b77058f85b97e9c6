"""semantic_search_system_ray — a Ray-Data-native knowledge-graph construction
and semantic data-processing engine.

Built from scratch on ``ray.data.Dataset`` pipelines (zero-copy Arrow
``map_batches``, actor pools for stateful stages, groupby/sort for the wide
steps) with the query and data-processing capabilities of the reference
system ``sagar8080/semantic-search-system``.

Layout:
- ``functions/`` — scalar/vectorized kernels (clean_text, normalize_key,
  score normalization, hashing embeddings, minhash/simhash).
- ``sources/``   — dataset readers/writers and the seeded synthetic corpus
  generator (spans-shaped interleaved text+media documents).
- ``stages/``    — map_batches stages: segmentation, NER mention detection,
  triple extraction, canonicalization, dedup, text stats, ANN, media.
- ``pipelines/`` — end-to-end pipelines (KG build) and the literal
  single-process reference oracle used as the correctness golden.
- ``state/``     — checkpoint manifest + per-partition lineage counters.

No module in this package calls ``ray.init()``/``ray.shutdown()`` — the
driver, ``bench.py``, and the pytest session fixture own the Ray session.
"""

from semantic_search_system_ray._compat import ensure_fsspec_http_stub

ensure_fsspec_http_stub()

__version__ = "0.1.0"
