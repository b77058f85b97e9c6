"""Score normalization — reference-exact min/max → [1, 100] scaling.

Parity: utils/search_pipeline.py:34-64 (``normalize_scores_to_100``),
including every degenerate branch:
- empty input → empty;
- no numeric scores → all 1.0;
- non-numeric score row → 1.0;
- max == min → 100.0 if max > 0 else 1.0;
- else 1 + ((s - min) / (max - min)) * 99, clamped to [1.0, 100.0].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_scores_to_100(results: list[dict]) -> list[dict]:
    """Literal spec implementation over a list of {"score": ...} dicts."""
    if not results:
        return []

    valid_scores = [
        res.get("score")
        for res in results
        if isinstance(res.get("score"), (int, float)) and not isinstance(res.get("score"), bool)
    ]

    if not valid_scores:
        for res in results:
            res["normalized_score_100"] = 1.0
        return results

    min_score = min(valid_scores)
    max_score = max(valid_scores)

    for res in results:
        score = res.get("score")
        if not isinstance(score, (int, float)) or isinstance(score, bool):
            res["normalized_score_100"] = 1.0
        elif max_score == min_score:
            res["normalized_score_100"] = 100.0 if max_score > 0 else 1.0
        else:
            normalized_val = 1 + ((score - min_score) / (max_score - min_score)) * 99
            res["normalized_score_100"] = max(1.0, min(100.0, normalized_val))
    return results


def arrow_minmax_normalize_100(
    scores: pa.Array | pa.ChunkedArray,
    min_score: float | None = None,
    max_score: float | None = None,
) -> pa.Array:
    """Vectorized two-phase variant: pass global (min, max) computed by a
    prior ``Dataset.aggregate(Min, Max)`` for distributed use, or None to
    compute over this array. Null scores → 1.0 (the non-numeric branch)."""
    vals = pc.cast(scores, pa.float64())
    if min_score is None:
        min_score = pc.min(vals).as_py()
    if max_score is None:
        max_score = pc.max(vals).as_py()

    n = len(vals)
    if min_score is None:  # all-null input
        return pa.array([1.0] * n, pa.float64())
    if max_score == min_score:
        fill = 100.0 if max_score > 0 else 1.0
        out = pc.if_else(pc.is_valid(vals), pa.scalar(fill), pa.scalar(1.0))
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    arr = vals.to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore"):
        norm = 1.0 + ((arr - min_score) / (max_score - min_score)) * 99.0
    norm = np.clip(norm, 1.0, 100.0)
    norm = np.where(np.isnan(arr), 1.0, norm)
    return pa.array(norm, pa.float64())
