"""Bucketed-storage layout (sources/bucketstore): write/read roundtrip,
zero-shuffle bucket-aligned join parity vs a pandas reference, null-key
drops, and bucket-count compatibility validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.sources.bucketstore import (
    bucketed_attach,
    n_buckets_of,
    read_bucket,
    write_bucketed,
)


def test_bucketed_join_parity_and_nulls(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    left = pd.DataFrame({
        "k": rng.randint(0, 200, size=1000).astype(object),
        "v": rng.randint(0, 10_000, size=1000),
    })
    left.loc[:4, "k"] = None  # null keys must drop
    right = pd.DataFrame({"rk": np.arange(0, 150), "w": np.arange(0, 150) * 7})

    lp = str(tmp_path / "left")
    rp = str(tmp_path / "right")
    write_bucketed(rd.from_pandas(left), ["k"], 8, lp)
    write_bucketed(rd.from_pandas(right), ["rk"], 8, rp)
    assert n_buckets_of(lp) == 8

    # roundtrip: buckets partition the rows exactly (null keys included)
    total = sum(read_bucket(lp, i).count() for i in range(8))
    assert total == len(left)

    out_schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                            ("w", pa.int64())])
    got = bucketed_attach(
        lp, rp, left_key="k", right_key="rk", attach_cols=["w"],
        out_schema=out_schema,
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)

    want = (
        left.dropna(subset=["k"]).astype({"k": np.int64})
        .merge(right.rename(columns={"rk": "k"}), on="k")
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_count_mismatch_raises(ray_session, tmp_path):
    df = pd.DataFrame({"k": [1, 2], "v": [3, 4]})
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_bucketed(rd.from_pandas(df), ["k"], 4, a)
    write_bucketed(rd.from_pandas(df), ["k"], 8, b)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_attach(
            a, b, left_key="k", right_key="k", attach_cols=["v"],
            out_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        )


def test_bucketed_join_duplicate_right_keys_multiply(ray_session, tmp_path):
    """Unlike coarse_attach's deterministic min-pick, bucketed_attach
    documents SQL join semantics: duplicate right keys multiply rows."""
    left = pd.DataFrame({"k": [1, 1, 2], "v": [10, 11, 20]})
    right = pd.DataFrame({"rk": [1, 1, 2], "w": [7, 8, 9]})
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(rd.from_pandas(left), ["k"], 4, lp)
    write_bucketed(rd.from_pandas(right), ["rk"], 4, rp)
    out = bucketed_attach(
        lp, rp, left_key="k", right_key="rk", attach_cols=["w"],
        out_schema=pa.schema([("k", pa.int64()), ("v", pa.int64()),
                              ("w", pa.int64())]),
    ).to_pandas().sort_values(["k", "v", "w"]).reset_index(drop=True)
    want = left.merge(right.rename(columns={"rk": "k"}), on="k") \
        .sort_values(["k", "v", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
