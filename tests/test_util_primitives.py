"""Direct unit tests for the coarse-partition shuffle primitives
(stages/util): grouped apply, whole-partition apply, hash-join attach,
anti join — the building blocks the dedup/query pipelines compose."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.stages.util import (
    coarse_anti_join,
    coarse_attach,
    coarse_grouped_apply,
    coarse_partition_apply,
)


def test_coarse_partition_apply_routes_all_rows_of_key_together(ray_session):
    t = pa.table({"k": ["a", "b", "a", "c", "b", "a"], "v": [1, 2, 3, 4, 5, 6]})
    out_schema = pa.schema([("k", pa.string()), ("total", pa.int64())])

    def per_part(df) -> pa.Table:
        agg = df.groupby("k", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pydict(
            {"k": agg["k"], "total": agg["v"]}, schema=out_schema
        )

    # two blocks → rows of key 'a'/'b' span blocks; routing must reunite them
    ds = rd.from_arrow([t.slice(0, 3), t.slice(3)])
    got = {r["k"]: r["total"] for r in
           coarse_partition_apply(ds, ["k"], per_part, out_schema).take_all()}
    assert got == {"a": 10, "b": 7, "c": 4}


def test_coarse_attach_inner_semantics(ray_session):
    left = rd.from_arrow(pa.table(
        {"src": ["x", "y", "z"], "dst": ["p", "q", "r"]}
    ))
    right = rd.from_arrow(pa.table(
        {"doc_id": ["x", "z", "z"], "payload": ["PX", "PZ1", "PZ2"]}
    ))
    out_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("pay", pa.string())]
    )
    got = sorted(
        (r["src"], r["dst"], r["pay"])
        for r in coarse_attach(
            left, right, left_key="src", right_key="doc_id",
            attach_cols=["payload"], attach_as=["pay"], out_schema=out_schema,
        ).take_all()
    )
    # 'y' has no match → dropped (inner); duplicate rhs keys → first wins
    assert [g[:2] for g in got] == [("x", "p"), ("z", "r")]
    assert got[0][2] == "PX" and got[1][2] in {"PZ1", "PZ2"}


def test_coarse_anti_join(ray_session):
    left = rd.from_arrow(pa.table(
        {"c_custkey": [1, 2, 3, 4], "c_name": ["a", "b", "c", "d"]}
    ))
    right = rd.from_arrow(pa.table({"o_custkey": [2, 4, 4]}))
    out_schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())])
    got = sorted(
        r["c_custkey"]
        for r in coarse_anti_join(
            left, right, left_key="c_custkey", right_key="o_custkey",
            out_schema=out_schema,
        ).take_all()
    )
    assert got == [1, 3]


def test_coarse_grouped_apply_min_group_size(ray_session):
    t = pa.table({"k": ["a", "a", "b"], "v": ["1", "2", "3"]})
    out_schema = pa.schema([("k", pa.string()), ("n", pa.int64())])

    def fn(g) -> pa.Table:
        return pa.Table.from_pydict(
            {"k": [g["k"].iloc[0]], "n": [len(g)]}, schema=out_schema
        )

    got = {r["k"]: r["n"] for r in coarse_grouped_apply(
        rd.from_arrow(t), ["k"], fn, out_schema, min_group_size=2
    ).take_all()}
    assert got == {"a": 2}  # singleton group 'b' skipped


def test_coarse_asof_join_backward(ray_session):
    import datetime as dt

    from semantic_search_system_ray.stages.util import coarse_asof_join

    def ts(s):
        return dt.datetime.fromisoformat(s)

    left = rd.from_arrow(pa.table({
        "event_id": [1, 2, 3, 4],
        "user_id": [10, 10, 10, 20],
        "ts": [ts("2024-01-05"), ts("2024-01-01"), ts("2024-02-01"), ts("2024-01-05")],
    }))
    right = rd.from_arrow(pa.table({
        "o_custkey": [10, 10, 20],
        "o_orderdate": [ts("2024-01-03"), ts("2024-01-20"), ts("2024-03-01")],
        "tag": ["jan3", "jan20", "mar1"],
    }))
    out_schema = pa.schema([("event_id", pa.int64()), ("tag", pa.string())])
    got = {r["event_id"]: r["tag"] for r in coarse_asof_join(
        left, right, left_key="user_id", right_key="o_custkey",
        left_on="ts", right_on="o_orderdate",
        out_schema=out_schema, right_cols=["tag"],
    ).take_all()}
    # event 1: greatest date ≤ Jan5 is Jan3; event 2: none ≤ Jan1 → dropped;
    # event 3: Jan20; event 4 (user 20): Mar1 is after Jan5 → dropped
    assert got == {1: "jan3", 3: "jan20"}


def test_hll_approx_distinct_accuracy(ray_session):
    """HLL estimate within ~3σ (5%) of exact on 50k values of known
    cardinality, and invariant to block structure (mergeability)."""
    import numpy as np

    from semantic_search_system_ray.stages.sketch import approx_distinct

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 10_000, size=50_000)  # ~10k distinct (coupon-collected)
    exact = len(set(vals.tolist()))
    t = pa.table({"v": vals})
    one_block = rd.from_arrow(t)
    many_blocks = rd.from_arrow([t.slice(i * 5000, 5000) for i in range(10)])
    e1 = approx_distinct(one_block, "v")
    e2 = approx_distinct(many_blocks, "v")
    assert e1 == e2  # register merge is exact → block-structure invariant
    assert abs(e1 - exact) / exact < 0.05


def test_train_split_deterministic_fractions(ray_session):
    from semantic_search_system_ray.stages.textstats import train_split_batch

    ids = pa.table({"doc_id": list(range(20_000))})
    out = rd.from_arrow(ids).map_batches(
        train_split_batch, batch_format="pyarrow"
    ).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.01
    assert abs(frac["val"] - 0.1) < 0.005
    assert abs(frac["test"] - 0.1) < 0.005
    # pure function of the id: same id → same split on a reshuffled subset
    sub = rd.from_arrow(ids.slice(5000, 1000)).random_shuffle(seed=1).map_batches(
        train_split_batch, batch_format="pyarrow"
    ).to_pandas().set_index("doc_id")["split"]
    full = out.set_index("doc_id")["split"]
    assert (full.loc[sub.index] == sub).all()


def test_coarse_primitives_null_keys(ray_session):
    """Null join/group keys must not crash the crc router (advice r2):
    groupby primitives keep null as a group; joins drop null keys
    (SQL semantics)."""
    left = rd.from_arrow(pa.table(
        {"k": ["a", None, "b", None], "v": [1, 2, 3, 4]}
    ))
    right = rd.from_arrow(pa.table(
        {"rk": ["a", None], "payload": ["PA", "PNULL"]}
    ))

    # grouped apply: null is a group (matches Ray native groupby)
    out_schema = pa.schema([("k", pa.string()), ("total", pa.int64())])

    def agg(g) -> pa.Table:
        k = g["k"].iloc[0]
        return pa.Table.from_pydict(
            {"k": [None if (k != k or k is None) else k],
             "total": [int(g["v"].sum())]},
            schema=out_schema,
        )

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    got = {r["k"]: r["total"] for r in
           coarse_grouped_apply(left, ["k"], agg, out_schema).take_all()}
    assert got == {"a": 1, "b": 3, None: 6}

    # attach: null left keys and null right keys are dropped (inner join)
    attach_schema = pa.schema([("v", pa.int64()), ("payload", pa.string())])
    rows = sorted(
        (r["v"], r["payload"])
        for r in coarse_attach(
            left, right, left_key="k", right_key="rk",
            attach_cols=["payload"], out_schema=attach_schema,
        ).take_all()
    )
    assert rows == [(1, "PA")]

    # anti join: null left keys KEPT (never match), null right keys ignored
    anti_schema = pa.schema([("k", pa.string()), ("v", pa.int64())])
    kept = sorted(
        r["v"] for r in coarse_anti_join(
            left, right, left_key="k", right_key="rk", out_schema=anti_schema
        ).take_all()
    )
    assert kept == [2, 3, 4]


def test_coarse_attach_duplicate_right_keys_deterministic(ray_session):
    """Duplicate right keys pick the MIN (key, attach) row, independent of
    block arrival order (advice r2)."""
    left = rd.from_arrow(pa.table({"k": ["z"], "v": [1]}))
    out_schema = pa.schema([("v", pa.int64()), ("p", pa.string())])
    for order in ([("z", "B"), ("z", "A")], [("z", "A"), ("z", "B")]):
        right = rd.from_arrow([
            pa.table({"rk": [order[0][0]], "p": [order[0][1]]}),
            pa.table({"rk": [order[1][0]], "p": [order[1][1]]}),
        ])
        got = coarse_attach(
            left, right, left_key="k", right_key="rk",
            attach_cols=["p"], out_schema=out_schema,
        ).take_all()
        assert [(r["v"], r["p"]) for r in got] == [(1, "A")]


def test_purchase_window_overflow_fallback_parity(ray_session, tmp_path):
    """The composite-overflow fallback (wide time span) must agree with
    the fast composite path (advice r2: loud/correct in all run modes)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    # Force the overflow branch: C = 2^(62 - bitlen(keys_per_partition)) µs.
    # ~200k distinct users over 16 partitions → ~12.5k keys each → bitlen 14
    # → C = 2^48 µs ≈ 8.9 years, while the span below is ~40 years, so
    # rel.max() >= C in every partition. Clustered (click, purchase) pairs
    # guarantee real matches despite the sparse timeline.
    n_noise = 30_000
    base = pd.Timestamp("1990-01-01").value // 1000
    span = int(40 * 365.25 * 24 * 3600 * 1e6)
    noise_ts = base + rng.randint(0, span, size=n_noise)
    noise_users = rng.randint(0, 200_000, size=n_noise)
    noise_type = np.where(rng.rand(n_noise) < 0.3, "purchase", "click")
    n_pairs = 1_000
    pair_users = rng.randint(0, 200_000, size=n_pairs)
    click_ts = base + rng.randint(0, span - 10**9, size=n_pairs)
    purch_ts = click_ts + int(10 * 60 * 1e6)  # purchase 10 min after click
    df = pd.DataFrame({
        "event_id": np.arange(n_noise + 2 * n_pairs),
        "user_id": np.concatenate([noise_users, pair_users, pair_users]),
        "event_type": np.concatenate(
            [noise_type, ["click"] * n_pairs, ["purchase"] * n_pairs]
        ),
        "ts": pd.to_datetime(
            np.concatenate([noise_ts, click_ts, purch_ts]), unit="us"
        ),
        "value": 1.0,
    })
    d = tmp_path / "events.parquet"
    df.to_parquet(d)

    from semantic_search_system_ray.pipelines.queries import q_purchase_click_window

    got = {r["event_id"]: r["n_clicks"]
           for r in q_purchase_click_window(str(tmp_path)).take_all()}

    # exact reference: per-purchase pandas count
    exp = {}
    clicks = df[df.event_type == "click"]
    for _, p in df[df.event_type == "purchase"].iterrows():
        m = clicks[(clicks.user_id == p.user_id)
                   & (clicks.ts >= p.ts - pd.Timedelta(hours=1))
                   & (clicks.ts < p.ts)]
        if len(m):
            exp[int(p.event_id)] = len(m)
    assert got == exp


def test_partitions_sized_from_data_not_cpus(ray_session, monkeypatch):
    """Verdict r2 item 4: coarse partition count must grow with input
    BYTES (bounded partition size), not stay pinned to cluster
    parallelism — and a larger P must not change results."""
    import numpy as np

    from semantic_search_system_ray.stages import util as U

    # skew-heavy corpus: one hot key holds half the rows
    n = 60_000
    rng = np.random.RandomState(0)
    keys = np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 5_000, size=n))
    t = pa.table({"k": keys.astype("int64"), "v": np.ones(n, dtype="int64")})
    ds = rd.from_arrow(t).materialize()

    base = U._default_partitions()
    # tiny target budget → data-derived P must exceed the CPU floor
    monkeypatch.setattr(U, "TARGET_PARTITION_BYTES", 16_384)
    derived = U._default_partitions(ds)
    assert derived > base

    out_schema = pa.schema([("k", pa.int64()), ("total", pa.int64())])

    def agg(df) -> pa.Table:
        g = df.groupby("k", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pydict(
            {"k": g["k"], "total": g["v"]}, schema=out_schema
        )

    got_default = {
        r["k"]: r["total"]
        for r in U.coarse_partition_apply(ds, ["k"], agg, out_schema).take_all()
    }
    monkeypatch.setattr(U, "TARGET_PARTITION_BYTES", 128 << 20)
    got_wide = {
        r["k"]: r["total"]
        for r in U.coarse_partition_apply(
            ds, ["k"], agg, out_schema, num_partitions=derived
        ).take_all()
    }
    assert got_default == got_wide
    assert got_default[0] == int((keys == 0).sum())


def test_grouped_topk_combiner_parity(ray_session):
    """Per-group top-k must match the exact pandas window result even
    when groups span many blocks (the per-block pre-trim is a combiner,
    not an approximation)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    n = 9000
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c", "d"], size=n),
        "key": np.arange(n),
        "val": rng.rand(n).round(6),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    ds = rd.from_arrow([t.slice(i * 1000, 1000) for i in range(9)])

    from semantic_search_system_ray.stages.util import grouped_topk

    got = sorted(
        (r["grp"], r["key"], r["val"])
        for r in grouped_topk(
            ds, ["grp"], ["val", "key"], descending=[True, False], k=5
        ).take_all()
    )
    exp = sorted(
        df.sort_values(["val", "key"], ascending=[False, True])
        .groupby("grp", sort=False).head(5)
        .itertuples(index=False, name=None)
    )
    exp = sorted((g, k, v) for g, k, v in exp)
    assert got == exp


def test_exact_quantiles_histogram(ray_session):
    """Histogram quantiles must equal the exact sorted-multiset rule
    (ceil(q*n)-1) on a multi-block 2dp dataset."""
    import math

    import numpy as np

    from semantic_search_system_ray.stages.sketch import exact_quantiles_histogram

    rng = np.random.RandomState(5)
    vals = np.round(rng.exponential(scale=20.0, size=30_000), 2)
    t = pa.table({"value": vals})
    ds = rd.from_arrow([t.slice(i * 3000, 3000) for i in range(10)])
    got = dict(exact_quantiles_histogram(ds, "value", [0.5, 0.9, 0.99]))
    s = np.sort(vals)
    for q in (0.5, 0.9, 0.99):
        assert got[q] == s[math.ceil(q * len(s)) - 1]


def test_quantile_rank_exact_arithmetic(ray_session):
    """ceil(q*n) in floats overshoots when q*n lands an ulp above an
    integer (0.55*100 → 55.00000000000001); the rank must follow exact
    integer arithmetic, matching DuckDB quantile_disc."""
    import numpy as np

    from semantic_search_system_ray.stages.sketch import (
        _quantile_rank,
        exact_quantiles_histogram,
    )

    assert _quantile_rank(0.55, 100) == 55
    assert _quantile_rank(0.07, 100) == 7
    assert _quantile_rank(0.5, 101) == 51
    assert _quantile_rank(0.0001, 3) == 1  # floor at 1

    # end-to-end vs DuckDB on an n that trips the float pattern
    import duckdb

    vals = np.round(np.arange(1, 101) * 0.37, 2)  # n=100 distinct 2dp
    t = pa.table({"value": vals})
    got = dict(exact_quantiles_histogram(
        rd.from_arrow(t), "value", [0.55, 0.07, 0.28]
    ))
    con = duckdb.connect()
    con.register("tt", t.to_pandas())
    for q in (0.55, 0.07, 0.28):
        exp = con.execute(f"SELECT quantile_disc(value, {q}) FROM tt").fetchone()[0]
        assert got[q] == exp, q


def test_coarse_attach_left_fill(ray_session):
    """how='left' keeps unmatched left rows with fill values; matched rows
    attach normally; int columns come back int64 despite the NaN ride."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_search_system_ray.stages.util import coarse_attach

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "name": list("abcd")}))
    right = rd.from_arrow(pa.table({"rk": [2, 4], "cnt": [20, 40]}))
    out_schema = pa.schema(
        [("k", pa.int64()), ("name", pa.string()), ("cnt", pa.int64())]
    )
    got = coarse_attach(
        left, right, left_key="k", right_key="rk", attach_cols=["cnt"],
        out_schema=out_schema, how="left", fill={"cnt": 0},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [1, 2, 3, 4]
    assert list(got["cnt"]) == [0, 20, 0, 40]
    assert str(got["cnt"].dtype) == "int64"


def test_coarse_attach_broadcast_shuffle_parity(ray_session):
    """Join planning: the broadcast plan (right side under the byte
    threshold → zero left-side shuffle) must produce EXACTLY the shuffle
    plan's output — dup right keys (deterministic min pick), null keys
    both sides, inner and left+fill modes."""
    import numpy as np

    rng = np.random.RandomState(5)
    lk = rng.randint(0, 50, size=300).tolist() + [None] * 4
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "payload": pa.array(range(304), pa.int64()),
    })).repartition(3)
    rk = rng.randint(0, 60, size=80).tolist()
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk + rk[:20] + [None], pa.int64()),  # dups + null
        "val": pa.array([f"v{i % 37}" for i in range(101)], pa.string()),
    })).repartition(2)

    for how, fill in (("inner", None), ("left", {"val": "MISS"})):
        out_schema = pa.schema(
            [("k", pa.int64()), ("payload", pa.int64()), ("val", pa.string())]
        )
        kw = dict(left_key="k", right_key="rk", attach_cols=["val"],
                  out_schema=out_schema, how=how, fill=fill)
        bc = coarse_attach(left, right, broadcast_bytes=1 << 30, **kw
                           ).to_pandas()
        sh = coarse_attach(left, right, broadcast_bytes=0, **kw).to_pandas()
        bc = bc.sort_values(["payload"]).reset_index(drop=True)
        sh = sh.sort_values(["payload"]).reset_index(drop=True)
        assert bc["k"].tolist() == sh["k"].tolist(), how
        assert bc["val"].tolist() == sh["val"].tolist(), how
        if how == "left":
            assert len(bc) == 300  # null-key left rows dropped, rest kept
            assert (bc["val"] == "MISS").any()


def test_coarse_anti_join_null_int_key_kept_as_null(ray_session):
    """A null left key follows NOT EXISTS (row KEPT) even when the output
    column is int64 — the kept key rides as null, not a conversion crash."""
    from semantic_search_system_ray.stages.util import coarse_anti_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, None], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([1, None], pa.int64())}))
    got = coarse_anti_join(
        left, right, left_key="k", right_key="rk",
        out_schema=pa.schema([("k", pa.int64())]),
    ).to_pandas()
    assert len(got) == 2  # 2 (no match) + the null-key row
    assert got["k"].isna().sum() == 1 and 2 in set(got["k"].dropna())


def test_salted_group_sum_parity_on_hot_key(ray_session):
    """The explicit salted two-phase aggregation (north rule wording)
    must equal a direct groupby — exercised on a head key holding 2/3
    of all rows across multiple blocks."""
    import numpy as np
    import pandas as pd

    from semantic_search_system_ray.stages.util import salted_group_sum

    rng = np.random.RandomState(17)
    n = 30_000
    keys = np.where(rng.rand(n) < (2 / 3), "HEAD", rng.choice(
        [f"k{i}" for i in range(50)], size=n
    ))
    vals = rng.randint(0, 1000, size=n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(9)

    got = {
        r["k"]: r["total"]
        for r in salted_group_sum(
            ds, ["k"], "v", n_salts=8, alias="total"
        ).take_all()
    }
    want = pd.Series(vals).groupby(keys).sum().to_dict()
    assert got == want
