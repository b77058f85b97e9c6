"""Deduplication operators for large-scale corpora — exact and near-dup.

All are Ray-Data-native compositions:

- **exact_dedup**: content-hash per batch (vectorized) → hash-partitioned
  groupby → per-group min representative. The hash column keeps long text
  out of the shuffle.
- **minhash_lsh_clusters**: shingle → MinHash signature per doc (batch,
  numpy) → explode to LEAN (band, band_hash, doc_id) rows (signatures
  never ride the 16× explosion) → coarse-partition bucket grouping
  (stages/util.coarse_grouped_apply — Ray's ~25µs/group cost paid P
  times, not per bucket) → star candidate pairs → signature verification
  (broadcast map for small collections, DISTRIBUTED hash-join of sigs
  onto pairs beyond ScaleConfig.verify_broadcast_rows — parity-tested) →
  connected components → cluster labels.
- **simhash_clusters**: 64-bit SimHash per doc → 4×16-bit band buckets →
  candidates verified by Hamming distance ≤ k → components.
- **ngram_jaccard_pairs**: same lean LSH candidates (full pairwise within
  capped buckets, since the OUTPUT is pairs), distinct-ed, then EXACT
  char-n-gram Jaccard verification — broadcast gram table below
  threshold, hash-join of serialized gram sets onto the pairs above it.
- **embedding_cosine_dups**: exact all-pairs via broadcast matrix for
  small collections; LSH-bucketed (multi-table hyperplane signatures,
  in-bucket matmul, cross-table pair dedup) as the scale path.

Every operator returns deterministic representatives (min doc id) so
re-runs are idempotent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from semantic_search_system_ray.functions.hashing import (
    char_ngrams,
    hamming64,
    minhash_signature,
    simhash64,
    stable_hash128_hex,
    word_shingles,
)
from semantic_search_system_ray.functions.text import tokenize
from semantic_search_system_ray.stages.cc import min_label_components

_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def _cluster_labels(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_rounds: int,
    driver_edge_threshold: int | None = None,
) -> rd.Dataset:
    """nodes(node) + verified near-dup edges(src,dst) → (doc_id, cluster).

    Scale switch: verified candidate edges are ≪ corpus size (only
    near-dups produce them), so when they fit ``driver_edge_threshold``
    the union-find runs exactly on the driver and ONLY the non-singleton
    labels are broadcast — every other doc is its own cluster (identity,
    computed locally per batch, no shuffle at all). Above the threshold
    the iterative distributed CC (stages/cc.py) takes over."""
    edges = edges.materialize()
    if driver_edge_threshold is None:
        from semantic_search_system_ray.context import scale_config

        driver_edge_threshold = scale_config().cc_driver_edges
    if edges.count() <= driver_edge_threshold:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.take_all():
            u, v = r["src"], r["dst"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        labels = {n: find(n) for n in parent}
        ref = ray.put(labels)

        class _Label:
            def __init__(self):
                self.labels = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                nodes_ = t.column("node").to_pylist()
                return pa.Table.from_pydict(
                    {
                        "doc_id": pa.array(nodes_, pa.string()),
                        "cluster": pa.array(
                            [self.labels.get(n, n) for n in nodes_], pa.string()
                        ),
                    }
                )

        return nodes.map_batches(_Label, batch_format="pyarrow", concurrency=(1, 8))

    labels = min_label_components(nodes, edges, max_rounds=max_rounds)
    return labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t.column("node"), "cluster": t.column("label")}
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(
    ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """(id, text) → one row per distinct text: (doc_id=min id, n_copies).
    Shuffles 16-BYTE (128-bit) hashes + ids, never the text itself —
    128 bits because 64-bit birthday collisions become probable at the
    10^9+-doc scale this targets and would silently merge distinct docs."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            stable_hash128_hex(t or "") for t in batch.column(text_col).to_pylist()
        ]
        ids = [str(v) for v in batch.column(id_col).to_pylist()]
        return pa.Table.from_pydict(
            {"content_hash": pa.array(hashes, pa.string()),
             "doc_id": pa.array(ids, pa.string())}
        )

    def pick_rep(g: pd.DataFrame) -> pa.Table:
        ids = sorted(g["doc_id"], key=lambda x: (len(x), x))  # numeric-string safe
        return pa.Table.from_pydict(
            {"doc_id": pa.array([ids[0]], pa.string()),
             "n_copies": pa.array([len(ids)], pa.int64())}
        )

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    out_schema = pa.schema([("doc_id", pa.string()), ("n_copies", pa.int64())])
    # content_hash cardinality ≈ doc count → coarse-partition grouping
    # (Ray's per-group overhead would dominate a per-hash groupby)
    return coarse_grouped_apply(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        ["content_hash"], pick_rep, out_schema,
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup clustering
# --------------------------------------------------------------------------

def _sig_rows(
    batch: pa.Table, *, text_col: str, id_col: str, num_perm: int, shingle_k: int
) -> pa.Table:
    ids, sigs = [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        toks = [w.lower() for w in tokenize(t or "")]
        sig = minhash_signature(set(word_shingles(toks, shingle_k)), num_perm)
        ids.append(str(i))
        sigs.append(sig.tolist())
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.string()),
            "sig": pa.array(sigs, pa.list_(pa.uint32(), num_perm)),
        }
    )


def _band_rows(batch: pa.Table, *, bands: int, rows_per_band: int) -> pa.Table:
    """(doc_id, sig) → (doc_id, band, band_hash) — signatures do NOT travel
    with the exploded band rows (16× duplication); candidate pairs are
    verified against the broadcast signature table afterwards. The band
    hash is a 16-hex md5 prefix of the joined chunk — md5 (not blake2b)
    so bucket membership is recomputable in the SQL oracle (same hash ⇒
    same buckets, collisions and all)."""
    import hashlib

    out_id, out_band, out_hash = [], [], []
    sigs = batch.column("sig").to_pylist()
    ids = batch.column("doc_id").to_pylist()
    for i, sig in zip(ids, sigs):
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            out_id.append(i)
            out_band.append(b)
            out_hash.append(
                hashlib.md5(",".join(map(str, chunk)).encode()).hexdigest()[:16]
            )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out_id, pa.string()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
        }
    )


_PAIR_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def _bucket_pairs(g: "pd.DataFrame") -> pa.Table:
    """One LSH bucket → star candidate pairs to the bucket-min doc —
    sufficient for CLUSTERING (transitive closure recovers the component)."""
    docs = sorted(set(g["doc_id"]))
    rep = docs[0]
    return pa.Table.from_pydict(
        {"src": pa.array(docs[1:], pa.string()),
         "dst": pa.array([rep] * (len(docs) - 1), pa.string())}
    )


def _star_pairs_part(t: pa.Table) -> pa.Table:
    """Whole-PARTITION star-pair emission (the vectorized replacement
    for per-group ``_bucket_pairs``): LSH buckets are corpus-cardinality
    keys — mostly singletons — so a per-group fn pays one Python call
    per bucket. This pays ONE Arrow sort per partition: rows sort by
    (band, band_hash, doc_id); run boundaries and within-run duplicate
    docs fall out of vectorized adjacent-compare; each run's first doc
    is the representative and every other distinct member emits one
    (member, rep) star edge. Singleton buckets emit nothing (the old
    ``min_group_size=2``)."""
    n = t.num_rows
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    srt = t.sort_by(
        [("band", "ascending"), ("band_hash", "ascending"),
         ("doc_id", "ascending")]
    )
    new_run = np.zeros(n, bool)
    new_run[0] = True
    for k in ("band", "band_hash"):
        col = srt.column(k).combine_chunks()
        new_run[1:] |= pc.not_equal(
            col.slice(1), col.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    doc = srt.column("doc_id").combine_chunks()
    keep = new_run.copy()
    keep[1:] |= pc.not_equal(
        doc.slice(1), doc.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    rid = (np.cumsum(new_run) - 1)[keep]
    docs_kept = doc.to_numpy(zero_copy_only=False)[keep]
    k_ = len(docs_kept)
    if k_ == 0:
        return _PAIR_SCHEMA.empty_table()
    first = np.ones(k_, bool)
    first[1:] = rid[1:] != rid[:-1]
    # index of each row's run-first via running max over first positions
    first_idx = np.maximum.accumulate(np.where(first, np.arange(k_), 0))
    members = ~first
    return pa.Table.from_pydict(
        {"src": pa.array(docs_kept[members], pa.string()),
         "dst": pa.array(docs_kept[first_idx[members]], pa.string())},
        schema=_PAIR_SCHEMA,
    )


def _bucket_all_pairs(g: "pd.DataFrame", cap: int = 64) -> pa.Table:
    """One LSH bucket → ALL candidate pairs (needed when the OUTPUT is the
    pair list, not clusters). Buckets above ``cap`` members fall back to
    star pairs — a giant bucket means the banding threshold is too loose
    for pairwise semantics anyway."""
    docs = sorted(set(g["doc_id"]))
    if len(docs) > cap:
        return _bucket_pairs(g)
    src, dst = [], []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            src.append(docs[j])
            dst.append(docs[i])
    return pa.Table.from_pydict(
        {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
    )


# How many docs the broadcast-verification path will tolerate before the
# pipelines switch to the distributed hash-join path ("auto" mode). The
# broadcast map costs ~0.5 KB/doc on the driver and in each worker.
# (centralized: context.ScaleConfig.verify_broadcast_rows, anchor 1M,
#  SSR_VERIFY_BROADCAST_ROWS override)


def _verify_broadcast_rows() -> int:
    from semantic_search_system_ray.context import scale_config

    return scale_config().verify_broadcast_rows


def _sigs_binary(sigs: rd.Dataset) -> rd.Dataset:
    """(doc_id, sig list<uint32>) → (doc_id, sig binary) — fixed-size-list
    columns serialize to plain bytes so they ride the join shuffle as a
    primitive column (nullable through unions, pandas-safe)."""

    def ser(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array(
                    [np.asarray(s, dtype=np.uint32).tobytes()
                     for s in t.column("sig").to_pylist()],
                    pa.binary(),
                ),
            }
        )

    return sigs.map_batches(ser, batch_format="pyarrow")


def _verify_pairs_join(
    pairs: rd.Dataset, sigs: rd.Dataset, threshold: float
) -> rd.Dataset:
    """Distributed verification: hash-join each pair endpoint's signature
    onto the pair (stages/util.coarse_attach — both sides shuffled by key
    into coarse partitions, pandas C-merge inside), then compare
    signatures vectorized. NOTHING is materialized on the driver; the full
    signature table rides two bounded shuffles (~256 B/doc). Pairs whose
    endpoint lacks a signature drop out (inner join) — same semantics as
    the broadcast path's ``m.get(...) is None`` skip."""
    from semantic_search_system_ray.stages.util import coarse_attach

    sb = _sigs_binary(sigs)
    step1 = coarse_attach(
        pairs, sb, left_key="src", right_key="doc_id",
        attach_cols=["sig"], attach_as=["sig_a"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()), ("sig_a", pa.binary())]
        ),
    )
    step2 = coarse_attach(
        step1, sb, left_key="dst", right_key="doc_id",
        attach_cols=["sig"], attach_as=["sig_b"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("sig_a", pa.binary()), ("sig_b", pa.binary())]
        ),
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        aa = np.stack(
            [np.frombuffer(x, dtype=np.uint32) for x in t.column("sig_a").to_pylist()]
        )
        bb = np.stack(
            [np.frombuffer(x, dtype=np.uint32) for x in t.column("sig_b").to_pylist()]
        )
        keep = (aa == bb).mean(axis=1) >= threshold
        return t.select(["src", "dst"]).filter(pa.array(keep))

    return step2.map_batches(verify, batch_format="pyarrow")


def _verify_pairs_with_sigs(pairs: rd.Dataset, sigs: rd.Dataset, threshold: float):
    """Broadcast verification (small-collection path): signatures travel
    via ray.put as ONE stacked doc-count × num_perm uint32 matrix plus a
    doc_id → row-index map; each batch maps its pair endpoints to row
    indices (pandas C-level map) and compares the two gathered slices in
    one vectorized equality — no per-pair Python (r3 verdict #7), same
    shape as ``_verify_pairs_join``. Beyond
    ``ScaleConfig.verify_broadcast_rows`` docs use ``_verify_pairs_join``."""
    import pandas as pd

    # Collect as ARROW blocks, not Python rows: the flat uint32 child of
    # the fixed-size-list sig column reshapes zero-copy into the stacked
    # matrix (row-of-dicts take_all + per-row np.stack measured ~2 s of
    # pure Python at the 60k-doc skew bench vs ~0.1 s here)
    tables = [t for t in ray.get(sigs.to_arrow_refs()) if t.num_rows > 0]
    if tables:
        tbl = pa.concat_tables(tables)
        sig_col = tbl.column("sig").combine_chunks()
        num_perm = sig_col.type.list_size
        mat = sig_col.values.to_numpy(zero_copy_only=False).astype(
            np.uint32, copy=False
        ).reshape(-1, num_perm)
        idx = {d: i for i, d in enumerate(tbl.column("doc_id").to_pylist())}
    else:
        idx, mat = {}, np.zeros((0, 1), np.uint32)
    ref = ray.put((idx, mat))
    _cache: dict[str, tuple] = {}

    def verify(t: pa.Table) -> pa.Table:
        m = _cache.get("m")
        if m is None:
            m = ray.get(ref)
            _cache["m"] = m
        idx, mat = m
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        ia = t.column("src").to_pandas().map(idx)
        ib = t.column("dst").to_pandas().map(idx)
        present = (ia.notna() & ib.notna()).to_numpy()
        ra = ia.to_numpy()[present].astype(np.int64)
        rb = ib.to_numpy()[present].astype(np.int64)
        sim = (mat[ra] == mat[rb]).mean(axis=1) if len(ra) else np.zeros(0)
        keep = np.zeros(t.num_rows, bool)
        keep[np.flatnonzero(present)[sim >= threshold]] = True
        return t.select(["src", "dst"]).filter(pa.array(keep))

    return pairs.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_clusters(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_rounds: int = 8,
    verify: str = "auto",
    driver_edge_threshold: int | None = None,
) -> rd.Dataset:
    """→ (doc_id, cluster): near-dup cluster representative (min doc id in
    the transitive closure of verified candidate pairs).

    ``verify``: "broadcast" (signature map via ray.put — small
    collections), "join" (distributed hash-join of signatures onto pairs —
    the 100 TB path, no driver materialization), or "auto" (switch on
    ``ScaleConfig.verify_broadcast_rows`` docs). Both paths produce identical
    edges (parity-tested)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        _sig_rows, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col, num_perm=num_perm,
                       shingle_k=3),
    ).materialize()  # reused: banding + pair verification
    banded = sigs.map_batches(
        _band_rows, batch_format="pyarrow",
        fn_kwargs=dict(bands=bands, rows_per_band=rows_per_band),
    )

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    candidates = coarse_partition_apply(
        banded, ["band", "band_hash"], _star_pairs_part, _PAIR_SCHEMA,
        fn_format="pyarrow",
    )
    # distinct BEFORE verify/CC: a near-dup family surfaces in EVERY band
    # (the planted-skew worst case emits ~bands× duplicate star edges —
    # 640k vs 40k distinct at the 60k-doc skew bench, which alone pushed
    # CC past its driver threshold into the iterative path); the tree
    # distinct collapses duplicates in per-block combiners first.
    from semantic_search_system_ray.pipelines.kg_build import distinct_rows

    candidates = distinct_rows(
        candidates, ["src", "dst"], strategy="tree", out_blocks=8
    )
    if verify == "auto":
        verify = "broadcast" if sigs.count() <= _verify_broadcast_rows() else "join"
    if verify == "join":
        edges = _verify_pairs_join(candidates, sigs, threshold)
    else:
        edges = _verify_pairs_with_sigs(candidates, sigs, threshold)
    # node ids come straight from the input (don't re-run the signature
    # pass just to list ids)
    nodes = ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": pa.array([str(v) for v in t.column(id_col).to_pylist()], pa.string())}
        ),
        batch_format="pyarrow",
    )
    return _cluster_labels(nodes, edges, max_rounds=max_rounds,
                           driver_edge_threshold=driver_edge_threshold)


# --------------------------------------------------------------------------
# Incremental near-dup dedup (probe NEW docs against an INDEXED corpus)
# --------------------------------------------------------------------------

INCR_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("status", pa.string()),
     ("dup_of", pa.string())]
)


def _bucket_incr_pairs(g: "pd.DataFrame") -> pa.Table:
    """One LSH bucket with BOTH sides present → (incoming, bucket-min
    INDEXED doc) candidate pairs. Deterministic star rule like
    ``_bucket_pairs`` (each incoming doc gets at most ``bands``
    candidates — never an all-pairs blowup on hot buckets); incremental
    semantics never pairs incoming docs with each other."""
    old = sorted(set(g.loc[~g["is_new"], "doc_id"]))
    new = sorted(set(g.loc[g["is_new"], "doc_id"]))
    if not old or not new:
        return _PAIR_SCHEMA.empty_table()
    return pa.Table.from_pydict(
        {"src": pa.array(new, pa.string()),
         "dst": pa.array([old[0]] * len(new), pa.string())},
        schema=_PAIR_SCHEMA,
    )


def minhash_incremental(
    indexed: rd.Dataset,
    incoming: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: str = "auto",
) -> rd.Dataset:
    """Incremental ingestion dedup: probe every INCOMING doc against the
    already-INDEXED corpus → (doc_id, status ∈ {dup, novel}, dup_of) —
    one row per incoming doc, ``dup_of`` = the minimum verified indexed
    match ('' when novel). The reference processes new documents
    against its stored corpus via the unprocessed work queue
    (ingest/pr_meta_store.py get_unprocessed_*); here the probe is the
    LSH path: one signature pass over BOTH sides (tagged union), band
    rows, per-bucket (incoming → bucket-min indexed) candidate stars
    (deterministic, ≤ ``bands`` candidates per incoming doc — the
    documented contract: a near-dup of a non-min indexed doc in a
    bucket whose min doesn't verify is reported novel, identically on
    both sides), signature verification (broadcast ↔ join scale
    switch), then a per-incoming-doc min and a LEFT attach onto the
    full incoming id set. No connected components — incremental dedup
    needs no transitive closure, so the whole probe is
    shuffle-bounded: one bucket cogroup + one verify + two small
    combines."""
    import pandas as pd

    from semantic_search_system_ray.pipelines.kg_build import distinct_rows
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_grouped_apply,
        coarse_partition_apply,
    )

    rows_per_band = num_perm // bands

    def sided_sigs(ds: rd.Dataset, is_new: bool) -> rd.Dataset:
        def fn(t: pa.Table) -> pa.Table:
            s = _sig_rows(t, text_col=text_col, id_col=id_col,
                          num_perm=num_perm, shingle_k=3)
            return s.append_column(
                "is_new", pa.nulls(s.num_rows, pa.bool_()).fill_null(is_new)
            )
        return ds.map_batches(fn, batch_format="pyarrow")

    sigs = sided_sigs(indexed, False).union(
        sided_sigs(incoming, True)
    ).materialize()

    def banded(t: pa.Table) -> pa.Table:
        b = _band_rows(t, bands=bands, rows_per_band=rows_per_band)
        flags = np.repeat(
            t.column("is_new").to_numpy(zero_copy_only=False), bands
        )
        return b.append_column("is_new", pa.array(flags, pa.bool_()))

    candidates = coarse_grouped_apply(
        sigs.map_batches(banded, batch_format="pyarrow"),
        ["band", "band_hash"], _bucket_incr_pairs, _PAIR_SCHEMA,
        min_group_size=2,
    )
    # a (new, old_min) pair surfaces once per colliding band — collapse
    # before paying verification
    candidates = distinct_rows(
        candidates, ["src", "dst"], strategy="tree", out_blocks=8
    )
    sig_tbl = sigs.select_columns(["doc_id", "sig"]).materialize()
    if verify == "auto":
        verify = (
            "broadcast" if sig_tbl.count() <= _verify_broadcast_rows()
            else "join"
        )
    if verify == "join":
        edges = _verify_pairs_join(candidates, sig_tbl, threshold)
    else:
        edges = _verify_pairs_with_sigs(candidates, sig_tbl, threshold)

    dup_schema = pa.schema([("doc_id", pa.string()), ("dup_of", pa.string())])

    def min_dup(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return dup_schema.empty_table()
        agg = df.groupby("src", sort=False)["dst"].min().reset_index()
        return pa.Table.from_pydict(
            {"doc_id": agg["src"].to_numpy(), "dup_of": agg["dst"].to_numpy()},
            schema=dup_schema,
        )

    dups = coarse_partition_apply(edges, ["src"], min_dup, dup_schema)

    ids = incoming.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pa.array(
                [str(v) for v in t.column(id_col).to_pylist()], pa.string()
            )}
        ),
        batch_format="pyarrow",
    )
    attached = coarse_attach(
        ids, dups, left_key="doc_id", right_key="doc_id",
        attach_cols=["dup_of"],
        out_schema=dup_schema, how="left", fill={"dup_of": ""},
    )

    def finish(t: pa.Table) -> pa.Table:
        dup_of = pc.cast(t.column("dup_of"), pa.string())
        status = pc.if_else(
            pc.equal(dup_of, pa.scalar("", pa.string())),
            pa.scalar("novel", pa.string()), pa.scalar("dup", pa.string()),
        )
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "status": status,
             "dup_of": dup_of},
            schema=INCR_SCHEMA,
        )

    return attached.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SimHash near-dup clustering
# --------------------------------------------------------------------------

def simhash_table(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            ids.append(str(i))
            hs.append(simhash64([w.lower() for w in tokenize(t or "")]))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "simhash": pa.array([f"{h:016x}" for h in hs], pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_clusters(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_rounds: int = 8,
) -> rd.Dataset:
    """Near-dup via SimHash banding: 4×16-bit chunks as bucket keys (any
    pair within Hamming ≤ 3 of 64 bits shares ≥1 exact chunk by pigeonhole
    when ≤3 differing bits hit ≤3 chunks); verify Hamming, then components."""
    sims = simhash_table(ds, text_col=text_col, id_col=id_col)

    def band(batch: pa.Table) -> pa.Table:
        ids, bnd, key, full = [], [], [], []
        for i, hx in zip(batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()):
            h = int(hx, 16)
            for b in range(4):
                ids.append(i)
                bnd.append(b)
                key.append((h >> (16 * b)) & 0xFFFF)
                full.append(hx)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()), "band": pa.array(bnd, pa.int32()),
             "chunk": pa.array(key, pa.int32()), "simhash": pa.array(full, pa.string())}
        )

    def bucket_edges(g: pd.DataFrame) -> pa.Table:
        docs = sorted(zip(g["doc_id"], g["simhash"]), key=lambda x: x[0])
        src, dst = [], []
        if len(docs) > 1:
            rep_id, rep_h = docs[0]
            for d, hx in docs[1:]:
                if hamming64(int(hx, 16), int(rep_h, 16)) <= max_hamming:
                    src.append(d)
                    dst.append(rep_id)
        return pa.Table.from_pydict(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    edges = coarse_grouped_apply(
        sims.map_batches(band, batch_format="pyarrow"),
        ["band", "chunk"], bucket_edges, _EDGE_SCHEMA, min_group_size=2,
    )
    nodes = ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": pa.array([str(v) for v in t.column(id_col).to_pylist()], pa.string())}
        ),
        batch_format="pyarrow",
    )
    return _cluster_labels(nodes, edges, max_rounds=max_rounds)


# --------------------------------------------------------------------------
# n-gram Jaccard pairs (LSH candidates + exact verification)
# --------------------------------------------------------------------------

_GRAM_SEP = "\x1f"
_JACCARD_SCHEMA = pa.schema(
    [("id_a", pa.string()), ("id_b", pa.string()), ("jaccard", pa.float64())]
)


def _jaccard_of_serialized(sa: str, sb: str) -> float:
    a = set(sa.split(_GRAM_SEP)) if sa else set()
    b = set(sb.split(_GRAM_SEP)) if sb else set()
    if not a or not b:
        return 0.0
    inter = len(a & b)
    if not inter:
        return 0.0
    return inter / (len(a) + len(b) - inter)


def _ragged_take(off: np.ndarray, rows: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices that gather CSR rows ``rows`` (lengths ``lens``) out of
    a ragged array with offsets ``off`` — the standard repeat/arange trick,
    no Python loop."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.repeat(off[rows] - cum, lens) + np.arange(total, dtype=np.int64)


def _pair_intersections(
    la: np.ndarray, flat_a: np.ndarray, lb: np.ndarray, flat_b: np.ndarray
) -> np.ndarray:
    """Exact |A ∩ B| for a batch of set pairs in CSR layout with NO
    per-pair Python — the pair-key trick (see _jaccard_pairs_vectorized):
    factorize all gram strings to int codes, key each occurrence as
    pair_idx · G + code, sort; a key appearing twice (once per side,
    grams are distinct within a side) is one intersecting gram."""
    import pandas as pd

    n = len(la)
    la = np.asarray(la, np.int64)
    lb = np.asarray(lb, np.int64)
    if n == 0 or int(la.sum() + lb.sum()) == 0:
        return np.zeros(n, np.int64)
    codes, _ = pd.factorize(np.concatenate([flat_a, flat_b]))
    G = int(codes.max()) + 1
    ca, cb = codes[: la.sum()], codes[la.sum():]
    keys = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), la) * G + ca,
         np.repeat(np.arange(n, dtype=np.int64), lb) * G + cb]
    )
    keys.sort(kind="stable")
    dup = keys[:-1][keys[1:] == keys[:-1]]
    return np.bincount(dup // G, minlength=n).astype(np.int64)


def _jaccard_pairs_vectorized(
    src: np.ndarray,
    dst: np.ndarray,
    la: np.ndarray,
    flat_a: np.ndarray,
    lb: np.ndarray,
    flat_b: np.ndarray,
    threshold: float,
) -> pa.Table:
    """Exact per-pair Jaccard for a batch of candidate pairs with NO
    per-pair Python (r3 verdict #7) — the shared kernel behind both the
    broadcast and the join verification regimes.

    CSR-ish inputs: ``la``/``lb`` are per-pair gram counts and
    ``flat_a``/``flat_b`` the correspondingly flattened gram values
    (within one side, one pair's grams are already distinct). The
    pair-key trick computes every intersection size in one sort:
    factorize all gram strings of the batch to int codes, key each
    occurrence as pair_idx * G + code, sort the concatenated keys — a
    key appearing twice (necessarily once per side) is one intersecting
    gram; a bincount by pair recovers |A ∩ B|. O(total grams · log)
    instead of O(pairs) Python set ops."""
    n = len(src)
    la = np.asarray(la, np.int64)
    lb = np.asarray(lb, np.int64)
    total = int(la.sum() + lb.sum())
    if n == 0 or total == 0:
        return _JACCARD_SCHEMA.empty_table()
    inter = _pair_intersections(la, flat_a, lb, flat_b)
    union = la + lb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = (inter > 0) & (jac >= threshold)
    src_k = np.asarray(src, dtype=object)[keep].astype(str)
    dst_k = np.asarray(dst, dtype=object)[keep].astype(str)
    swap = src_k > dst_k
    return pa.Table.from_pydict(
        {
            "id_a": pa.array(np.where(swap, dst_k, src_k), pa.string()),
            "id_b": pa.array(np.where(swap, src_k, dst_k), pa.string()),
            "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
        },
        schema=_JACCARD_SCHEMA,
    )


def _verify_grams_join(
    candidates: rd.Dataset, sigs: rd.Dataset, threshold: float
) -> rd.Dataset:
    """Distributed exact-Jaccard verification: gram sets (serialized to one
    string per doc) hash-join onto the candidate pairs via coarse_attach —
    no driver materialization of the gram table."""
    from semantic_search_system_ray.stages.util import coarse_attach

    grams = sigs.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "g": pa.array(
                    [_GRAM_SEP.join(g) for g in t.column("grams").to_pylist()],
                    pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    step1 = coarse_attach(
        candidates, grams, left_key="src", right_key="doc_id",
        attach_cols=["g"], attach_as=["g_a"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()), ("g_a", pa.string())]
        ),
    )
    step2 = coarse_attach(
        step1, grams, left_key="dst", right_key="doc_id",
        attach_cols=["g"], attach_as=["g_b"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("g_a", pa.string()), ("g_b", pa.string())]
        ),
    )

    def verify(t: pa.Table) -> pa.Table:
        # empty/null serialized grams = empty set = jaccard 0 → drop first
        # (filter treats nulls as false, matching the set version's skip)
        t = t.filter(
            pc.and_(pc.not_equal(t.column("g_a"), ""),
                    pc.not_equal(t.column("g_b"), ""))
        )
        if t.num_rows == 0:
            return _JACCARD_SCHEMA.empty_table()
        ga = pc.split_pattern(t.column("g_a"), _GRAM_SEP).combine_chunks()
        gb = pc.split_pattern(t.column("g_b"), _GRAM_SEP).combine_chunks()
        return _jaccard_pairs_vectorized(
            t.column("src").combine_chunks().to_numpy(zero_copy_only=False),
            t.column("dst").combine_chunks().to_numpy(zero_copy_only=False),
            pc.list_value_length(ga).to_numpy(zero_copy_only=False),
            pc.list_flatten(ga).to_numpy(zero_copy_only=False),
            pc.list_value_length(gb).to_numpy(zero_copy_only=False),
            pc.list_flatten(gb).to_numpy(zero_copy_only=False),
            threshold,
        )

    return step2.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    verify: str = "auto",
) -> rd.Dataset:
    """→ (id_a, id_b, jaccard) for pairs with EXACT char-n-gram Jaccard ≥
    threshold. Candidates come from MinHash-LSH over the n-gram sets;
    candidate PAIRS (ids only — gram sets never ride the exploded band
    rows) are distinct-ed, then verified exactly — against a broadcast
    gram table below ``ScaleConfig.verify_broadcast_rows`` docs, else by
    hash-joining the gram sets onto the pairs (``verify="join"``, the
    100 TB path; parity-tested against broadcast)."""
    rows_per_band = num_perm // bands

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids, sigs, grams = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            gs = char_ngrams((t or "").lower(), n)
            ids.append(str(i))
            sigs.append(minhash_signature(gs, num_perm).tolist())
            grams.append(sorted(gs))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "sig": pa.array(sigs, pa.list_(pa.uint32(), num_perm)),
             "grams": pa.array(grams, pa.list_(pa.string()))}
        )

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    banded = sigs.map_batches(
        _band_rows, batch_format="pyarrow",
        fn_kwargs=dict(bands=bands, rows_per_band=rows_per_band),
    )

    from semantic_search_system_ray.pipelines.kg_build import distinct_rows
    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    candidates = distinct_rows(
        coarse_grouped_apply(
            banded, ["band", "band_hash"], _bucket_all_pairs, _PAIR_SCHEMA,
            min_group_size=2,
        ),
        ["src", "dst"],
        strategy="tree",
        out_blocks=8,
    )

    if verify == "auto":
        verify = "broadcast" if sigs.count() <= _verify_broadcast_rows() else "join"
    if verify == "join":
        return _verify_grams_join(candidates, sigs, threshold)

    # broadcast regime: the gram table travels via ray.put as ONE ragged
    # CSR (doc_id → row dict, offsets, flat gram values); each batch maps
    # endpoints to rows (pandas C map), gathers both sides with a
    # vectorized ragged take, and runs the shared pair-key intersection
    # kernel — no per-pair Python in this regime either (r3 verdict #7).
    # collect as ARROW (not row dicts): lengths/flat come from the list
    # kernels in one C pass each instead of a per-gram comprehension
    parts = [
        t for t in ray.get(
            sigs.select_columns(["doc_id", "grams"]).to_arrow_refs()
        ) if t.num_rows
    ]
    if parts:
        tbl = pa.concat_tables(parts)
        grams_col = tbl.column("grams").combine_chunks()
        idx = {d: i for i, d in enumerate(tbl.column("doc_id").to_pylist())}
        lens = pc.list_value_length(grams_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(grams_col).to_numpy(zero_copy_only=False)
    else:
        idx, lens = {}, np.zeros(0, np.int64)
        flat = np.zeros(0, dtype=object)
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    ref = ray.put((idx, off, flat))
    _cache: dict[str, tuple] = {}

    def verify(t: pa.Table) -> pa.Table:
        import pandas as pd

        m = _cache.get("m")
        if m is None:
            m = ray.get(ref)
            _cache["m"] = m
        idx, off, flat = m
        if t.num_rows == 0:
            return _JACCARD_SCHEMA.empty_table()
        ia = t.column("src").to_pandas().map(idx)
        ib = t.column("dst").to_pandas().map(idx)
        present = (ia.notna() & ib.notna()).to_numpy()
        ra = ia.to_numpy()[present].astype(np.int64)
        rb = ib.to_numpy()[present].astype(np.int64)
        la, lb = off[ra + 1] - off[ra], off[rb + 1] - off[rb]
        return _jaccard_pairs_vectorized(
            t.column("src").combine_chunks().to_numpy(
                zero_copy_only=False)[present],
            t.column("dst").combine_chunks().to_numpy(
                zero_copy_only=False)[present],
            la, flat[_ragged_take(off, ra, la)],
            lb, flat[_ragged_take(off, rb, lb)],
            threshold,
        )

    return candidates.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding-cosine near-dup (broadcast matrix; LSH path in stages/ann.py)
# --------------------------------------------------------------------------

def embedding_cosine_dups(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    strategy: str = "auto",
    broadcast_threshold: int = 200_000,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 13,
) -> rd.Dataset:
    """→ (id_a, id_b, cos_sim) for pairs with cosine ≥ threshold, id_a <
    id_b (int ids compare numerically, others lexicographically).

    - ``strategy="exact"``: EXACT all-pairs — the full normalized (id,
      matrix) broadcasts via ray.put; each batch does a (batch × all)
      matmul. Right answer for collections that fit a worker
      (≤ ``broadcast_threshold`` rows).
    - ``strategy="lsh"``: the 100 TB path — random-hyperplane LSH buckets
      (``num_tables`` independent tables × ``num_planes`` bits; seeded,
      deterministic) restrict comparison to same-bucket rows via a
      coarse-partition group apply; duplicate pair hits across tables are
      deduplicated. Approximate: recall controlled by num_tables ×
      num_planes (miss prob (1-p^planes)^tables, p = 1 - θ/π).
    - ``strategy="auto"``: exact below ``broadcast_threshold``, else lsh.
    """
    if strategy == "auto":
        # materialize before branching: count() on an unmaterialized
        # Dataset executes the upstream pipeline, and BOTH branches read
        # the data again right after — without this the input ran twice
        ds = ds.materialize()
        strategy = "exact" if ds.count() <= broadcast_threshold else "lsh"
    if strategy == "lsh":
        return _cosine_dups_lsh(
            ds, id_col=id_col, vec_col=vec_col, threshold=threshold,
            num_planes=num_planes, num_tables=num_tables, seed=seed,
        )

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows])
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    ref = ray.put((ids, mat))

    class _Pairs:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            id_type = batch.schema.field(id_col).type
            from semantic_search_system_ray.stages.ann import list_column_to_matrix

            bids = np.array(batch.column(id_col).to_pylist())
            bmat = list_column_to_matrix(batch.column(vec_col))
            bn = np.linalg.norm(bmat, axis=1)
            bn[bn == 0] = 1.0
            bmat = bmat / bn[:, None]
            sims = bmat @ self.mat.T
            ia, ib, cs = [], [], []
            for r in range(sims.shape[0]):
                hits = np.where(sims[r] >= threshold)[0]
                for c in hits:
                    if bids[r] < self.ids[c]:
                        ia.append(bids[r].item()); ib.append(self.ids[c].item())
                        cs.append(round(float(sims[r, c]), 6))
            return pa.Table.from_pydict(
                {"id_a": pa.array(ia, id_type), "id_b": pa.array(ib, id_type),
                 "cos_sim": pa.array(cs, pa.float64())}
            )

    return ds.map_batches(_Pairs, batch_format="pyarrow", concurrency=(1, 8))


def _cosine_dups_lsh(
    ds: rd.Dataset,
    *,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_planes: int,
    num_tables: int,
    seed: int,
) -> rd.Dataset:
    """LSH-bucketed near-dup pairs: every vector lands in ``num_tables``
    buckets (one per independent hyperplane table); all-pairs cosine runs
    ONLY within buckets (coarse-partition grouping — bucket count ≈ corpus
    size, so never a per-key Ray groupby); a same-keyed pass dedups pair
    hits found by multiple tables. Vectors ride the bucket shuffle
    normalized + serialized (float64 bytes) — ``num_tables`` × duplication
    of the vector payload is the standard LSH space/recall trade."""
    from semantic_search_system_ray.stages.ann import lsh_signature
    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    probe = ds.take(1)
    if not probe:
        return rd.from_arrow(
            pa.schema(
                [("id_a", pa.string()), ("id_b", pa.string()),
                 ("cos_sim", pa.float64())]
            ).empty_table()
        )
    dim = len(probe[0][vec_col])
    id_type = pa.int64() if isinstance(probe[0][id_col], int) else pa.string()
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_tables, num_planes, dim))
    planes_ref = ray.put(planes)
    pair_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type), ("cos_sim", pa.float64())]
    )

    class _Bucketize:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from semantic_search_system_ray.stages.ann import list_column_to_matrix

            ids = batch.column(id_col).to_pylist()
            mat = list_column_to_matrix(batch.column(vec_col))
            n = np.linalg.norm(mat, axis=1)
            n[n == 0] = 1.0
            mat = mat / n[:, None]
            vec_bytes = [row.tobytes() for row in mat]
            out_bucket, out_id, out_vec = [], [], []
            for ti in range(self.planes.shape[0]):
                sig = lsh_signature(mat, self.planes[ti])
                for i, s in enumerate(sig):
                    out_bucket.append(f"{ti}:{int(s)}")
                    out_id.append(ids[i])
                    out_vec.append(vec_bytes[i])
            return pa.Table.from_pydict(
                {"bucket": pa.array(out_bucket, pa.string()),
                 "vid": pa.array(out_id, id_type),
                 "vec": pa.array(out_vec, pa.binary())}
            )

    bucketed = ds.map_batches(_Bucketize, batch_format="pyarrow", concurrency=(1, 8))

    # Bucket-size cap: a degenerate bucket (many identical/zero vectors,
    # duplicated across num_tables tables) would otherwise trigger an
    # O(n²) dense matmul per partition. Oversized buckets are truncated to
    # the ``bucket_cap`` members with the smallest ids (deterministic) and
    # the drop is logged (no-silent-caps convention) — a bucket this hot
    # means the plane count is too low for the collection anyway.
    bucket_cap = 512

    def bucket_pairs(g) -> pa.Table:
        if len(g) > bucket_cap:
            print(
                f"[cosine_dups_lsh] bucket over cap: {len(g)} members, "
                f"keeping {bucket_cap} smallest ids ({len(g) - bucket_cap} dropped)"
            )
            g = g.sort_values("vid", kind="mergesort").head(bucket_cap)
        ids = list(g["vid"])
        mat = np.stack([np.frombuffer(v, dtype=np.float64) for v in g["vec"]])
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        ia, ib, cs = [], [], []
        for i, j in zip(iu[mask], ju[mask]):
            a, b = ids[i], ids[j]
            if b < a:
                a, b = b, a
            if a == b:
                continue
            ia.append(a); ib.append(b)
            cs.append(round(float(sims[i, j]), 6))
        return pa.Table.from_pydict(
            {"id_a": ia, "id_b": ib, "cos_sim": cs}, schema=pair_schema
        )

    raw_pairs = coarse_grouped_apply(
        bucketed, ["bucket"], bucket_pairs, pair_schema, min_group_size=2
    )

    def first_row(g) -> pa.Table:
        return pa.Table.from_pydict(
            {"id_a": [g["id_a"].iloc[0]], "id_b": [g["id_b"].iloc[0]],
             "cos_sim": [g["cos_sim"].iloc[0]]},
            schema=pair_schema,
        )

    # same pair can surface from several tables → keyed dedup (keeps one)
    return coarse_grouped_apply(raw_pairs, ["id_a", "id_b"], first_row, pair_schema)


# --------------------------------------------------------------------------
# edit-distance (Levenshtein) fuzzy pairs — SymSpell deletion blocking
# --------------------------------------------------------------------------

def _lev_banded(a: str, b: str, k: int) -> int | None:
    """Exact Levenshtein distance if ≤ k, else None — banded DP, O(k·|a|)
    per pair (unit insert/delete/substitute costs; matches DuckDB's
    ``levenshtein``). Used only on blocked candidate pairs."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    if la > lb:  # keep the band bound tight on the shorter outer dim
        a, b, la, lb = b, a, lb, la
    INF = k + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [INF] * (lb + 1)
        cur[0] = i
        lo, hi = max(1, i - k), min(lb, i + k)
        for j in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[max(0, i - k): min(lb, i + k) + 1]) > k:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def _delete_variants(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by ≤ k single-char deletions
    (including ``s`` itself) — the SymSpell blocking neighborhood:
    lev(a, b) ≤ k ⇒ a and b share at least one common variant (a
    substitution is a deletion on each side), so grouping by variant is a
    LOSSLESS candidate generator for distance ≤ k."""
    frontier = {s}
    out = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_pairs(
    ds: rd.Dataset,
    *,
    name_col: str,
    k: int = 2,
    num_partitions: int | None = None,
    assume_distinct: bool = False,
) -> rd.Dataset:
    """→ (name_a, name_b, dist) for all DISTINCT value pairs of
    ``name_col`` within Levenshtein distance ≤ k (name_a < name_b) —
    fuzzy near-duplicate detection for short strings (titles, names,
    vocabulary terms).

    Scale shape (SymSpell symmetric-delete blocking, fully distributed):

    1. distinct values (per-block Arrow distinct combiner → coarse
       partitioned distinct) — identical strings collapse BEFORE
       neighborhood generation, so a hot value can't explode a block;
    2. each value emits its ≤k-deletion variants (≤ 1 + L + L²/2 lean
       (variant, name) rows — linear in the corpus, independent of pair
       count); equal variants co-locate via ONE coarse shuffle;
    3. per-variant-group all-pairs → candidate (name_a, name_b), keyed
       distinct (a pair shared by many variants is emitted once);
    4. exact banded-DP verification (O(k·len) per candidate) attaches
       the distance and drops false candidates. Blocking is lossless
       (see _delete_variants), so the output is EXACTLY the ≤k pair
       set — oracle-comparable against SQL ``levenshtein``.

    ``assume_distinct=True`` skips step 1's row-scale distinct shuffle —
    pass it when ``ds`` already holds one row per distinct non-null
    value (e.g. a vocabulary/stats table a caller built anyway, as
    pipelines/er.golden_records does). Duplicate input rows under this
    flag would emit duplicate variant rows (wasted candidate work), not
    wrong answers — the pair-level distinct still runs.
    """
    from semantic_search_system_ray.pipelines.kg_build import distinct_rows
    from semantic_search_system_ray.stages.util import coarse_grouped_apply
    import pyarrow.compute as pc

    def as_name(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column(name_col), pa.string())
        tt = pa.Table.from_pydict({"name": col})
        return tt.filter(pc.is_valid(tt.column("name")))

    names = ds.map_batches(as_name, batch_format="pyarrow")
    if not assume_distinct:
        names = distinct_rows(names, ["name"], strategy="partition")

    var_schema = pa.schema([("variant", pa.string()), ("name", pa.string())])

    def variants(t: pa.Table) -> pa.Table:
        vs, ns = [], []
        for s in t.column("name").to_pylist():
            if len(s) > 256:
                # neighborhood size is O(len^k) — loud failure instead of
                # a silent blow-up (this operator is for SHORT strings;
                # route long text through ngram_jaccard_pairs instead)
                raise ValueError(
                    f"edit_distance_pairs: value of length {len(s)} > 256 "
                    "unsupported (use ngram_jaccard_pairs for long text)"
                )
            for v in _delete_variants(s, k):
                vs.append(v)
                ns.append(s)
        return pa.Table.from_pydict({"variant": vs, "name": ns},
                                    schema=var_schema)

    pair_key_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string())]
    )

    def group_pairs(g: pd.DataFrame) -> pa.Table:
        ns = sorted(set(g["name"]))
        if len(ns) < 2:
            return pair_key_schema.empty_table()
        aa, bb = [], []
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                aa.append(ns[i])
                bb.append(ns[j])
        return pa.Table.from_pydict({"name_a": aa, "name_b": bb},
                                    schema=pair_key_schema)

    candidates = distinct_rows(
        coarse_grouped_apply(
            names.map_batches(variants, batch_format="pyarrow"),
            ["variant"], group_pairs, pair_key_schema, min_group_size=2,
            num_partitions=num_partitions,
        ),
        ["name_a", "name_b"],
        # candidates (lev <= 2k superset of the output) can exceed one
        # worker — partitioned distinct, and verify parallelism follows
        # the partition count instead of a fixed block cap
        strategy="partition",
    )

    out_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()),
         ("dist", pa.int64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        aa, bb, dd = [], [], []
        for a, b in zip(t.column("name_a").to_pylist(),
                        t.column("name_b").to_pylist()):
            d = _lev_banded(a, b, k)
            if d is not None:
                aa.append(a)
                bb.append(b)
                dd.append(d)
        return pa.Table.from_pydict(
            {"name_a": aa, "name_b": bb, "dist": dd}, schema=out_schema
        )

    return candidates.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MinHash estimator calibration (dedup metrology)
# --------------------------------------------------------------------------

CALIBRATION_SCHEMA = pa.schema(
    [("est_bin", pa.int64()), ("n_pairs", pa.int64()),
     ("sum_inter", pa.int64()), ("sum_union", pa.int64()),
     ("pooled_jaccard", pa.float64())]
)


def minhash_calibration(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pa.Table:
    """Estimated-vs-exact Jaccard CALIBRATION of the MinHash LSH stack —
    the metrology report that justifies a verification threshold before
    a 100 TB dedup run: for every LSH candidate pair (the star pairs
    the clustering pipeline verifies), the signature match-fraction
    estimate is binned (bin = matches·10 // num_perm, an exact integer)
    against the TRUE shingle-set Jaccard, POOLED per bin as
    Σ|A∩B| / Σ|A∪B| — two exact associative int64 sums and ONE trailing
    divide, instead of an order-dependent mean of per-pair ratios.

    Scale shape: one fused pass computes signature AND serialized
    shingle set per doc; banding/bucketing is the clustering pipeline's
    (star candidates, never all-pairs); signatures and gram sets
    hash-join onto pairs (coarse_attach — no driver materialization);
    the intersection kernel is the shared pair-key trick
    (_pair_intersections, no per-pair Python); per-block (bin, n,
    inter, union) partials fold through one ≤11-row groupby."""
    from semantic_search_system_ray.pipelines.kg_build import distinct_rows
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    rows_per_band = num_perm // bands

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids, sigs, grams = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = [w.lower() for w in tokenize(t or "")]
            sh = set(word_shingles(toks, shingle_k))
            sig = minhash_signature(sh, num_perm)
            ids.append(str(i))
            sigs.append(sig.astype(np.uint32).tobytes())
            grams.append(_GRAM_SEP.join(sorted(sh)))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "sig": pa.array(sigs, pa.binary()),
             "g": pa.array(grams, pa.string())}
        )

    docs = ds.map_batches(doc_rows, batch_format="pyarrow").materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        import hashlib

        out_id, out_band, out_hash = [], [], []
        for i, sb in zip(batch.column("doc_id").to_pylist(),
                         batch.column("sig").to_pylist()):
            sig = np.frombuffer(sb, dtype=np.uint32)
            for b in range(bands):
                chunk = sig[b * rows_per_band: (b + 1) * rows_per_band]
                out_id.append(i)
                out_band.append(b)
                out_hash.append(
                    hashlib.md5(
                        ",".join(str(int(v)) for v in chunk).encode()
                    ).hexdigest()[:16]
                )
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_id, pa.string()),
             "band": pa.array(out_band, pa.int32()),
             "band_hash": pa.array(out_hash, pa.string())}
        )

    banded = docs.map_batches(band_rows, batch_format="pyarrow")
    candidates = coarse_partition_apply(
        banded, ["band", "band_hash"], _star_pairs_part, _PAIR_SCHEMA,
        fn_format="pyarrow",
    )
    candidates = distinct_rows(
        candidates, ["src", "dst"], strategy="tree", out_blocks=8
    )

    step1 = coarse_attach(
        candidates, docs, left_key="src", right_key="doc_id",
        attach_cols=["sig", "g"], attach_as=["sig_a", "g_a"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("sig_a", pa.binary()), ("g_a", pa.string())]
        ),
    )
    step2 = coarse_attach(
        step1, docs, left_key="dst", right_key="doc_id",
        attach_cols=["sig", "g"], attach_as=["sig_b", "g_b"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("sig_a", pa.binary()), ("g_a", pa.string()),
             ("sig_b", pa.binary()), ("g_b", pa.string())]
        ),
    )

    part_schema = pa.schema(
        [("est_bin", pa.int64()), ("n_pairs", pa.int64()),
         ("sum_inter", pa.int64()), ("sum_union", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        aa = np.stack(
            [np.frombuffer(x, dtype=np.uint32)
             for x in t.column("sig_a").to_pylist()]
        )
        bb = np.stack(
            [np.frombuffer(x, dtype=np.uint32)
             for x in t.column("sig_b").to_pylist()]
        )
        matches = (aa == bb).sum(axis=1).astype(np.int64)
        est_bin = matches * 10 // num_perm
        # empty serialized gram strings are EMPTY sets, not {''}: split
        # would yield [''] (length 1), so zero their lengths explicitly
        ga = pc.split_pattern(t.column("g_a"), _GRAM_SEP).combine_chunks()
        gb = pc.split_pattern(t.column("g_b"), _GRAM_SEP).combine_chunks()
        la = pc.list_value_length(ga).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lb = pc.list_value_length(gb).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        empty_a = pc.equal(t.column("g_a"), "").to_numpy(
            zero_copy_only=False
        )
        empty_b = pc.equal(t.column("g_b"), "").to_numpy(
            zero_copy_only=False
        )
        # drop the '' placeholder element each empty row contributed to
        # the flat array BEFORE zeroing its length, so the CSR contract
        # of _pair_intersections (sum(la) == len(flat_a)) holds even
        # when a zero-shingle doc lands in a candidate pair
        flat_a = pc.list_flatten(ga).to_numpy(zero_copy_only=False)
        flat_b = pc.list_flatten(gb).to_numpy(zero_copy_only=False)
        if empty_a.any():
            flat_a = flat_a[np.repeat(~empty_a, la)]
            la[empty_a] = 0
        if empty_b.any():
            flat_b = flat_b[np.repeat(~empty_b, lb)]
            lb[empty_b] = 0
        inter = _pair_intersections(la, flat_a, lb, flat_b)
        union = la + lb - inter
        df = pd.DataFrame(
            {"est_bin": est_bin, "inter": inter, "union": union}
        )
        agg = df.groupby("est_bin", sort=False).agg(
            n_pairs=("inter", "size"), sum_inter=("inter", "sum"),
            sum_union=("union", "sum"),
        ).reset_index()
        return pa.Table.from_pydict(
            {"est_bin": agg["est_bin"].astype("int64"),
             "n_pairs": agg["n_pairs"].astype("int64"),
             "sum_inter": agg["sum_inter"].astype("int64"),
             "sum_union": agg["sum_union"].astype("int64")},
            schema=part_schema,
        )

    from ray.data.aggregate import Sum

    folded = step2.map_batches(partial, batch_format="pyarrow").groupby(
        "est_bin"
    ).aggregate(
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("sum_inter", alias_name="sum_inter"),
        Sum("sum_union", alias_name="sum_union"),
    )

    def finish(t: pa.Table) -> pa.Table:
        si = t.column("sum_inter").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        su = t.column("sum_union").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pooled = np.where(
            su > 0,
            np.floor(si.astype(np.float64)
                     / np.maximum(su, 1).astype(np.float64) * 1e6 + 0.5)
            / 1e6,
            0.0,
        )
        return pa.Table.from_pydict(
            {"est_bin": pc.cast(t.column("est_bin"), pa.int64()),
             "n_pairs": pc.cast(t.column("n_pairs"), pa.int64()),
             "sum_inter": pa.array(si, pa.int64()),
             "sum_union": pa.array(su, pa.int64()),
             "pooled_jaccard": pa.array(pooled, pa.float64())},
            schema=CALIBRATION_SCHEMA,
        )

    return folded.map_batches(finish, batch_format="pyarrow")
