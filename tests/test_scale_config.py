"""The centralized scale-switch config (context.ScaleConfig): env
overrides win, derivation clamps, and the library call sites resolve
through it when no explicit threshold is passed."""

from __future__ import annotations

import dataclasses

import pytest

from semantic_search_system_ray import context


@pytest.fixture(autouse=True)
def _fresh_config():
    context.reset_scale_config()
    yield
    context.reset_scale_config()


def test_derivation_clamps_to_measured_envelope(monkeypatch):
    # a mis-reported 10 TiB driver cannot push a knob past anchor*8
    monkeypatch.setattr(context, "_driver_mem_bytes", lambda: 10 << 40)
    monkeypatch.setattr(context, "_object_store_bytes", lambda: 10 << 40)
    cfg = context.scale_config()
    for name, (anchor, _s) in context._ANCHORS.items():
        assert getattr(cfg, name) == anchor * 8
    # ... and a tiny 1 GiB box never drops below anchor/8
    context.reset_scale_config()
    monkeypatch.setattr(context, "_driver_mem_bytes", lambda: 1 << 30)
    monkeypatch.setattr(context, "_object_store_bytes", lambda: 1 << 30)
    cfg = context.scale_config()
    for name, (anchor, _s) in context._ANCHORS.items():
        assert getattr(cfg, name) == anchor // 8


def test_anchor_box_reproduces_measured_constants(monkeypatch):
    # on the reference 128-GiB box the derived values ARE the measured
    # r1–r4 constants — centralizing must not shift regimes there
    monkeypatch.setattr(
        context, "_driver_mem_bytes", lambda: context._ANCHOR_MEM_BYTES
    )
    monkeypatch.setattr(
        context, "_object_store_bytes", lambda: context._ANCHOR_STORE_BYTES
    )
    cfg = context.scale_config()
    assert cfg.verify_broadcast_rows == 1_000_000
    assert cfg.canon_driver_rows == 200_000
    assert cfg.graph_driver_edges == 2_000_000
    assert cfg.cc_driver_edges == 500_000
    assert cfg.attach_broadcast_bytes == 32 << 20
    assert cfg.dq_small_domain_rows == 8_000_000


def test_env_override_wins_unclamped(monkeypatch):
    monkeypatch.setenv("SSR_GRAPH_DRIVER_EDGES", "123")
    monkeypatch.setenv("SSR_ATTACH_BROADCAST_BYTES", str(64 << 30))
    cfg = context.scale_config()
    assert cfg.graph_driver_edges == 123
    assert cfg.attach_broadcast_bytes == 64 << 30  # beyond anchor*8: kept


def test_config_is_cached_until_reset(monkeypatch):
    a = context.scale_config()
    monkeypatch.setenv("SSR_CANON_DRIVER_ROWS", "7")
    assert context.scale_config() is a
    context.reset_scale_config()
    assert context.scale_config().canon_driver_rows == 7


def test_call_sites_resolve_through_config(monkeypatch):
    """Forcing a zero graph threshold through the CONFIG (not the kwarg)
    must flip pagerank into the distributed regime — proof the call
    site actually consumes the central config."""
    calls = {"n": 0}
    real = context.scale_config

    def spy():
        calls["n"] += 1
        return real()

    from semantic_search_system_ray.stages import graph

    monkeypatch.setattr(
        "semantic_search_system_ray.context.scale_config", spy
    )
    assert graph._resolve_edges(None) == real().graph_driver_edges
    assert calls["n"] >= 1
    assert graph._resolve_edges(42) == 42  # explicit kwarg still wins


def test_every_knob_documented():
    cfg = context.scale_config()
    doc = context.ScaleConfig.__doc__
    for f in dataclasses.fields(cfg):
        assert f.name in doc, f"knob {f.name} missing its memory arithmetic"
