"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    from semantic_search_system_ray.context import tune

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    tune(4)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Seeded synthetic corpus shared across tests (120 docs)."""
    from semantic_search_system_ray.sources.synth import generate_corpus

    return generate_corpus(n_docs=120, seed=42)
