"""Session-scoped Ray init (one per pytest session, per driver contract)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic 800-file corpus for pipeline tests (cached per session)."""
    from mel_ray.synth import generate_corpus

    out = tmp_path_factory.mktemp("corpus") / "tiny"
    return generate_corpus(out, 800)
