"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_parquet(tmp_path_factory):
    """Shared deterministic F1 corpus written once per session."""
    from rayenc.corpus import write_corpus

    path = tmp_path_factory.mktemp("corpus") / "corpus.parquet"
    write_corpus(str(path), 3000, row_group_size=500)
    return str(path)
