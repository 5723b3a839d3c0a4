import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    # list<string> columns (log_flags/tags) are data, not tensors
    DataContext.get_current().enable_tensor_extension_casting = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_small():
    """Deterministic transcript table, smallest scale (generated once)."""
    import pyarrow.parquet as pq

    from beats_ray.sources.transcripts import transcripts_path
    return pq.read_table(transcripts_path("sf0.001"))
