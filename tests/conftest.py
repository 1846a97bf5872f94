import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from kmcp_ray.perf import tune_malloc
    tune_malloc()      # sandbox first-touch fault mitigation (perf.py)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from kmcp_ray.perf import tune_data_context
    tune_data_context()    # resolves $KMCP_SHUFFLE, default "sort" —
    # the suite-wide default stays sort (global hash slows small
    # groupbys >10x); the hash-only paths (perf.py hash branch, the
    # edges_stage re-root) get dedicated coverage in
    # tests/test_pipeline.py::test_hash_shuffle_strategy
    yield
    ray.shutdown()
