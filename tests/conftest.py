import os

import pytest

# see bench.py: avoids kernel page-fault churn in Ray workers; must be
# set before ray.init so workers inherit it
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (brief requirement)."""
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
