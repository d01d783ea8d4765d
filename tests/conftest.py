import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (per driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    # driver-side counterpart of the worker-side filter in cap_arrow_threads:
    # pandas-metadata schemas are unhashable → Ray warns per block unify
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "tbl")
