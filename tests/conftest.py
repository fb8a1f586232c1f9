import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_small(tmp_path_factory):
    """t1-scale synthetic transcripts written to parquet (≈1.5k turns)."""
    from ocr_processor_ray.sources.synth import write_transcripts

    d = tmp_path_factory.mktemp("transcripts_small")
    write_transcripts(str(d), seed=11, n_convs=60, skew_every=25, skew_turns=300,
                      rows_per_file=500)
    return str(d)


@pytest.fixture(scope="session")
def transcripts_table(transcripts_small):
    import pyarrow.parquet as pq

    return pq.read_table(transcripts_small)
