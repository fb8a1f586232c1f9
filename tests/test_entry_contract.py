"""Driver-contract tests for __ray_entry__ (no Ray session ownership,
complete registries, no orphan SQL)."""

import os
import subprocess
import sys


def test_import_does_not_init_ray():
    """Importing the entry module (and building its registries) must not
    start a Ray session — the driver owns ray.init."""
    code = (
        "import sys; sys.path.insert(0, '.');"
        "import __ray_entry__ as m;"
        "q = m.queries(); o = m.oracle_sql();"
        "import ray; assert not ray.is_initialized(), 'entry module started ray';"
        "assert set(o) <= set(q), 'orphan oracle sql';"
        "assert len(q) >= 40 and len(o) >= 28;"
        "print('CONTRACT_OK', len(q), len(o))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT_OK" in out.stdout


def test_every_query_name_is_identifier():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as m

    for name, fn in m.queries().items():
        assert name.replace("_", "").isalnum(), name
        assert callable(fn), name
