"""Native (C++) component tests: BGZF inflate and the simplex flow
solver, validated against the Python/scipy paths."""

import numpy as np
import pytest

from floria_tpu import native
from floria_tpu.graph import flow
from floria_tpu.ingest import bgzf


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_bgzf_matches_python(lib):
    payload = bytes(range(256)) * 4096
    comp = bgzf.compress(payload)
    out = native.bgzf_inflate(comp)
    assert out == payload


def test_native_flow_matches_scipy(lib):
    rng = np.random.default_rng(0)
    # Random small layered flow problem: 3 columns x 2 rows, full bipartite
    # edges between adjacent columns.
    E = 8
    ae = rng.uniform(1.0, 20.0, E)
    # conservation at the 2 middle nodes: edges 0..3 in (col0->col1),
    # 4..7 out (col1->col2); node (1,r) has in edges {r, r+2}, out {4+2r,
    # 5+2r}.
    rows = []
    for r in range(2):
        row = np.zeros(E)
        row[r] = 1.0
        row[r + 2] = 1.0
        row[4 + 2 * r] = -1.0
        row[5 + 2 * r] = -1.0
        rows.append(row)
    x_scipy = flow._solve(ae, rows)
    x_native = native.solve_flow(ae, rows)
    assert x_native is not None

    def objective(x):
        return np.abs(x - ae).sum()

    # Optima may differ (degenerate LPs); objectives must match.
    assert objective(x_native) == pytest.approx(objective(x_scipy),
                                                abs=1e-6)
    for row in rows:
        assert abs(row @ x_native) < 1e-6
