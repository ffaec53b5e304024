"""Native C++ kernels vs NumPy fallbacks (differential)."""

import numpy as np
import pytest

from oasisx_tpu import native
from oasisx_tpu.meshes import create_unit_cube, create_unit_square
from oasisx_tpu.meshes.mesh import CELL_FACETS, _build_topology


@pytest.mark.skipif(not native.available(), reason="no compiler")
@pytest.mark.parametrize("mesh_fn", [lambda: create_unit_square(7), lambda: create_unit_cube(3)])
def test_native_topology_matches_numpy(mesh_fn):
    mesh = mesh_fn()
    lf = CELL_FACETS[mesh.cell_type]
    nat = native.build_facet_topology(mesh.cells, lf)
    assert nat is not None
    facets, fcells, flocal, inv = nat

    # numpy fallback reference
    flat = np.sort(mesh.cells[:, lf].reshape(-1, lf.shape[1]), axis=1)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
    assert np.array_equal(facets, uniq)
    assert np.array_equal(inv, inverse)
    # slots: same first-occurrence convention
    order = np.argsort(inverse, kind="stable")
    first = order[np.searchsorted(inverse[order], np.arange(len(uniq)))]
    assert np.array_equal(fcells[:, 0], (first // lf.shape[0]).astype(np.int32))


@pytest.mark.skipif(not native.available(), reason="no compiler")
def test_native_unique_rows():
    rng = np.random.RandomState(0)
    rows = rng.randint(0, 50, (1000, 2)).astype(np.int32)
    uniq, ids = native.unique_rows(rows)
    unp, inp = np.unique(rows, axis=0, return_inverse=True)
    assert np.array_equal(uniq, unp)
    assert np.array_equal(ids, inp)
