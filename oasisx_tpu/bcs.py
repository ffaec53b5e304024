"""Boundary conditions: DirichletBC (velocity) and PressureBC (outlet).

Re-provides the reference's BC surface (/root/reference/src/oasisx/bcs.py):

- ``DirichletBC(value, method, marker)`` with deferred creation
  (``create_bc``), geometric or topological dof location, float/Constant/
  callable values, time-dependent re-interpolation (``update_bc``), and
  RHS application (``apply``).
- ``PressureBC(value, (meshtags, id))`` building (a) the per-component
  surface forms ``int h n_i dv/dx_i ds`` for the tentative-velocity RHS and
  (b) the homogeneous Dirichlet condition on the pressure-correction space
  over the same facets (bcs.py:225-253).

TPU-native differences: dof sets become boolean masks + value arrays baked
into the jitted step; the surface form becomes a FacetContext assembled by
the engine (assembly/facets.py).
"""

from __future__ import annotations

from enum import Enum
import numpy as np

from .assembly.facets import FacetContext, build_facet_context, facet_eval_q, pressure_surface_vecs
from .meshes.tags import MeshTags
from .spaces.functionspace import Constant, Function, FunctionSpace

__all__ = ["DirichletBC", "PressureBC", "LocatorMethod"]


class LocatorMethod(Enum):
    """Search methods for Dirichlet BCs."""

    GEOMETRICAL = 1
    TOPOLOGICAL = 2


LocatorMethod.TOPOLOGICAL.__doc__ = "Topological search for dofs"
LocatorMethod.GEOMETRICAL.__doc__ = "Geometrical search for dofs"


class DirichletBC:
    """Strong Dirichlet condition on a scalar (velocity-component) space.

    Args:
        value: float, Constant, or callable ``f(x)`` with ``x`` of shape
            (3, n) (zero-padded), returning dof values.
        method: LocatorMethod.GEOMETRICAL or .TOPOLOGICAL.
        marker: geometric predicate, or ``(MeshTags, tag_value)``.
    """

    def __init__(self, value, method: LocatorMethod, marker):
        self._method = method
        self._value = value
        if method == LocatorMethod.GEOMETRICAL:
            self._locator = marker
        elif method == LocatorMethod.TOPOLOGICAL:
            self._entities = marker[0].find(marker[1])
            self._e_dim = marker[0].dim
        else:
            raise ValueError(method)
        self._dofs: np.ndarray | None = None
        self._V: FunctionSpace | None = None
        self._vals: np.ndarray | None = None
        # bumped whenever dofs/values actually change; lets the solver cache
        # its assembled per-component BC value arrays across solve()/run()
        # calls (the host build + device upload costs ~tens of ms per call
        # at 1M dofs over the relay)
        self._version = 0

    def set_dofs(self, dofs: np.ndarray) -> None:
        self._dofs = np.asarray(dofs, dtype=np.int32)
        self._version += 1

    def _locate_dofs(self, V: FunctionSpace) -> None:
        if self._method == LocatorMethod.GEOMETRICAL:
            self._dofs = V.locate_dofs_geometrical(self._locator)
        else:
            self._dofs = V.locate_dofs_topological(self._e_dim, self._entities)

    def create_bc(self, V: FunctionSpace) -> None:
        if self._dofs is None:
            self._locate_dofs(V)
        self._V = V
        self.update_bc()

    def update_bc(self) -> None:
        """Re-evaluate a time-dependent callable value (bcs.py:128-133)."""
        if self._V is None:
            return
        old = self._vals
        if callable(self._value):
            x = self._V.dof_coords[self._dofs]
            pad = np.zeros((3, x.shape[0]))
            pad[: x.shape[1]] = x.T
            self._vals = np.asarray(self._value(pad), dtype=np.float64)
        else:
            v = self._value.value if isinstance(self._value, Constant) else self._value
            self._vals = np.full(len(self._dofs), float(v))
        if old is None or old.shape != self._vals.shape or not np.array_equal(old, self._vals):
            self._version += 1

    @property
    def dofs(self) -> np.ndarray:
        if self._dofs is None:
            raise RuntimeError("create_bc must be called first")
        return self._dofs

    @property
    def values(self) -> np.ndarray:
        if self._vals is None:
            raise RuntimeError("create_bc must be called first")
        return self._vals

    def apply(self, x) -> None:
        """Set bc dofs of a host vector (PETSc set_bc equivalent, bcs.py:135-139)."""
        arr = x.x.array if isinstance(x, Function) else x
        arr[self.dofs] = self.values


def bc_mask_and_values(bcs: list[DirichletBC], ndofs: int) -> tuple[np.ndarray, np.ndarray]:
    """Combine a list of DirichletBCs into (bool mask, value vector).

    Later BCs in the list win on overlapping dofs, matching sequential
    ``set_bc`` application order."""
    mask = np.zeros(ndofs, dtype=bool)
    vals = np.zeros(ndofs, dtype=np.float64)
    for bc in bcs:
        mask[bc.dofs] = True
        vals[bc.dofs] = bc.values
    return mask, vals


class PressureBC:
    """Outlet pseudo-traction condition (reference bcs.py:142-268).

    Contributes ``int h n_i dv/dx_i ds`` to each tentative-velocity RHS
    component and a homogeneous Dirichlet condition on the pressure
    correction over the tagged facets.
    """

    def __init__(self, value, marker: tuple[MeshTags, int]):
        self._subdomain_data, self._subdomain_id = marker
        self._value = value
        self._fctx: FacetContext | None = None
        self._Q: FunctionSpace | None = None
        self._u: Function | None = None
        self._dofs_q: np.ndarray | None = None
        self._ctx = None

    def create_bcs(self, V: FunctionSpace, Q: FunctionSpace, dtype=None) -> None:
        """V: collapsed scalar velocity space; Q: pressure space. ``dtype``
        pins the facet tables to the solver dtype (otherwise the global
        default) so no float64 surface contributions leak into a float32
        jitted step."""
        self._dtype = dtype
        mesh = V.mesh
        if isinstance(self._subdomain_id, tuple):
            facets = self._subdomain_data.indices[
                np.isin(self._subdomain_data.values, np.asarray(self._subdomain_id))
            ]
        else:
            facets = self._subdomain_data.find(int(self._subdomain_id))
        self._facets = np.asarray(facets, dtype=np.int32)
        self._fctx = build_facet_context(
            mesh, V.element, Q.element, self._facets, dtype=dtype
        )
        self._Q = Q
        if callable(self._value):
            self._u = Function(Q, name="pressure_bc")
            self._u.interpolate(self._value)
        # homogeneous Dirichlet dofs for the pressure correction
        self._dofs_q = Q.locate_dofs_topological(mesh.dim - 1, self._facets)

    def update_bc(self) -> None:
        if self._u is not None:
            self._u.interpolate(self._value)

    @property
    def facet_context(self) -> FacetContext:
        if self._fctx is None:
            raise RuntimeError("create_bcs must be called first")
        return self._fctx

    @property
    def dofs(self) -> np.ndarray:
        """Pressure-correction dofs carrying the homogeneous condition."""
        if self._dofs_q is None:
            raise RuntimeError("create_bcs must be called first")
        return self._dofs_q

    def value_at_facet_qp(self, ctx):
        """Pressure value h at facet quadrature points: (nf, nqf)."""
        import jax.numpy as jnp

        f = self._fctx
        dt_ = f.scale.dtype
        if self._u is not None:
            return facet_eval_q(ctx, f, jnp.asarray(self._u.x.array, dtype=dt_))
        v = self._value.value if isinstance(self._value, Constant) else self._value
        return jnp.full((f.scale.shape[0], f.qw.shape[0]), float(v), dtype=dt_)

    def assemble_rhs_all(self, ctx):
        """All-component surface RHS vectors at once: (d, ndofs_v)."""
        return pressure_surface_vecs(ctx, self._fctx, self.value_at_facet_qp(ctx))

    def rhs(self, i: int):
        """Component-i surface form handle (reference API bcs.py:266-268):
        returns a callable ctx -> (ndofs_v,)."""
        return lambda ctx: self.assemble_rhs_all(ctx)[i]
