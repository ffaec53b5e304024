"""Function spaces, functions, constants.

Mirrors the exercised dolfinx.fem surface (SURVEY §2b): ``functionspace``,
``Function`` (+ ``interpolate``), ``Constant``, component-subspace collapse
(/root/reference/src/oasisx/fracstep.py:187-194, :698-705).

Design: scalar spaces carry the dofmap; a vector space of block size ``bs``
interleaves components dolfinx-style (global dof = scalar_dof * bs + comp),
so ``collapse`` maps are simple strided index arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..elements.element import FiniteElement, make_element
from ..meshes.mesh import Mesh
from .dofmap import DofMap, build_dofmap, entity_closure_dofs


class FunctionSpace:
    """Scalar or blocked-vector Lagrange space on a simplex mesh."""

    def __init__(
        self,
        mesh: Mesh,
        element: FiniteElement | tuple[str, int],
        shape: tuple[int, ...] = (),
    ):
        self.mesh = mesh
        self.element = make_element(element, mesh.cell_type)
        self.shape = shape
        self.bs = 1 if not shape else int(np.prod(shape))
        self._dofmap = build_dofmap(mesh, self.element)
        self._scalar: FunctionSpace | None = None

    @property
    def dofmap(self) -> DofMap:
        return self._dofmap

    @property
    def num_dofs(self) -> int:
        """Total dofs including block size."""
        return self._dofmap.num_dofs * self.bs

    @property
    def num_scalar_dofs(self) -> int:
        return self._dofmap.num_dofs

    @property
    def num_sub_spaces(self) -> int:
        return self.bs if self.bs > 1 else 0

    @property
    def dof_coords(self) -> np.ndarray:
        return self._dofmap.dof_coords

    # dolfinx-compatible alias
    def tabulate_dof_coordinates(self) -> np.ndarray:
        return self._dofmap.dof_coords

    def sub(self, i: int) -> "SubSpace":
        if not 0 <= i < self.bs:
            raise IndexError(i)
        return SubSpace(self, i)

    def scalar_space(self) -> "FunctionSpace":
        """The collapsed single-component space (shares the dofmap)."""
        if self.bs == 1:
            return self
        if self._scalar is None:
            s = FunctionSpace.__new__(FunctionSpace)
            s.mesh = self.mesh
            s.element = self.element
            s.shape = ()
            s.bs = 1
            s._dofmap = self._dofmap
            s._scalar = s
            self._scalar = s
        return self._scalar

    # --- dof location ------------------------------------------------------
    def locate_dofs_geometrical(self, marker: Callable) -> np.ndarray:
        """Scalar dof ids whose coordinates satisfy ``marker`` (reference
        convention: marker receives (3, n) padded coords)."""
        x = self.dof_coords
        pad = np.zeros((3, x.shape[0]))
        pad[: x.shape[1]] = x.T
        return np.where(marker(pad))[0].astype(np.int32)

    def locate_dofs_topological(self, edim: int, entities: np.ndarray) -> np.ndarray:
        return entity_closure_dofs(self.mesh, self._dofmap, self.element, edim, entities)


@dataclass
class SubSpace:
    """Component view of a blocked space; ``collapse`` mirrors
    dolfinx ``V.sub(i).collapse()`` (fracstep.py:190)."""

    parent: FunctionSpace
    component: int

    def collapse(self) -> tuple[FunctionSpace, np.ndarray]:
        V = self.parent
        cmap = (np.arange(V.num_scalar_dofs, dtype=np.int32) * V.bs + self.component).astype(
            np.int32
        )
        return V.scalar_space(), cmap


class Function:
    """A finite element function: coefficient vector over a space.

    ``f.x.array`` is the mutable host NumPy array, matching the reference's
    access idiom (``function.x.array[:] = ...``).
    """

    def __init__(self, V: FunctionSpace, name: str = "f", dtype=np.float64):
        self.function_space = V
        self.name = name
        self._array = np.zeros(V.num_dofs, dtype=dtype)
        self._sync_hook = None
        self.x = _XView(self)

    def _host_access(self) -> None:
        """Fire the owner's device→host sync before any host array access.

        A solver that parked its state on the device (FractionalStep_AB_CN
        run()/solve(): the host boundary costs ~0.5-1 s per call over the
        relay) installs a one-shot hook here; the first host access to any
        state function pulls the device state back and — since a caller
        holding the NumPy array may write through it — invalidates the
        device copy."""
        if self._sync_hook is not None:
            hook, self._sync_hook = self._sync_hook, None
            hook()

    @property
    def array(self) -> np.ndarray:
        self._host_access()
        return self._array

    def interpolate(self, value) -> None:
        """Interpolate a callable/scalar/array into the nodal coefficients.

        Callables receive coords as a (3, n) zero-padded array (reference
        convention, e.g. demo/taylor_green.py:41-53); for vector spaces they
        must return an array of shape (bs, n).
        """
        self._host_access()
        V = self.function_space
        if callable(value):
            x = V.dof_coords
            pad = np.zeros((3, x.shape[0]))
            pad[: x.shape[1]] = x.T
            vals = np.asarray(value(pad))
            if V.bs == 1:
                self._array[:] = vals
            else:
                if vals.shape != (V.bs, x.shape[0]):
                    raise ValueError(
                        f"vector interpolation expects shape {(V.bs, x.shape[0])}, got {vals.shape}"
                    )
                self._array[:] = vals.T.reshape(-1)
        else:
            arr = np.asarray(getattr(value, "value", value), dtype=self._array.dtype)
            if arr.ndim == 0:
                self._array[:] = arr
            else:
                self._array.reshape(-1, V.bs)[:] = arr[None, :]

    def copy(self) -> "Function":
        self._host_access()
        g = Function(self.function_space, name=self.name, dtype=self._array.dtype)
        g._array[:] = self._array
        return g


class _XView:
    """Compatibility shim for the dolfinx ``f.x.array`` idiom. Scatter
    operations are no-ops on a single host copy — the distributed semantics
    (scatter_forward/scatter_reverse, fracstep.py:390 et al.) live in the
    sharded device path (oasisx_tpu.parallel)."""

    __slots__ = ("_f",)

    def __init__(self, f: Function):
        self._f = f

    @property
    def array(self) -> np.ndarray:
        self._f._host_access()
        return self._f._array

    def scatter_forward(self) -> None:
        pass

    def scatter_reverse(self, *_args) -> None:
        pass


class Constant:
    """Mutable scalar/vector constant (dolfinx.fem.Constant equivalent)."""

    def __init__(self, value, mesh: Mesh | None = None):
        # accept Constant(mesh, value) order too
        if isinstance(value, Mesh):
            value, mesh = mesh, value
        self.value = np.asarray(value, dtype=np.float64)

    def __float__(self) -> float:
        return float(self.value)
