"""Minimal symbolic expression layer evaluated at quadrature points.

The reference uses UFL for a *closed* set of expressions (SURVEY §2b: the
~10 forms plus manufactured-solution error functionals and the rotational
pressure update ``p + dp - xi*nu*div(u)``, fracstep.py:240). A full symbolic
DSL is not required; this layer provides the same names — ``grad``, ``div``,
``inner``, ``dot``, ``as_vector``, ``SpatialCoordinate``, ``sin/cos/exp``,
arithmetic — as a tiny tree interpreted into batched (ncells, nq[, k])
device arrays. Used by the Projector RHS and scalar functionals
(assemble_scalar equivalents).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..elements.quadrature import quadrature
from ..spaces.functionspace import Constant, Function

pi = math.pi


class Expr:
    shape: tuple = ()

    def __add__(self, o):
        return _binop(jnp.add, self, o)

    __radd__ = __add__

    def __sub__(self, o):
        return _binop(jnp.subtract, self, o)

    def __rsub__(self, o):
        return _binop(jnp.subtract, o, self)

    def __mul__(self, o):
        return _binop(jnp.multiply, self, o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return _binop(jnp.divide, self, o)

    def __rtruediv__(self, o):
        return _binop(jnp.divide, o, self)

    def __neg__(self):
        return _unop(jnp.negative, self)

    def __pow__(self, p):
        return _binop(jnp.power, self, p)

    def __getitem__(self, i):
        return Component(self, i)


def as_expr(v) -> Expr:
    if isinstance(v, Expr):
        return v
    if isinstance(v, Function):
        return Coefficient(v)
    if isinstance(v, Constant):
        return Scalar(v)
    if isinstance(v, (int, float, np.floating, np.integer)):
        return Scalar(v)
    if isinstance(v, (tuple, list)):
        return Vector(tuple(as_expr(c) for c in v))
    raise TypeError(f"cannot treat {type(v)} as expression")


@dataclass
class Scalar(Expr):
    value: object  # float or Constant (read at evaluation time)

    shape = ()


@dataclass
class Coefficient(Expr):
    f: Function

    @property
    def shape(self):
        bs = self.f.function_space.bs
        return () if bs == 1 else (bs,)


@dataclass
class Coord(Expr):
    index: int

    shape = ()


def SpatialCoordinate(mesh) -> tuple:
    return tuple(Coord(i) for i in range(mesh.gdim))


@dataclass
class Component(Expr):
    v: Expr
    index: int

    shape = ()


@dataclass
class Vector(Expr):
    comps: tuple

    @property
    def shape(self):
        return (len(self.comps),)


def as_vector(comps) -> Vector:
    return Vector(tuple(as_expr(c) for c in comps))


@dataclass
class Grad(Expr):
    f: Expr  # scalar
    dim: int

    @property
    def shape(self):
        return (self.dim,)


def grad(f) -> Grad:
    f = as_expr(f)
    if f.shape != ():
        raise ValueError("grad supports scalar operands; use per-component grads")
    if isinstance(f, Coefficient):
        dim = f.f.function_space.mesh.gdim
    else:
        raise ValueError("grad supports FE-function operands")
    return Grad(f, dim)


@dataclass
class Div(Expr):
    v: Expr

    shape = ()


def div(v) -> Div:
    return Div(as_expr(v))


@dataclass
class BinOp(Expr):
    op: object
    a: Expr
    b: Expr

    @property
    def shape(self):
        return self.a.shape if self.a.shape != () else self.b.shape


@dataclass
class UnOp(Expr):
    op: object
    a: Expr

    @property
    def shape(self):
        return self.a.shape


def _binop(op, a, b):
    return BinOp(op, as_expr(a), as_expr(b))


def _unop(op, a):
    return UnOp(op, as_expr(a))


def sin(x):
    return _unop(jnp.sin, x)


def cos(x):
    return _unop(jnp.cos, x)


def exp(x):
    return _unop(jnp.exp, x)


def sqrt(x):
    return _unop(jnp.sqrt, x)


def dot(a, b) -> Expr:
    a, b = as_expr(a), as_expr(b)
    return inner(a, b)


def inner(a, b) -> Expr:
    a, b = as_expr(a), as_expr(b)
    if a.shape == () and b.shape == ():
        return a * b
    ca = _components(a)
    cb = _components(b)
    if len(ca) != len(cb):
        raise ValueError("inner: shape mismatch")
    out = ca[0] * cb[0]
    for x, y in zip(ca[1:], cb[1:]):
        out = out + x * y
    return out


def _components(v: Expr) -> tuple:
    if isinstance(v, Vector):
        return v.comps
    if isinstance(v, Coefficient) and v.shape != ():
        return tuple(Component(v, i) for i in range(v.shape[0]))
    if isinstance(v, Grad):
        return tuple(Component(v, i) for i in range(v.dim))
    if isinstance(v, (BinOp, UnOp)) and v.shape != ():
        return tuple(Component(v, i) for i in range(v.shape[0]))
    if v.shape == ():
        return (v,)
    raise ValueError(f"cannot extract components of {v}")


# ---------------------------------------------------------------------------
# evaluation at quadrature points
# ---------------------------------------------------------------------------


class QPEvaluator:
    """Evaluates expression trees to (ncells, nq) arrays on a mesh."""

    def __init__(self, mesh, qdegree: int, dtype=None):
        from ..assembly.geometry import compute_cell_geometry

        self.mesh = mesh
        self.dtype = real_dtype(dtype)
        pts, w = quadrature(mesh.cell_type, qdegree)
        self.qpts = pts
        self.qw = jnp.asarray(w, dtype=self.dtype)
        geo = compute_cell_geometry(mesh.x, mesh.cells, mesh.dim)
        self.detJ = jnp.asarray(geo.detJ, dtype=self.dtype)
        self.Kinv = jnp.asarray(geo.Kinv, dtype=self.dtype)
        v0 = mesh.x[mesh.cells[:, 0]]
        J = np.stack([mesh.x[mesh.cells[:, i + 1]] - v0 for i in range(mesh.dim)], axis=2)
        self.xq = jnp.asarray(
            v0[:, None, :] + np.einsum("cgd,qd->cqg", J, pts), dtype=self.dtype
        )  # (nc, nq, gdim)
        self._tabs: dict = {}

    def _tab(self, space):
        key = id(space.dofmap), space.element
        if key not in self._tabs:
            phi, dphi = space.element.tabulate(self.qpts)
            cd = jnp.asarray(space.dofmap.cell_dofs, dtype=jnp.int32)
            self._tabs[key] = (
                jnp.asarray(phi, dtype=self.dtype),
                jnp.asarray(dphi, dtype=self.dtype),
                cd,
            )
        return self._tabs[key]

    def _coeff_array(self, f: Function, comp: int | None):
        V = f.function_space
        arr = jnp.asarray(f.x.array, dtype=self.dtype)
        if V.bs == 1:
            return arr
        if comp is None:
            raise ValueError("vector coefficient needs a component index")
        return arr.reshape(-1, V.bs)[:, comp]

    def eval(self, e: Expr, comp: int | None = None):
        """Evaluate scalar expression (or component ``comp`` of vector one)."""
        if isinstance(e, Scalar):
            v = e.value.value if isinstance(e.value, Constant) else e.value
            return jnp.asarray(v, dtype=self.dtype)
        if isinstance(e, Coord):
            return self.xq[:, :, e.index]
        if isinstance(e, Coefficient):
            phi, _, cd = self._tab(e.f.function_space)
            arr = self._coeff_array(e.f, comp)
            return jnp.einsum("qn,cn->cq", phi, arr[cd])
        if isinstance(e, Component):
            return self._eval_component(e.v, e.index)
        if isinstance(e, Vector):
            if comp is None:
                raise ValueError("vector expression evaluated without component")
            return self.eval(e.comps[comp])
        if isinstance(e, Grad):
            if comp is None:
                raise ValueError("grad evaluated without component")
            return self._eval_component(e, comp)
        if isinstance(e, Div):
            return self._eval_div(e.v)
        if isinstance(e, BinOp):
            return e.op(self.eval(e.a, comp), self.eval(e.b, comp))
        if isinstance(e, UnOp):
            return e.op(self.eval(e.a, comp))
        raise TypeError(f"cannot evaluate {e}")

    def _eval_component(self, v: Expr, i: int):
        if isinstance(v, Vector):
            return self.eval(v.comps[i])
        if isinstance(v, Coefficient):
            return self.eval(v, comp=i)
        if isinstance(v, Grad):
            f = v.f
            if isinstance(f, Coefficient):
                _, dphi, cd = self._tab(f.f.function_space)
                arr = self._coeff_array(f.f, None)
                return jnp.einsum("cb,qbn,cn->cq", self.Kinv[:, :, i], dphi, arr[cd])
            raise ValueError("grad supports FE-function operands")
        if isinstance(v, (BinOp, UnOp)):
            return self.eval(v, comp=i)
        raise ValueError(f"cannot take component of {v}")

    def _eval_div(self, v: Expr):
        comps = v.comps if isinstance(v, Vector) else _components(v)
        out = None
        for i, ci in enumerate(comps):
            term = self._grad_of(ci, i)
            out = term if out is None else out + term
        return out

    def _grad_of(self, e: Expr, i: int):
        """d(e)/dx_i for a scalar FE function or a vector-function component."""
        if isinstance(e, Coefficient) and e.shape == ():
            _, dphi, cd = self._tab(e.f.function_space)
            arr = self._coeff_array(e.f, None)
            return jnp.einsum("cb,qbn,cn->cq", self.Kinv[:, :, i], dphi, arr[cd])
        if isinstance(e, Component) and isinstance(e.v, Coefficient):
            f = e.v.f
            _, dphi, cd = self._tab(f.function_space)
            arr = self._coeff_array(f, e.index)
            return jnp.einsum("cb,qbn,cn->cq", self.Kinv[:, :, i], dphi, arr[cd])
        raise ValueError("div needs FE-function components")

    def integrate(self, e: Expr):
        vals = self.eval(as_expr(e))
        return jnp.einsum("cq,q,c->", vals, self.qw, self.detJ)


def assemble_scalar(mesh, e, qdegree: int = 8, dtype=None):
    """Integral of an expression over the mesh — the ``assemble_scalar``
    equivalent (demo/taylor_green.py:204-206)."""
    ev = QPEvaluator(mesh, qdegree, dtype)
    return ev.integrate(as_expr(e))
