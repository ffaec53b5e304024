"""Pure-NumPy per-cell quadrature-loop assembly oracle.

An independent implementation of the element kernels (direct quadrature
loop per cell, no reference-tensor factorization) used for differential
testing of the device assembly engine — mirroring the reference's
"same math computed two ways" test strategy (SURVEY §4)."""

import numpy as np

from oasisx_tpu.elements.quadrature import quadrature


class Oracle:
    def __init__(self, mesh, el_v, dm_v, el_q, dm_q, qdeg):
        self.mesh = mesh
        pts, w = quadrature(mesh.cell_type, qdeg)
        self.w = w
        self.phi_v, self.dphi_v = el_v.tabulate(pts)
        self.phi_q, self.dphi_q = el_q.tabulate(pts)
        self.dm_v, self.dm_q = dm_v, dm_q
        self.nv, self.nq_dofs = dm_v.num_dofs, dm_q.num_dofs
        d = mesh.dim
        v0 = mesh.x[mesh.cells[:, 0]]
        self.J = np.stack([mesh.x[mesh.cells[:, i + 1]] - v0 for i in range(d)], axis=2)
        self.detJ = np.abs(np.linalg.det(self.J))
        self.Kinv = np.linalg.inv(self.J)
        # physical gradients at qp per cell: (nc, nq, d, nd)
        self.gv = np.einsum("cbg,qbn->cqgn", self.Kinv, self.dphi_v)
        self.gq = np.einsum("cbg,qbn->cqgn", self.Kinv, self.dphi_q)
        self.v0 = v0

    def qp_phys(self, pts):
        return self.v0[:, None, :] + np.einsum("cgd,qd->cqg", self.J, pts)

    def _dense(self, elems, dmr, dmc, nr, nc):
        A = np.zeros((nr, nc))
        for c in range(elems.shape[0]):
            A[np.ix_(dmr.cell_dofs[c], dmc.cell_dofs[c])] += elems[c]
        return A

    def mass(self):
        e = np.einsum("q,qi,qj,c->cij", self.w, self.phi_v, self.phi_v, self.detJ)
        return self._dense(e, self.dm_v, self.dm_v, self.nv, self.nv)

    def mass_q(self):
        e = np.einsum("q,qi,qj,c->cij", self.w, self.phi_q, self.phi_q, self.detJ)
        return self._dense(e, self.dm_q, self.dm_q, self.nq_dofs, self.nq_dofs)

    def stiffness(self):
        e = np.einsum("q,cqgi,cqgj,c->cij", self.w, self.gv, self.gv, self.detJ)
        return self._dense(e, self.dm_v, self.dm_v, self.nv, self.nv)

    def stiffness_q(self):
        e = np.einsum("q,cqgi,cqgj,c->cij", self.w, self.gq, self.gq, self.detJ)
        return self._dense(e, self.dm_q, self.dm_q, self.nq_dofs, self.nq_dofs)

    def convection(self, uab):
        """uab: (d, ndofs_v). C[i,j] = int (uab . grad phi_j) phi_i."""
        ue = uab[:, self.dm_v.cell_dofs]  # (g, nc, k)
        uq = np.einsum("qk,gck->cqg", self.phi_v, ue)
        e = np.einsum("q,qi,cqg,cqgj,c->cij", self.w, self.phi_v, uq, self.gv, self.detJ)
        return self._dense(e, self.dm_v, self.dm_v, self.nv, self.nv)

    def pressure_gradient_vec(self, i, p):
        """int p dv/dx_i dx -> (ndofs_v,)."""
        pq = np.einsum("qm,cm->cq", self.phi_q, p[self.dm_q.cell_dofs])
        e = np.einsum("q,cq,cqj,c->cj", self.w, pq, self.gv[:, :, i, :], self.detJ)
        out = np.zeros(self.nv)
        np.add.at(out, self.dm_v.cell_dofs.reshape(-1), e.reshape(-1))
        return out

    def divergence_vec(self, u):
        duq = np.einsum("cqgj,gcj->cq", self.gv, u[:, self.dm_v.cell_dofs])
        e = np.einsum("q,cq,qm,c->cm", self.w, duq, self.phi_q, self.detJ)
        out = np.zeros(self.nq_dofs)
        np.add.at(out, self.dm_q.cell_dofs.reshape(-1), e.reshape(-1))
        return out

    def grad_p_vec(self, i, dp):
        gpq = np.einsum("cqm,cm->cq", self.gq[:, :, i, :], dp[self.dm_q.cell_dofs])
        e = np.einsum("q,cq,qj,c->cj", self.w, gpq, self.phi_v, self.detJ)
        out = np.zeros(self.nv)
        np.add.at(out, self.dm_v.cell_dofs.reshape(-1), e.reshape(-1))
        return out
