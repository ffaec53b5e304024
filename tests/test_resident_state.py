"""Device-resident solver state (round 3).

run()/solve() park the state pytree on device instead of eagerly pulling
it back to the host Functions; the first host access to any state
function's ``.x.array`` triggers a one-shot device→host sync and
invalidates the device copy (the caller may write through the returned
NumPy array).  These tests pin the three contracts:

- back-to-back run() windows == one long window (state never leaves the
  device between them);
- a host read between windows does not change results (sync + re-upload
  round-trips exactly);
- a host mutation between windows is picked up (the parked device state
  must not shadow it).
"""

import numpy as np

from tests.test_taylor_green import _init, _solver_for


def _snapshot(solver):
    return [np.array(g.x.array) for g in solver._state_functions()]


def _fresh(N=6, nu=0.05, dt=0.01):
    mesh, solver, u_ex, t_u = _solver_for(N, nu, dt)
    _init(solver, u_ex, t_u, 0.0, dt)
    return solver


def test_split_windows_match_single_window():
    dt, nu = 0.01, 0.05
    a = _fresh(dt=dt)
    b = _fresh(dt=dt)
    a.run(3, dt, nu, max_iter=1)
    assert a._dev_state is not None  # parked
    a.run(3, dt, nu, max_iter=1)
    b.run(6, dt, nu, max_iter=1)
    for x, y in zip(_snapshot(a), _snapshot(b)):
        np.testing.assert_array_equal(x, y)


def test_host_read_between_windows_changes_nothing():
    dt, nu = 0.01, 0.05
    a = _fresh(dt=dt)
    b = _fresh(dt=dt)
    a.run(3, dt, nu, max_iter=1)
    _ = a._u[0].x.array  # forces sync; caller could write, so invalidates
    assert a._dev_state is None
    a.run(3, dt, nu, max_iter=1)
    b.run(3, dt, nu, max_iter=1)
    b.run(3, dt, nu, max_iter=1)
    for x, y in zip(_snapshot(a), _snapshot(b)):
        np.testing.assert_array_equal(x, y)


def test_host_mutation_between_windows_is_picked_up():
    dt, nu = 0.01, 0.05
    solver = _fresh(dt=dt)
    mesh, s2, u_ex, t_u = _solver_for(6, nu, dt)
    _init(s2, u_ex, t_u, 0.0, dt)

    solver.run(3, dt, nu, max_iter=1)
    ref = _snapshot(solver)

    # rewind the state BY HOST WRITES back to the initial condition: the
    # parked device state must be invalidated or the next window would
    # silently continue from the stale device copy
    for g, h in zip(solver._state_functions(), s2._state_functions()):
        g.x.array[:] = h.x.array
    assert solver._dev_state is None
    solver.run(3, dt, nu, max_iter=1)
    for x, y in zip(_snapshot(solver), ref):
        np.testing.assert_array_equal(x, y)


def test_solve_then_run_mix():
    """solve() parks too, and a run() window after solve() continues from
    the right state whether or not the host peeked in between."""
    dt, nu = 0.01, 0.05
    a = _fresh(dt=dt)
    b = _fresh(dt=dt)
    a.solve(dt, nu, max_iter=1)
    a.run(2, dt, nu, max_iter=1)
    b.solve(dt, nu, max_iter=1)
    _ = b._p.x.array  # host peek between solve() and run()
    b.run(2, dt, nu, max_iter=1)
    for x, y in zip(_snapshot(a), _snapshot(b)):
        np.testing.assert_array_equal(x, y)


def test_scan_window_bound_matches_unbounded():
    """options={"scan_window": n} transparently splits a long run() into
    n-step device executions (relay stability bound, docs/
    tpu_architecture.md): identical state trajectory, per-step stats
    concatenated to the same (num_steps, ...) shapes, callback and
    bc_vals_seq windows sliced correctly."""
    import jax.numpy as jnp

    dt, nu = 0.01, 0.05
    a = _fresh(dt=dt)
    b = _fresh(dt=dt)
    a._scan_window_opt = 2  # == options={"scan_window": 2}
    assert a._run_window_bound() == 2

    cb = lambda st, t: jnp.stack([jnp.sum(st["u"][0]), t])
    bc_seq = np.stack([a._bc_value_arrays()] * 5)
    sa = a.run(5, dt, nu, max_iter=1, step_callback=cb, bc_vals_seq=bc_seq)
    sb = b.run(5, dt, nu, max_iter=1, step_callback=cb, bc_vals_seq=bc_seq)
    # different scan lengths fuse slightly differently once the callback/
    # seq outputs are present: equality holds to machine eps, not bitwise
    for x, y in zip(_snapshot(a), _snapshot(b)):
        np.testing.assert_allclose(x, y, rtol=0, atol=1e-12)
    assert set(sa) == set(sb)
    for k in sb:
        assert sa[k].shape == sb[k].shape, k
        if not np.issubdtype(sa[k].dtype, np.floating):
            np.testing.assert_array_equal(sa[k], sb[k])
    # callback saw the same times in both (t0 advanced per window)
    np.testing.assert_allclose(sa["callback"][:, 1], dt * np.arange(1, 6), rtol=1e-6)
