"""Fidelity gate: 3D Taylor-Green kinetic-energy decay, TPU float32 vs CPU
float64 (BASELINE.md: 'matched Re=1600 kinetic-energy dissipation curves').

Runs the identical configuration on the TPU (f32, structured fast path +
MG) and on the host CPU backend (f64), compares E(t), and writes
FIDELITY.md + fidelity_tg3d.npz.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DT = 2e-3
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 150
CHUNK = 25
NU = 1.0 / 1600.0


def run(dtype, device=None):
    import jax

    from bench import build_solver
    from oasisx_tpu.assembly import engine as eng

    ctxmgr = jax.default_device(device) if device is not None else _null()
    with ctxmgr:
        solver = build_solver(N, dtype=dtype, rtol=1e-6)
        vol = solver._vol

        def energy():
            import jax.numpy as jnp

            e = 0.0
            for i in range(3):
                ui = jnp.asarray(solver._pv(solver._u1[i].x.array), solver._dtype)
                e += float(eng.integrate(solver._ctx, eng.eval_v_at_qp(solver._ctx, ui) ** 2))
            return 0.5 * e / vol

        ts, es = [0.0], [energy()]
        t0 = time.perf_counter()
        for c in range(STEPS // CHUNK):
            solver.run(CHUNK, DT, NU, max_iter=1)
            ts.append((c + 1) * CHUNK * DT)
            es.append(energy())
        wall = time.perf_counter() - t0
    return np.asarray(ts), np.asarray(es), wall


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    import jax

    platform = jax.devices()[0].platform
    ts, e_dev, wall_dev = run(np.float32)
    # reference: float64 on host CPU
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    _, e_cpu, wall_cpu = run(np.float64, device=cpu)

    rel = np.abs(e_dev - e_cpu) / np.abs(e_cpu[0])
    diss_dev = -np.gradient(e_dev, ts)
    diss_cpu = -np.gradient(e_cpu, ts)
    out = dict(
        N=N,
        dt=DT,
        steps=STEPS,
        nu=NU,
        t=ts.tolist(),
        energy_f32_dev=e_dev.tolist(),
        energy_f64_cpu=e_cpu.tolist(),
        max_rel_energy_dev=float(rel.max()),
        platform=platform,
        wall_dev=wall_dev,
        wall_cpu=wall_cpu,
    )
    np.savez(Path(__file__).parent.parent / "fidelity_tg3d.npz", **{k: v for k, v in out.items() if not isinstance(v, str)})
    md = [
        "# Fidelity: 3D Taylor-Green kinetic-energy decay (f32 TPU vs f64 CPU)",
        "",
        f"Config: N={N} (velocity dofs {3*(2*N+1)**3}), dt={DT}, nu=1/1600, {STEPS} steps.",
        "",
        "| t | E (f32, {p}) | E (f64, cpu) | rel diff |".format(p=platform),
        "|---|---|---|---|",
    ]
    for i in range(len(ts)):
        md.append(f"| {ts[i]:.3f} | {e_dev[i]:.6f} | {e_cpu[i]:.6f} | {rel[i]:.2e} |")
    md += [
        "",
        f"Max relative energy deviation: **{rel.max():.2e}**",
        f"Dissipation peak (f32): {diss_dev.max():.4e}; (f64): {diss_cpu.max():.4e}",
        f"Wall: device {wall_dev:.1f}s ({STEPS/wall_dev:.2f} steps/s), cpu {wall_cpu:.1f}s",
    ]
    (Path(__file__).parent.parent / "FIDELITY.md").write_text("\n".join(md))
    print(json.dumps({k: out[k] for k in ("max_rel_energy_dev", "wall_dev", "wall_cpu", "platform")}))


if __name__ == "__main__":
    main()
