"""Census of executed XLA ops in the compiled IPCS step program.

On the TPU relay backend every executed op pays ~35-80 us of dispatch
overhead (docs/tpu_architecture.md), so the per-step op COUNT — including
while-loop bodies times their trip counts — is the primary cost model.
This script compiles the bench step, parses the optimized HLO, and prints
per-computation instruction tallies so fusion work can target the biggest
op groups instead of guessing.

Usage:  python scripts/op_census.py [N]  (default 12 for speed; the op
count is N-independent on the structured path — only slice extents change)
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


OPCODE_RE = re.compile(r"=\s*(?:\([^=]*\)|\S+)\s+([a-z][a-z0-9\-\.]*)\(")
COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w\.\-]+)\s*\(.*->.*\{\s*$")


def census(hlo_text: str):
    """Parse optimized (scheduled) HLO: per-computation opcode lists.
    Fusions count as ONE executed op; their bodies are separate
    computations named fused_computation.* and are skipped in summaries."""
    comps = {}  # name -> list of opcodes
    cur = None
    for line in hlo_text.splitlines():
        m = COMP_RE.match(line)
        if m:
            cur = m.group(2)
            comps[cur] = []
            continue
        if cur is None or not line.startswith(" "):
            continue
        lm = OPCODE_RE.search(line)
        if lm:
            comps[cur].append(lm.group(1))
    return comps


# ops that the relay does not dispatch as device work
FREE = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast",
        "after-all", "iota"}


def summarize(comps):
    rows = []
    for name, ops in comps.items():
        if "fused_computation" in name or name.startswith("region"):
            continue
        hist = collections.Counter(o for o in ops if o not in FREE)
        rows.append((sum(hist.values()), name, hist))
    rows.sort(reverse=True)
    return rows


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    sys.argv = [sys.argv[0]]
    os.environ.setdefault("BENCH_N", str(N))
    import bench

    solver = bench.build_solver(N, dtype=np.float32)
    state = solver._state_from_functions()
    P = solver._params()
    dt = jnp.float32(2e-3)
    nu = jnp.float32(1.0 / 1600.0)
    bc_vals = solver._bc_value_arrays()
    me = jnp.float32(1e-12)

    fn = jax.jit(
        lambda P, s, dt, nu, bc: solver._raw_step(P, s, dt, nu, bc, [], me, 1)
    )
    lowered = fn.lower(P, state, dt, nu, bc_vals)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO written to /tmp/step_hlo.txt ({len(txt.splitlines())} lines)")

    comps = census(txt)
    rows = summarize(comps)
    total = sum(r[0] for r in rows)
    print(f"\n=== {len(rows)} non-fusion computations, {total} instructions ===")
    print("(while bodies execute per iteration — multiply by trip counts)\n")
    for n, name, hist in rows[:25]:
        top = ", ".join(f"{o}:{c}" for o, c in hist.most_common(8))
        print(f"{n:6d}  {name[:60]:60s}  {top}")

    # global opcode histogram over non-fusion computations
    ghist = collections.Counter()
    for n, name, hist in rows:
        ghist.update(hist)
    print("\n=== global opcode histogram (non-fusion computations) ===")
    for o, c in ghist.most_common(30):
        print(f"{c:6d}  {o}")


if __name__ == "__main__":
    main()
