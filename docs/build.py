"""Executed-notebook docs build (the reference ships a jupyter-book site
with jupytext-paired demo notebooks, /root/reference/docs/_config.yml +
pyproject.toml:35-38; this is the dependency-light equivalent on
nbformat + nbconvert, which are available in this image).

Converts the markdown doc pages and two demo scripts into a small HTML
site under docs/_build: the demos run (``--fast`` shrinks them for CI)
and their outputs are embedded, so the pages show live convergence
numbers like the reference's executed notebooks.

Usage: python docs/build.py [--fast] [--skip-execute]
"""

import argparse
import html
import os
import shutil
import subprocess
import sys
from pathlib import Path

DOCS = Path(__file__).resolve().parent
ROOT = DOCS.parent
BUILD = DOCS / "_build"

PAGES = ["index.md", "splitting_schemes.md", "tpu_architecture.md", "api.md"]
DEMOS = {
    "taylor_green": ["-N", "4", "-N", "8", "-dt", "0.02", "-T1", "0.2"],
    "assembly_strategies": ["--dim", "2", "--max-degree", "2", "-n", "4"],
    "assembly_bcs": ["--dim", "2", "--max-degree", "2", "-n", "4"],
}
DEMOS_FULL = {
    "taylor_green": ["-N", "8", "-N", "16", "-N", "32", "-dt", "0.005", "-T1", "0.5"],
    "assembly_strategies": ["--dim", "2", "--max-degree", "3", "-n", "8"],
    "assembly_bcs": ["--dim", "3", "--max-degree", "2", "-n", "8"],
}


def md_to_html(text: str) -> str:
    """Tiny markdown renderer (headers, code fences, inline code, lists)."""
    out, in_code = [], False
    for line in text.splitlines():
        if line.startswith("```"):
            out.append("</pre>" if in_code else "<pre><code>")
            in_code = not in_code
            continue
        if in_code:
            out.append(html.escape(line))
            continue
        e = html.escape(line)
        if line.startswith("### "):
            out.append(f"<h3>{e[4:]}</h3>")
        elif line.startswith("## "):
            out.append(f"<h2>{e[3:]}</h2>")
        elif line.startswith("# "):
            out.append(f"<h1>{e[2:]}</h1>")
        elif line.startswith("- "):
            out.append(f"<li>{e[2:]}</li>")
        elif not line.strip():
            out.append("<p></p>")
        else:
            out.append(e + "<br/>")
    return "\n".join(out)


STYLE = """<style>body{font-family:sans-serif;max-width:55rem;margin:2rem auto;
padding:0 1rem;line-height:1.5}pre{background:#f6f8fa;padding:1rem;
overflow-x:auto}code{font-family:monospace}</style>"""


def page(title: str, body: str, nav: str) -> str:
    return f"<!doctype html><html><head><meta charset='utf-8'><title>{title}</title>{STYLE}</head><body>{nav}{body}</body></html>"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--skip-execute", action="store_true")
    args = ap.parse_args()

    if BUILD.exists():
        shutil.rmtree(BUILD)
    BUILD.mkdir(parents=True)

    items = [(p, Path(p).stem + ".html") for p in PAGES] + [
        (f"demo_{d}", f"demo_{d}.html") for d in DEMOS
    ]
    nav = "<p>" + " | ".join(
        f"<a href='{h}'>{Path(n).stem}</a>" for n, h in items
    ) + "</p><hr/>"

    for p in PAGES:
        body = md_to_html((DOCS / p).read_text())
        (BUILD / (Path(p).stem + ".html")).write_text(page(p, body, nav))

    demos = DEMOS if args.fast else DEMOS_FULL
    for name, flags in demos.items():
        src = (ROOT / "demo" / f"{name}.py").read_text()
        if args.skip_execute:
            output = "(execution skipped)"
        else:
            cmd = [sys.executable, str(ROOT / "demo" / f"{name}.py"), *flags]
            if not os.environ.get("DOCS_ON_DEVICE"):
                # DEFAULT: force CPU before the demo executes.  Some images
                # pre-import jax on an accelerator platform and ignore
                # JAX_PLATFORMS; docs numbers should be deterministic and a
                # docs build must never contend with a TPU benchmark
                # (single-client relay).  Set DOCS_ON_DEVICE=1 to opt out.
                cmd = [
                    sys.executable, "-c",
                    "import sys, jax; jax.config.update('jax_platforms', 'cpu');"
                    "t = sys.argv[1]; sys.argv = sys.argv[1:];"
                    "exec(compile(open(t).read(), t, 'exec'),"
                    " {'__name__': '__main__', '__file__': t})",
                    str(ROOT / "demo" / f"{name}.py"), *flags,
                ]
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600, cwd=ROOT,
            )
            output = (r.stdout + r.stderr)[-8000:]
            if r.returncode != 0:
                print(f"demo {name} failed:\n{output}", file=sys.stderr)
                return 1
        body = (
            f"<h1>demo/{name}.py</h1><p>executed with: <code>{' '.join(flags)}</code></p>"
            f"<h2>Output</h2><pre><code>{html.escape(output)}</code></pre>"
            f"<h2>Source</h2><pre><code>{html.escape(src)}</code></pre>"
        )
        (BUILD / f"demo_{name}.html").write_text(page(name, body, nav))

    print(f"docs built under {BUILD}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
