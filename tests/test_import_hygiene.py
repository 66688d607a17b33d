"""Importing recon3d_tpu must not touch the accelerator.

Module-level jnp constants commit to the default device at import time,
which (a) makes `import recon3d_tpu.depth` fail outright when the
backend is unreachable (seen live: the axon tunnel was down and bench.py
died inside `from recon3d_tpu.depth import ...`), and (b) costs a device
round-trip per imported module even when it is up. Constants belong in
numpy (same dtype semantics inside traced code); anything device-bound
belongs inside a function.

This is a static AST guard so it is cheap and exact: no module-level
statement in the package may CALL into jax/jnp (def/lambda bodies and
`jax.jit`/`functools.partial(jax.jit, ...)` wrappers of named functions
are fine — jit is lazy and does not touch the device until first call).
"""
from __future__ import annotations

import ast
import glob
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "recon3d_tpu")

# lazy: allowed at module level (no device op until traced/called)
_LAZY = {"jax.jit", "jax.vmap", "jax.pmap", "jax.grad", "jax.checkpoint",
         "jax.custom_jvp", "jax.custom_vjp", "jax.tree_util.register_pytree_node",
         "jax.tree_util.register_pytree_node_class"}


def _module_level_device_calls(path: str):
    tree = ast.parse(open(path).read())
    bad = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef, ast.Import, ast.ImportFrom)):
            continue
        # walk with explicit pruning: nested def/lambda bodies run later,
        # not at import time
        stack = [node]
        while stack:
            cur = stack.pop()
            if isinstance(cur, (ast.FunctionDef, ast.AsyncFunctionDef,
                                ast.Lambda)):
                continue  # deferred execution: not an import-time op
            if isinstance(cur, ast.Call):
                fn = ast.unparse(cur.func)
                if (fn.startswith(("jnp.", "jax.numpy."))
                        or (fn.startswith("jax.") and fn not in _LAZY)):
                    bad.append(f"{path}:{cur.lineno}: {ast.unparse(cur)[:70]}")
            stack.extend(ast.iter_child_nodes(cur))
    return bad


def test_no_module_level_device_ops():
    offenders = []
    for f in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        offenders += _module_level_device_calls(f)
    assert not offenders, (
        "module-level jax/jnp calls run a device op at import time "
        "(use numpy for constants, move device work into functions):\n"
        + "\n".join(offenders))
