"""Static lint gate: every type annotation must resolve.

Round-4 VERDICT found three files using names in annotations
(``Optional``, ``Sequence``) without importing them — harmless under
PEP 563 (``from __future__ import annotations``) but fatal to
``typing.get_type_hints``, which raises NameError on them. Nothing in
CI caught the class. This gate walks every source file's AST, collects
the name-roots of every parameter / return / variable annotation, and
requires each to be bound somewhere in the module (import, def, class,
assignment) or be a builtin. Over-permissive by design (a name bound in
any scope counts) — its job is catching the missing-import class, not
scope analysis.
"""

from __future__ import annotations

import ast
import builtins
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
SOURCES = (
    sorted((REPO / "mcncrossmodalemotions_tpu").rglob("*.py"))
    + sorted((REPO / "tools").glob("*.py"))
    + [REPO / "bench.py", REPO / "__graft_entry__.py"]
)


def _bound_names(tree: ast.AST) -> set:
    bound = set(dir(builtins))
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                bound.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                bound.add(a.asname or a.name)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        bound.add(n.id)
        elif isinstance(node, ast.AnnAssign):
            if isinstance(node.target, ast.Name):
                bound.add(node.target.id)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    bound.add(n.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            pass
    # function parameters (annotations may reference TypeVar-style params)
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            a = node.args
            for arg in (a.posonlyargs + a.args + a.kwonlyargs
                        + ([a.vararg] if a.vararg else [])
                        + ([a.kwarg] if a.kwarg else [])):
                bound.add(arg.arg)
    return bound


def _annotation_exprs(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            a = node.args
            for arg in (a.posonlyargs + a.args + a.kwonlyargs
                        + ([a.vararg] if a.vararg else [])
                        + ([a.kwarg] if a.kwarg else [])):
                if arg.annotation is not None:
                    yield node.lineno, arg.annotation
            if node.returns is not None:
                yield node.lineno, node.returns
        elif isinstance(node, ast.AnnAssign):
            yield node.lineno, node.annotation


def test_all_annotations_resolve():
    assert SOURCES, "source scan found nothing — path layout changed?"
    problems = []
    for path in SOURCES:
        if not path.exists():
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        bound = _bound_names(tree)
        for lineno, expr in _annotation_exprs(tree):
            for n in ast.walk(expr):
                if isinstance(n, ast.Name) and n.id not in bound:
                    problems.append(
                        f"{path.relative_to(REPO)}:{lineno}: annotation "
                        f"uses unbound name {n.id!r}")
    assert not problems, "\n".join(problems)


def test_sources_compile():
    for path in SOURCES:
        if path.exists():
            compile(path.read_text(), str(path), "exec")
