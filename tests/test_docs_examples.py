"""Docs stay API-correct: every fenced python block under docs/ and in
README.md must parse, and every ``from norma_tpu... import X`` it contains
must resolve against the installed package.  The pytest equivalent of the
reference's doc-test gate (``cargo test --doc`` in
/root/reference/.github/workflows/test.yml): prose examples rot silently
otherwise.
"""

import ast
import importlib
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).parent.parent
DOCS = sorted(ROOT.glob("docs/*.md")) + [ROOT / "README.md"]

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks():
    for path in DOCS:
        for i, m in enumerate(_BLOCK.finditer(path.read_text())):
            yield pytest.param(
                path, m.group(1), id=f"{path.name}-{i}"
            )


BLOCKS = list(_blocks())
assert BLOCKS, "no python blocks found — glob broken?"


@pytest.mark.parametrize("path,code", BLOCKS)
def test_docs_python_block_parses(path, code):
    try:
        tree = ast.parse(code)
    except SyntaxError as e:
        pytest.fail(f"{path.name}: doc block does not parse: {e}\n{code}")
    # Every `from norma_tpu... import X` must resolve: module importable
    # and each imported name present.
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module == "norma_tpu" or node.module.startswith("norma_tpu.")
        ):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), (
                    f"{path.name}: `from {node.module} import {alias.name}` "
                    "names a missing attribute"
                )
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] == "norma_tpu":
                    importlib.import_module(alias.name)
