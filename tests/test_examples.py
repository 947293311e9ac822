"""Examples stay API-correct: every file under examples/ must compile,
and the constructor keywords they pass must exist on the live API.

The reference's only example is compiled by cargo on every build
(examples/whisper-mic.rs); this is the pytest equivalent for a Python
package, where a stale example would otherwise only fail at runtime.
"""

import ast
import inspect
import pathlib
import py_compile

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path, tmp_path):
    py_compile.compile(str(path), cfile=str(tmp_path / "c.pyc"), doraise=True)


def _definition_kwargs(path, ctor_names):
    """Keyword names passed to any ``<mod>.Definition(...)`` call."""
    tree = ast.parse(path.read_text())
    kwargs = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            name = getattr(f, "attr", getattr(f, "id", None))
            if name in ctor_names:
                kwargs.update(k.arg for k in node.keywords if k.arg)
    return kwargs


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_definition_kwargs_exist(path):
    from norma_tpu.models.whisper import monolingual, multilingual

    accepted = set()
    for mod in (monolingual, multilingual):
        accepted |= set(
            inspect.signature(mod.Definition.__init__).parameters
        )
    used = _definition_kwargs(path, {"Definition"})
    assert used <= accepted, f"{path.name} passes unknown kwargs: {used - accepted}"
