"""Config CLI-surface parity: every field of every reference config section
must exist in our matching dataclass (same name), so any reference command
line parses here too. Fields we deliberately do NOT honor still parse and
warn (trainer-side warn list) — this test pins the *surface*, the warn list
pins the *behavior*.

The reference sections are harvested via ast (no reference imports needed:
pyrallis/loguru aren't installed) from /root/reference/configs/__init__.py.
"""
import ast
import dataclasses
import pathlib

import pytest

REF_CONFIG = pathlib.Path("/root/reference/configs/__init__.py")

pytestmark = pytest.mark.skipif(not REF_CONFIG.exists(),
                                reason="reference tree unavailable")

# reference class -> our class (same names; TrainConfig checked separately)
SECTIONS = ["NeRFConfig", "RenderConfig", "GuideConfig", "DataConfig",
            "PromptConfig", "OptimConfig", "LogConfig"]


def _ref_fields():
    tree = ast.parse(REF_CONFIG.read_text())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name in SECTIONS:
            fields = []
            for stmt in node.body:
                if isinstance(stmt, ast.AnnAssign) and isinstance(
                        stmt.target, ast.Name):
                    fields.append(stmt.target.id)
            out[node.name] = fields
    return out


def _our_fields():
    import dreamwaltz_g_tpu.configs as cfgs
    return {name: {f.name for f in dataclasses.fields(getattr(cfgs, name))}
            for name in SECTIONS}


def test_reference_sections_found():
    ref = _ref_fields()
    assert set(ref) == set(SECTIONS)
    assert all(len(v) > 3 for v in ref.values())


@pytest.mark.parametrize("section", SECTIONS)
def test_every_reference_field_parses(section):
    ref = _ref_fields()[section]
    ours = _our_fields()[section]
    missing = [f for f in ref if f not in ours]
    assert not missing, (
        f"{section}: reference fields absent from our CLI surface: "
        f"{missing} — a reference command line using them would crash "
        f"instead of parsing (+warning if unhonored)")


def test_properties_preserved():
    """LogConfig.exp_dir is a property in the reference (exp paths by
    convention, configs/__init__.py:501-506); ours must expose it too."""
    from dreamwaltz_g_tpu.configs import LogConfig
    assert isinstance(getattr(LogConfig, "exp_dir", None), property)
