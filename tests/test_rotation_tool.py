"""The rotation checker's attribution machinery (scripts/
check_rotation.py) is itself load-bearing now — these pin its semantics
on synthetic before/after sources, no git or Spark needed."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "check_rotation",
    Path(__file__).resolve().parent.parent / "scripts" / "check_rotation.py",
)
check_rotation = importlib.util.module_from_spec(_spec)
sys.modules["check_rotation"] = check_rotation
_spec.loader.exec_module(check_rotation)
_changed_names = check_rotation._changed_names


BASE = '''
TAU = 0.5

def helper(x):
    return x * TAU

def query_a(df):
    return helper(df)

def query_b(df):
    return df + 1

ORACLE = {
    "query_a": "SELECT 1",
    "query_b": "SELECT 2",
}

ORACLE["query_c"] = """
    SELECT 3
"""
'''


def test_additive_change_implicates_nothing_existing():
    """Appending a NEW function must implicate only itself — the r11.2
    precision fix (file-level deps spread an additive text.py edit to
    every tx query)."""
    head = BASE + "\n\ndef query_new(df):\n    return df\n"
    assert _changed_names(BASE, head) == {"query_new"}


def test_constant_change_propagates_to_consumers():
    """Touching a module constant implicates the functions referencing
    it (TAU -> helper -> query_a), but not unrelated query_b."""
    head = BASE.replace("TAU = 0.5", "TAU = 0.7")
    got = _changed_names(BASE, head)
    assert got == {"TAU", "helper", "query_a"}


def test_dict_entry_and_subscript_assign_attribution():
    """Oracle entries change independently — both the dict-literal form
    and the ORACLE["key"] = ... subscript form (the latter was a blind
    spot before r11.2)."""
    head = BASE.replace('"query_b": "SELECT 2"', '"query_b": "SELECT 22"')
    assert _changed_names(BASE, head) == {"query_b"}
    head2 = BASE.replace("SELECT 3", "SELECT 33")
    assert _changed_names(BASE, head2) == {"query_c"}


def test_body_edit_implicates_function_and_callers():
    head = BASE.replace("return x * TAU", "return x * TAU * 2")
    got = _changed_names(BASE, head)
    assert got == {"helper", "query_a"}


def test_new_file_marks_everything():
    got = _changed_names("", BASE)
    assert {"TAU", "helper", "query_a", "query_b", "query_c"} <= got
