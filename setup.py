"""Setuptools shim: all metadata lives in pyproject.toml.

Kept so ``pip install -e .`` also works on environments whose
setuptools predates native bdist_wheel (< 70.1) and that lack the
``wheel`` package — pip falls back to the legacy ``setup.py develop``
editable path there (``pip install -e . --no-use-pep517`` forces it).
"""
from setuptools import setup

setup()
