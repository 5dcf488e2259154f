"""Shim for legacy ``pip install -e .`` flows; metadata lives in
pyproject.toml (the reference keeps everything in setup.py, reference
``setup.py:1-39``)."""

from setuptools import setup

setup()
