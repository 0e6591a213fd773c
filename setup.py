"""Thin shim: all metadata lives in pyproject.toml (setuptools>=61
reads it natively). Kept so environments without the `wheel` package
(pip's PEP 660 editable path needs bdist_wheel; this container ships
setuptools 65 without wheel and has no network) can still do an
editable install via the legacy `python setup.py develop` route.
`pip install -e .` is the front door everywhere else."""

from setuptools import setup

setup()
