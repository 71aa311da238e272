"""Thin shim so `python setup.py develop` works on environments whose
setuptools/pip predate PEP 660 editable installs (or lack the `wheel`
package, as this container does). All metadata lives in pyproject.toml;
`pip install -e .` is the normal path."""
from setuptools import setup

setup()
