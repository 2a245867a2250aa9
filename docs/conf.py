"""Sphinx configuration (mirrors the reference's autodoc-stub docs,
/root/reference/docs/conf.py role)."""

project = "ptmcmcsampler-tpu"
author = "ptmcmcsampler-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

html_theme = "alabaster"
autodoc_member_order = "bysource"
