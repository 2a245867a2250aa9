from .cycle import build_jump_branches  # noqa: F401
