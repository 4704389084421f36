from .reference_funcs import *  # noqa: F401,F403
