from .vector import *  # noqa: F401,F403
