from .ivf_stream import IvfIndexStore  # noqa: F401
from .mutation_stream import apply_mutation_stream  # noqa: F401
from .windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
