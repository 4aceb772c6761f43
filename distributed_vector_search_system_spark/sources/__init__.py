from .config import EngineConfig, ShardConfig  # noqa: F401
from .parquet import read_vectors, write_vectors  # noqa: F401
from .bucketed import compact_bucketed, write_bucketed  # noqa: F401
from .ivf_index import search_ivf_index, write_ivf_index  # noqa: F401
from .ivfpq_index import search_ivfpq_index, write_ivfpq_index  # noqa: F401
