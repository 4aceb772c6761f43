from .config import EngineConfig, ShardConfig  # noqa: F401
from .parquet import read_vectors, write_vectors  # noqa: F401
from .bucketed import compact_bucketed, write_bucketed  # noqa: F401
