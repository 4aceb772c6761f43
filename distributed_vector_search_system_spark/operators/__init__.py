from .knn import knn, merge_topk, shard_cardinality, warm  # noqa: F401
from .mutations import MutationLog, apply_mutations  # noqa: F401
