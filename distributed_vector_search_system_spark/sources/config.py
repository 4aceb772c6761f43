"""Engine configuration (reference S3: ConfigLoader over the NodeConfig
textproto, src/util/config.cc:10-49 + proto/config.proto:28-35).

The reference's per-node concerns (bind addresses, Raft peers) have no
Spark analog — the cluster manager owns membership.  What survives is the
data-plane configuration: vector dimension, shard layout, cache sizing
(with the reference's exact defaults), and batching knobs (which the
reference parses but never uses — kept for config-file compatibility and
ignored the same way, src/index/shard_manager.cc:14-15).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

#: reference defaults, src/util/config.cc:41-42,45-46
DEFAULT_CACHE_ENTRIES = 1024
DEFAULT_CACHE_TTL_SECONDS = 60
DEFAULT_PREFERRED_BATCH_SIZE = 8
DEFAULT_MAX_BATCH_DELAY_MS = 2


@dataclass
class ShardConfig:
    shard_id: str
    index_path: str | None = None  # persisted parquet path for this shard


@dataclass
class EngineConfig:
    dimension: int
    shards: list[ShardConfig] = field(default_factory=list)
    cache_max_entries: int = DEFAULT_CACHE_ENTRIES
    cache_ttl_seconds: float = DEFAULT_CACHE_TTL_SECONDS
    # parsed-but-unused in the reference; kept for parity
    preferred_batch_size: int = DEFAULT_PREFERRED_BATCH_SIZE
    max_batch_delay_ms: int = DEFAULT_MAX_BATCH_DELAY_MS

    def __post_init__(self) -> None:
        if self.dimension <= 0:
            raise ValueError("dimension must be positive")
        seen: set[str] = set()
        for s in self.shards:
            if s.shard_id in seen:
                raise ValueError(f"duplicate shard id: {s.shard_id}")
            seen.add(s.shard_id)

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        """Load from a JSON config file (the textproto format is a wire
        detail of the reference; JSON carries the same fields)."""
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "EngineConfig":
        shards = [ShardConfig(**s) for s in raw.pop("shards", [])]
        cache = raw.pop("cache", {})
        return cls(
            dimension=raw["dimension"],
            shards=shards,
            cache_max_entries=cache.get("max_entries", DEFAULT_CACHE_ENTRIES),
            cache_ttl_seconds=cache.get("ttl_seconds", DEFAULT_CACHE_TTL_SECONDS),
            preferred_batch_size=raw.get(
                "preferred_batch_size", DEFAULT_PREFERRED_BATCH_SIZE
            ),
            max_batch_delay_ms=raw.get("max_batch_delay_ms", DEFAULT_MAX_BATCH_DELAY_MS),
        )
