from .pipeline import CaptionEngine, shard_range, wait_and_concat_shards
