from cugraph_gnn_tpu.store.partition import PartitionBook, even_shard_size

__all__ = ["PartitionBook", "even_shard_size"]
