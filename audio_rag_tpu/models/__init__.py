"""JAX model zoo: Whisper ASR, BGE-M3 embedder, cross-encoder reranker,
llama-style generator, speaker encoder — all functional (param pytrees +
pure apply functions) so they compose with jit/pjit/scan and shard over the
mesh via PartitionSpec trees.
"""
