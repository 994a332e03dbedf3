"""Device-side numerical ops: audio frontend, attention, top-k, fusion.

All functions here are pure, jittable, static-shape JAX — the building blocks
the model and retrieval layers compile into pjit programs. Pallas TPU kernels
live in :mod:`audio_rag_tpu.ops.pallas_kernels` with jnp fallbacks for CPU.
"""
