"""gitax — a TPU-native generative image-to-text framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
microsoft/GenerativeImage2Text (GIT): image captioning, VQA, multi-frame
video captioning/QA, trie-constrained classification-as-generation,
label-smoothed fine-tuning, a random-access base64-TSV data layer,
checkpoint interop with the published GIT model zoo, and COCO/VQA
evaluation.

Unlike the PyTorch reference, decoding compiles to a single XLA graph
(`lax.while_loop` beam search with a static KV cache), preprocessing can
run fused on device, and scale-out uses a `jax.sharding.Mesh` over
ICI/DCN instead of mpirun + filesystem barriers.
"""

__version__ = "0.1.0"
