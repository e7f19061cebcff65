"""ofq_tpu: TPU-native oscillation-free quantization-aware training.

A from-scratch JAX/Flax/Pallas framework with the capabilities of the OFQ
reference (StatsQ weight quantization, LSQ activation quantization, QKR
query-key reparameterization, CGA confidence-guided annealing) for DeiT and
Swin vision transformers on ImageNet-1K, designed for TPU meshes.
"""

__version__ = "0.1.0"
