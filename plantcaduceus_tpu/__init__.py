"""plantcaduceus_tpu — a TPU-native plant DNA language-model framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
kuleshov-group/PlantCaduceus (see /root/reference): the Caduceus architecture
(bidirectional, reverse-complement-equivariant Mamba SSM over nucleotide
windows) plus its application suite — zero-shot variant-effect scoring,
embedding extraction for XGBoost classifiers, LoRA fine-tuning, and masked-LM
pre-training — designed TPU-first (SPMD meshes, pjit, Pallas kernels) rather
than ported from the reference's CUDA/torch stack.
"""

__version__ = "0.1.0"

from plantcaduceus_tpu.models.config import CaduceusConfig  # noqa: F401
