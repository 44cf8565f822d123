"""TPU-native multimodal MTRSSM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Mamo1031/Multimodal-MTRSSM (PyTorch/Lightning reference):

- ``ops``      : MultiOneHot categorical distributions, MoPoE fusion,
                 Gaussian likelihood, fused Pallas recurrent-step kernels.
- ``models``   : State/MTState pytrees, networks (MLP, GRU, CoordConv
                 encoder/decoder), MoPoE-MRSSM and MoPoE-MMTRSSM models.
- ``data``     : Audio-MNIST episode store, converters, device-side
                 input pipeline.
- ``train``    : training harness (optax AdamW, LR plateau scheduling,
                 early stopping, orbax checkpoints, YAML configs).
- ``parallel`` : mesh construction and batch-data-parallel sharding.
- ``eval``     : MNIST classifier + word-transition Matching Rate.
"""

__version__ = "0.1.0"
