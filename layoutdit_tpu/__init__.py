"""layoutdit_tpu — a TPU-native document-layout-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
matteociccozzi/LayoutDiT (Faster R-CNN layout detector with a DiT/BEiT
ViT backbone + FPN, trained on PubLayNet), redesigned TPU-first:

  * pure-functional models over pytrees, everything shape-static under jit
  * bf16 compute on the MXU, fp32 params/optimizer
  * on-device fixed-shape NMS / RoIAlign (no host round-trips)
  * data parallelism via jax.sharding.Mesh + pjit (the reference's
    distributed-training TODO, README.md:59)
  * streaming host-side input pipeline with device prefetch
"""

__version__ = "0.1.0"


def main() -> None:
    """Console entry point (reference: src/layoutdit/main.py:12-43)."""
    from layoutdit_tpu.main import main as _main

    _main()
