"""rife_tpu — a TPU-native (JAX/XLA/Pallas) frame-interpolation framework
with the capabilities of nihui/rife-ncnn-vulkan (reference studied at
/root/reference; built from scratch, not ported)."""

__version__ = "0.1.0"
