"""camradepth_tpu: a TPU-native (JAX/XLA/Pallas/pjit) camera+radar depth
estimation framework with the capabilities of TUMFTM/CamRaDepth."""

__version__ = "0.1.0"
