"""TPU-native compute kernels and grid ops (XLA + Pallas)."""
