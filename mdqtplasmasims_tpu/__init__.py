"""TPU-native MDQT ultracold-neutral-plasma simulation framework."""

__version__ = "0.1.0"
