"""hifimeth-tpu: TPU-native 5mC methylation toolkit for PacBio HiFi reads."""

__version__ = "0.1.0"
