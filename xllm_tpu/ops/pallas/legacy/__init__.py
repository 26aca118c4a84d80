"""Retired Pallas kernel generations (env-gated; see decode_attention)."""
